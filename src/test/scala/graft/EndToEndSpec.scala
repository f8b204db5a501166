package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{HttpAnalyzer, Pipeline, RssFetcher, VersionedParquetSink}
import graft.engine.RssFetcher.FeedSpec

/** The complete reference flow (collector.py + processor.py), all real
  * transports: RSS fetched over HTTP -> atomic snapshot -> schema'd
  * ingest + state dedup -> LLM extraction over HTTP (fake gateway) ->
  * raw/curated/actors on the versioned (commit-log) sink, exactly-once.
  */
class EndToEndSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val rssXml =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<rss version="2.0">
      |<channel><title>Politics</title>
      |  <item>
      |    <title>Mayor Ann Bell resigns suddenly</title>
      |    <link>https://example.test/e1</link>
      |    <description>successor search begins</description>
      |    <guid>e2e-g1</guid>
      |    <pubDate>Mon, 05 Feb 2024 10:30:00 GMT</pubDate>
      |  </item>
      |  <item>
      |    <title>Council unveils housing product</title>
      |    <link>https://example.test/e2</link>
      |    <description>d2</description>
      |    <guid>e2e-g2</guid>
      |    <pubDate>Tue, 06 Feb 2024 08:00:00 GMT</pubDate>
      |  </item>
      |</channel></rss>""".stripMargin

  private def respond(x: HttpExchange, code: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    x.sendResponseHeaders(code, b.length)
    x.getResponseBody.write(b)
    x.close()
  }

  test("RSS over HTTP -> ingest -> HTTP LLM extraction -> versioned sink") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/feed.rss", (x: HttpExchange) =>
      respond(x, 200, rssXml))
    server.createContext("/v1/chat/completions", (x: HttpExchange) => {
      val body = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val title = """Title: ([^\\\n"]*)""".r.findFirstMatchIn(body)
        .map(_.group(1)).getOrElse("")
      val actor = title.split(" ").take(3).mkString(" ") // "Mayor Ann Bell"
      val cat = if (title.contains("resign")) "Leadership Change"
        else "New Product Announced"
      val args =
        s"""{\\"main_actors\\":[{\\"name\\":\\"$actor\\",\\"role\\":\\"politician\\"}],\\"other_actors\\":[],\\"category\\":\\"$cat\\"}"""
      respond(x, 200,
        s"""{"choices":[{"message":{"tool_calls":[{"function":{"name":"record_analysis","arguments":"$args"}}]}}]}""")
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val ingestDir = TestSpark.tmpDir("e2e_ingest")
      val fetched = RssFetcher.fetchOnce(
        Seq(FeedSpec(s"http://127.0.0.1:$port/feed.rss", "Politics")), ingestDir)
      assert(fetched.entriesWritten == 2)

      val sink = new VersionedParquetSink(TestSpark.tmpDir("e2e_store"))
      val analyzer = new HttpAnalyzer(
        s"http://127.0.0.1:$port/v1/chat/completions", "e2e-key")
      val r = Pipeline.run(spark, ingestDir, sink, analyzer)
      assert(r.newArticles == 2)
      assert(r.quality("n_rows") == 2L) // observe() rode the batch action
      assert(r.quality("null_keys") == 0L)
      // quality observes RAW entries (null counters on the raw columns)
      // but min/max freshness over the PARSED time — the raw RFC-1123
      // string would sort lexicographically by weekday name
      assert(r.quality("min_time").toString.startsWith("2024-02-05"))

      val actors = sink.read(spark, "actors").collect()
        .map(r => (r.getAs[String]("news_id"), r.getAs[String]("actor_name"),
          r.getAs[Boolean]("is_main_actor"))).toSet
      assert(actors.contains(("e2e-g1", "Mayor Ann Bell", true)))
      assert(actors.exists(_._1 == "e2e-g2"))
      val cats = sink.read(spark, "curated").collect()
        .map(_.getAs[String]("category")).toSet
      assert(cats == Set("Politics")) // curated keeps the feed category

      // re-fetch + re-run: state dedup + keyed commits -> nothing new
      RssFetcher.fetchOnce(
        Seq(FeedSpec(s"http://127.0.0.1:$port/feed.rss", "Politics")), ingestDir)
      assert(Pipeline.run(spark, ingestDir, sink, analyzer).newArticles == 0)
      assert(sink.read(spark, "actors").count() == actors.size)
    } finally server.stop(0)
  }
}
