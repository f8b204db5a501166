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

  test("chaos: dedup + rebalance streams lose checkpoints mid-batch, stay globally exactly-once") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.engine.DedupIndex
    import graft.streaming.Rebalance

    def writeFile(dir: String, name: String,
        rows: Seq[(Long, String, String)]): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(dir, name), "UTF-8")
      try rows.foreach { case (id, t, l) =>
        w.println(s"""{"doc_id":$id,"text":"$t","lang":"$l"}""")
      } finally w.close()
    }
    def rmrf(p: String): Unit = {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(p))
    }
    val f1 = Seq(
      (1L, "alpha beta gamma delta epsilon", "en"),
      (2L, "alpha beta gamma delta epsilon", "en"), // exact dup of 1
      (3L, "uno dos tres cuatro cinco seis", "es"),
      (4L, "un deux trois quatre cinq six", "fr"))
    val f2 = Seq(
      (5L, "alpha beta gamma delta epsilon", "en"), // dup of committed 1
      (6L, "nuevo documento totalmente distinto", "es"))

    def runBoth(feed: String, sink: VersionedParquetSink, ck1: String,
        ck2: String): Unit = {
      DedupIndex.streamDeduped(spark, feed, sink, ck1).awaitTermination()
      Rebalance.streamRebalanced(spark, feed, sink, ck2).awaitTermination()
    }

    // ---- chaos run -----------------------------------------------------
    val feed = TestSpark.tmpDir("chaos_feed")
    val sink = new VersionedParquetSink(TestSpark.tmpDir("chaos_sink"))
    val (ck1, ck2) = (TestSpark.tmpDir("chaos_ck1"), TestSpark.tmpDir("chaos_ck2"))
    writeFile(feed, "f1.json", f1)
    runBoth(feed, sink, ck1, ck2)
    assert(sink.read(spark, "corpus").count() == 3) // dup 2 dropped

    // file 2 lands; the dedup worker crashes MID-BATCH: its corpus
    // append commits but the fp/sig index entries never do — simulated
    // by committing the survivor row under exactly the content key the
    // stream derives for f2's (file-pinned) batch
    writeFile(feed, "f2.json", f2)
    val f2df = f2.toDF("doc_id", "text", "lang").select("doc_id", "text")
    val sig = f2df.agg(count(lit(1)),
      sum(crc32(concat_ws("", col("doc_id"), col("text"))))).head()
    val f2key = s"dedup-${sig.getLong(0)}-${sig.getLong(1)}"
    assert(sink.appendOnce(Seq((6L, f2(1)._2)).toDF("doc_id", "text"),
      "corpus", s"$f2key:corpus"))

    // ...and BOTH checkpoints are lost (SIGKILL + volume wipe)
    rmrf(ck1); rmrf(ck2)
    runBoth(feed, sink, ck1, ck2)

    // ---- clean single-run reference ------------------------------------
    val feedR = TestSpark.tmpDir("chaosr_feed")
    val sinkR = new VersionedParquetSink(TestSpark.tmpDir("chaosr_sink"))
    writeFile(feedR, "f1.json", f1)
    writeFile(feedR, "f2.json", f2)
    runBoth(feedR, sinkR,
      TestSpark.tmpDir("chaosr_ck1"), TestSpark.tmpDir("chaosr_ck2"))

    // every table on the chaos sink equals the never-crashed reference
    for (t <- Seq("corpus", "dedup_fp", "dedup_sig", "balanced", "group_counts")) {
      val a = sink.read(spark, t)
      val b = sinkR.read(spark, t).select(a.columns.map(col): _*)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"table $t diverged:\n chaos=${a.collect().toSeq}\n ref=${b.collect().toSeq}")
    }
    // and the headline invariant: no document ingested twice, none lost
    val ids = sink.read(spark, "corpus").select("doc_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 3L, 4L, 6L), s"corpus ids: ${ids.toSeq}")
  }
}
