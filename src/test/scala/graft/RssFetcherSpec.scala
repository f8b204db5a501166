package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Pipeline, RssFetcher, VersionedParquetSink}
import graft.engine.RssFetcher.FeedSpec

class RssFetcherSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val rssXml =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<rss version="2.0" xmlns:media="http://search.yahoo.com/mrss/">
      |<channel>
      |  <title>Test Politics Feed</title>
      |  <item>
      |    <title>Mayor Ann Bell resigns</title>
      |    <link>https://example.test/a1</link>
      |    <description>City hall shakeup &amp; successor search</description>
      |    <guid>guid-a1</guid>
      |    <pubDate>Mon, 05 Feb 2024 10:30:00 GMT</pubDate>
      |    <media:thumbnail url="https://example.test/a1.jpg"/>
      |  </item>
      |  <item>
      |    <title>Council unveils housing product</title>
      |    <link>https://example.test/a2</link>
      |    <description>d2</description>
      |    <pubDate>Tue, 6 Feb 2024 08:00:00 +0000</pubDate>
      |  </item>
      |  <item>
      |    <title>No date, must be skipped</title>
      |    <guid>guid-a3</guid>
      |  </item>
      |</channel>
      |</rss>""".stripMargin

  test("file:// feed -> snapshot -> full pipeline end-to-end") {
    val feedFile = Paths.get(TestSpark.tmpDir("rssfeed"), "feed.xml")
    Files.write(feedFile, rssXml.getBytes(StandardCharsets.UTF_8))
    val ingestDir = TestSpark.tmpDir("rssingest")
    val r = RssFetcher.fetchOnce(
      Seq(FeedSpec(s"file://$feedFile", "Politics")), ingestDir)
    assert(r.entriesWritten == 2) // dateless item skipped
    assert(r.failures.isEmpty)
    assert(r.snapshotPath.exists(_.endsWith(".json")))

    val sink = new VersionedParquetSink(TestSpark.tmpDir("rssstore"))
    val run = Pipeline.run(spark, ingestDir, sink)
    assert(run.newArticles == 2)
    val raw = sink.read(spark, "raw")
    val byId = raw.collect().map(r => r.getAs[String]("id") -> r).toMap
    assert(byId.keySet == Set("guid-a1", "https://example.test/a2")) // guid fallback = link
    assert(byId("guid-a1").getAs[String]("thumbnail_url") == "https://example.test/a1.jpg")
    assert(byId("guid-a1").getAs[String]("category") == "Politics")
    // XML entity decoded, not double-escaped, through XML -> JSON -> parquet
    assert(byId("guid-a1").getAs[String]("description")
      .contains("shakeup & successor"))
    // single-digit day variant parsed too
    assert(byId("https://example.test/a2").getAs[java.sql.Timestamp]("published_time") != null)
    // re-fetch + re-run: processed-ID state dedups everything
    RssFetcher.fetchOnce(Seq(FeedSpec(s"file://$feedFile", "Politics")), ingestDir)
    assert(Pipeline.run(spark, ingestDir, sink).newArticles == 0)
  }

  test("http:// feed works and a dead feed doesn't lose the live one") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/feed.rss", (x: HttpExchange) => {
      val b = rssXml.getBytes(StandardCharsets.UTF_8)
      x.getResponseHeaders.add("Content-Type", "application/rss+xml")
      x.sendResponseHeaders(200, b.length)
      x.getResponseBody.write(b)
      x.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/feed.rss"
      val ingestDir = TestSpark.tmpDir("rsshttp")
      val r = RssFetcher.fetchOnce(Seq(
        FeedSpec(url, "Politics"),
        FeedSpec("http://127.0.0.1:1/dead.rss", "Dead")), ingestDir)
      assert(r.entriesWritten == 2)
      assert(r.failures.keySet == Set("http://127.0.0.1:1/dead.rss"))
    } finally server.stop(0)
  }

  test("malformed XML is a per-feed failure, not a throw") {
    val bad = Paths.get(TestSpark.tmpDir("rssbad"), "bad.xml")
    Files.write(bad, "<rss><channel><item>".getBytes(StandardCharsets.UTF_8))
    val r = RssFetcher.fetchOnce(
      Seq(FeedSpec(s"file://$bad", "X")), TestSpark.tmpDir("rssbadout"))
    assert(r.entriesWritten == 0)
    assert(r.snapshotPath.isEmpty)
    assert(r.failures.size == 1)
  }
}
