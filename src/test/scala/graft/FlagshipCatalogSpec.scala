package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Analytics, Pipeline, RssFetcher, VersionedParquetSink}
import graft.engine.RssFetcher.FeedSpec
import graft.streaming.StreamingPipeline

/** The flagship end-to-end demo, composed THROUGH THE CATALOG: the
  * reference pipeline (RSS snapshot -> state dedup -> curate -> analyze
  * -> explode; collector.py:228-245) runs as a streaming query whose
  * per-micro-batch fan-out is ONE cross-table transaction into the
  * catalog's storage, and the dashboard (visualizer.py:53-188) runs as
  * plain `spark.sql` over `g.*` tables. Ingesting the same feed twice
  * appends nothing, and every dashboard answer matches the batch
  * pipeline's on the same snapshots. */
class FlagshipCatalogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val rssXml =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<rss version="2.0">
      |<channel><title>Politics</title>
      |  <item>
      |    <title>Mayor Ann Bell resigns suddenly</title>
      |    <link>https://example.test/f1</link>
      |    <description>successor search begins</description>
      |    <guid>flag-g1</guid>
      |    <pubDate>Mon, 05 Feb 2024 10:30:00 GMT</pubDate>
      |  </item>
      |  <item>
      |    <title>Council unveils housing product</title>
      |    <link>https://example.test/f2</link>
      |    <description>a housing development plan</description>
      |    <guid>flag-g2</guid>
      |    <pubDate>Tue, 06 Feb 2024 08:00:00 GMT</pubDate>
      |  </item>
      |  <item>
      |    <title>New transit product announced by agency</title>
      |    <link>https://example.test/f3</link>
      |    <description>rollout begins next month</description>
      |    <guid>flag-g3</guid>
      |    <pubDate>Tue, 06 Feb 2024 09:15:00 GMT</pubDate>
      |  </item>
      |</channel></rss>""".stripMargin

  test("RSS -> streaming ingest, one txn per batch -> spark.sql dashboard over g.*; re-ingest appends nothing") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/feed.rss", (x: HttpExchange) => {
      val b = rssXml.getBytes(StandardCharsets.UTF_8)
      x.sendResponseHeaders(200, b.length)
      x.getResponseBody.write(b)
      x.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/feed.rss"
      val feedsDir = TestSpark.tmpDir("flag_feeds")
      assert(RssFetcher.fetchOnce(
        Seq(FeedSpec(url, "Politics")), feedsDir).entriesWritten == 3)

      // the streaming pipeline writes INTO the catalog's storage: the
      // three tables it commits ARE gflag.raw / gflag.curated /
      // gflag.actors the moment they exist
      val base = TestSpark.tmpDir("flag_store")
      spark.conf.set("spark.sql.catalog.gflag",
        classOf[graft.sources.GraftCatalog].getName)
      spark.conf.set("spark.sql.catalog.gflag.path", base)
      val sink = new VersionedParquetSink(base)
      val ckpt = TestSpark.tmpDir("flag_ckpt")
      StreamingPipeline.stream(spark, feedsDir, sink, ckpt)
        .awaitTermination()

      // the whole batch rode ONE multi-table transaction: every table's
      // creating commit is keyed by the same txn key
      val keys = Seq("raw", "curated", "actors").map { t =>
        t -> spark.sql(s"SELECT commitKey FROM gflag.$t.history")
          .collect().map(_.getString(0)).toSeq
      }.toMap
      keys.foreach { case (t, ks) =>
        assert(ks.exists(k => k != null && k.startsWith("batch-")),
          s"$t not committed by the txn: $ks")
      }
      // the SAME txn key across all three tables = one transaction
      assert(keys.values.map(_.filter(k =>
        k != null && k.startsWith("batch-")).toSet).toSet.size == 1,
        s"tables committed under different txn keys: $keys")

      // the dashboard as catalog SQL
      def sqlRows(q: String): Seq[Seq[Any]] =
        spark.sql(q).collect().map(_.toSeq.map {
          case d: java.sql.Date => d.toString
          case x => x
        }).toSeq
      val timeline = sqlRows(
        """SELECT CAST(to_date(published_time) AS STRING) AS day,
          |       count(*) AS n
          |FROM gflag.curated GROUP BY 1 ORDER BY 1""".stripMargin)
      val topActors = sqlRows(
        """SELECT actor_name, count(*) AS mentions FROM gflag.actors
          |GROUP BY actor_name ORDER BY mentions DESC, actor_name
          |LIMIT 10""".stripMargin)
      val cats = sqlRows(
        """SELECT category, count(*) AS n FROM gflag.curated
          |GROUP BY category ORDER BY n DESC, category""".stripMargin)

      // ...must match the batch pipeline's answers on the same snapshots
      val refSink = new VersionedParquetSink(TestSpark.tmpDir("flag_ref"))
      assert(Pipeline.run(spark, feedsDir, refSink).newArticles == 3)
      def dfRows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
        df.collect().map(_.toSeq.map {
          case d: java.sql.Date => d.toString
          case x => x
        }).toSeq
      val refCurated = refSink.read(spark, "curated")
      val refActors = refSink.read(spark, "actors")
      assert(timeline == dfRows(Analytics.timeline(refCurated)
        .selectExpr("CAST(day AS STRING) AS day", "n")),
        s"timeline diverged: $timeline")
      assert(topActors == dfRows(Analytics.topActors(refActors, 10)),
        s"topActors diverged: $topActors")
      assert(cats == dfRows(Analytics.categoryDistribution(refCurated)),
        s"categories diverged: $cats")
      assert(timeline.map(_(1).asInstanceOf[Long]).sum == 3L)

      // second ingest of the SAME feed: new snapshot file, same guids —
      // the stream's watermarked dedup state (checkpointed) drops all of
      // them; nothing appends, no new commits anywhere
      val versionsBefore = Seq("raw", "curated", "actors").map(t =>
        t -> spark.sql(s"SELECT count(*) FROM gflag.$t.history")
          .head().getLong(0)).toMap
      RssFetcher.fetchOnce(Seq(FeedSpec(url, "Politics")), feedsDir)
      StreamingPipeline.stream(spark, feedsDir, sink, ckpt)
        .awaitTermination()
      Seq("raw", "curated", "actors").foreach { t =>
        assert(spark.sql(s"SELECT count(*) FROM gflag.$t.history")
          .head().getLong(0) == versionsBefore(t),
          s"re-ingest committed to $t")
      }
      assert(spark.sql("SELECT count(*) FROM gflag.curated")
        .head().getLong(0) == 3L)
    } finally server.stop(0)
  }

  test("monitor + reservoir ride the SAME per-batch txn as the corpus " +
      "tables; re-ingest appends to none of the five") {
    import org.apache.spark.sql.functions._
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/feed.rss", (x: HttpExchange) => {
      val b = rssXml.getBytes(StandardCharsets.UTF_8)
      x.sendResponseHeaders(200, b.length)
      x.getResponseBody.write(b)
      x.close()
    })
    server.start()
    try {
      val url = s"http://127.0.0.1:${server.getAddress.getPort}/feed.rss"
      val feedsDir = TestSpark.tmpDir("flagx_feeds")
      assert(RssFetcher.fetchOnce(
        Seq(FeedSpec(url, "Politics")), feedsDir).entriesWritten == 3)
      val base = TestSpark.tmpDir("flagx_store")
      val sink = new VersionedParquetSink(base)
      val ckpt = TestSpark.tmpDir("flagx_ckpt")
      val K = 2
      StreamingPipeline.stream(spark, feedsDir, sink, ckpt,
        monitorStats = true, reservoirK = Some(K))
        .awaitTermination()

      // ONE txn key across all five tables (the round-9 members
      // included): monitor rows and reservoir candidates cannot land
      // without the corpus tables, nor the corpus without them
      val tables = Seq("raw", "curated", "actors", "corpus_stats",
        "reservoir")
      val keys = tables.map { t =>
        t -> sink.history(spark, t).select("commitKey").collect()
          .map(_.getString(0)).filter(k =>
            k != null && k.startsWith("batch-")).toSet
      }.toMap
      keys.foreach { case (t, ks) =>
        assert(ks.nonEmpty, s"$t not committed by the txn")
      }
      assert(keys.values.toSet.size == 1,
        s"tables committed under different txn keys: $keys")

      // the monitor log describes exactly the curated corpus
      val curated = sink.read(spark, "curated")
      val stats = sink.read(spark, "corpus_stats")
      assert(stats.agg(sum("n_docs")).head().getLong(0) == 3L)
      val perLang = stats.groupBy("lang").agg(sum("n_docs").as("n"))
        .collect().map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
      val wantLang = curated.groupBy("category").count().collect()
        .map(r => r.getString(0) -> r.getAs[Long]("count")).toMap
      assert(perLang == wantLang, s"monitor mix $perLang != $wantLang")

      // the reservoir equals the one-shot weighted sample over the
      // same curated docs (weight = text length, the stream's rule)
      val docs = curated.select(col("id").as("doc_id"),
        greatest(length(concat_ws(" ", col("title"),
          col("description"))), lit(1)).as("wt"))
      val want = graft.engine.Sampling
        .weightedTopK(docs, col("doc_id"), col("wt"), K)
        .collect().map(_.getString(0)).sorted.toSeq
      val got = graft.engine.SampleIndex.sample(spark, sink, K)
        .collect().map(_.getAs[String]("doc_id")).sorted.toSeq
      assert(got == want, s"reservoir $got != one-shot $want")

      // re-ingest: the stream's dedup drops everything — no new
      // commits on ANY of the five tables
      val before = tables.map(t =>
        t -> sink.history(spark, t).count()).toMap
      RssFetcher.fetchOnce(Seq(FeedSpec(url, "Politics")), feedsDir)
      StreamingPipeline.stream(spark, feedsDir, sink, ckpt,
        monitorStats = true, reservoirK = Some(K))
        .awaitTermination()
      tables.foreach { t =>
        assert(sink.history(spark, t).count() == before(t),
          s"re-ingest committed to $t")
      }
    } finally server.stop(0)
  }
}
