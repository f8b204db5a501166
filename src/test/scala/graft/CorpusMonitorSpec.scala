package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.VersionedParquetSink
import graft.streaming.CorpusMonitor

/** Streaming corpus-statistics monitor ([[CorpusMonitor]]): per-batch
  * per-language volume/quality/mix stats appended exactly-once to a
  * persisted log, with the PRIOR cumulative mix carried per row so
  * drift alerts are a plain filter. Covers: stat correctness, the
  * replay no-op (content keys + prior-excluding recompute), drift
  * alerting on a mix shift, cumulative totals, and the streaming face
  * over a MemoryStream. */
class CorpusMonitorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 12 distinct words: passes the n_tok >= 10 && ttr >= 0.05 gate
  private val good =
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
  private val short_ = "tiny doc" // fails the gate (n_tok < 10)

  private def docs(rows: (Long, String, String)*) =
    rows.toSeq.toDF("doc_id", "text", "lang")

  test("per-lang stats: counts, quality rate, dup rate, shares, drift") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("cm1"))
    // batch 1: 3 en (one short, one exact dup) + 1 fr
    val b1 = docs((1L, good, "en"), (2L, short_, "en"), (3L, good, "en"),
      (4L, good, "fr"))
    assert(CorpusMonitor.appendStats(spark, sink, b1, "k1") == 2L)
    val r1 = sink.read(spark, "corpus_stats").orderBy("lang").collect()
    assert(r1.length == 2)
    val en = r1(0)
    assert(en.getAs[String]("lang") == "en")
    assert(en.getAs[Long]("n_docs") == 3L)
    assert(en.getAs[Double]("quality_rate") == 0.6667) // 2 of 3 pass
    assert(en.getAs[Double]("dup_rate") == 0.3333)     // 2 distinct of 3
    assert(en.getAs[Double]("share") == 0.75)
    assert(en.isNullAt(en.fieldIndex("prior_share"))) // first batch
    assert(en.isNullAt(en.fieldIndex("drift")))

    // batch 2: the mix flips hard toward fr
    val b2 = docs((10L, good, "fr"), (11L, good, "fr"), (12L, good, "fr"),
      (13L, good, "en"))
    CorpusMonitor.appendStats(spark, sink, b2, "k2")
    val r2 = sink.read(spark, "corpus_stats")
      .filter(col("batch_key") === "k2").orderBy("lang").collect()
    val fr2 = r2(1)
    assert(fr2.getAs[String]("lang") == "fr")
    assert(fr2.getAs[Double]("share") == 0.75)
    assert(fr2.getAs[Double]("prior_share") == 0.25) // 1 of 4 before
    assert(fr2.getAs[Double]("drift") == 0.5)

    // drift alert fires for both langs of batch 2, none for batch 1
    val alerts = CorpusMonitor.alerts(spark, sink, threshold = 0.1)
      .select("batch_key", "lang").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(alerts == Set(("k2", "en"), ("k2", "fr")))

    // cumulative totals
    val tot = CorpusMonitor.totals(spark, sink).orderBy("lang").collect()
    assert(tot.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("en", 4L), ("fr", 4L)))
  }

  test("crash replay: same key recomputes identical rows and no-ops") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("cm2"))
    CorpusMonitor.appendStats(spark, sink,
      docs((1L, good, "en"), (2L, good, "fr")), "k1")
    CorpusMonitor.appendStats(spark, sink,
      docs((3L, good, "en"), (4L, short_, "en")), "k2")
    val before = sink.read(spark, "corpus_stats").collect().toSet
    val v = sink.latestVersion(spark, "corpus_stats").get
    // replay batch 2 (crash after its append committed): the prior
    // counts EXCLUDE key k2, so the recompute is identical — and the
    // keyed append no-ops
    val n = CorpusMonitor.appendStats(spark, sink,
      docs((3L, good, "en"), (4L, short_, "en")), "k2")
    assert(n == 1L)
    assert(sink.latestVersion(spark, "corpus_stats").get == v)
    assert(sink.read(spark, "corpus_stats").collect().toSet == before)
  }

  test("streaming face: MemoryStream batches land exactly-once") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("cm3"))
    val mem = MemoryStream[(Long, String, String)](spark)
    val q = CorpusMonitor.monitorStream(
      mem.toDF().toDF("doc_id", "text", "lang"), sink,
      TestSpark.tmpDir("cm3_ck"),
      // AvailableNow would stop before the post-start addData calls
      trigger = org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("50 milliseconds"))
    try {
      mem.addData((1L, good, "en"), (2L, good, "en"), (3L, good, "fr"))
      q.processAllAvailable()
      mem.addData((4L, good, "fr"), (5L, good, "fr"))
      q.processAllAvailable()
      val rows = sink.read(spark, "corpus_stats")
      assert(rows.select("batch_key").distinct().count() == 2)
      val tot = CorpusMonitor.totals(spark, sink).orderBy("lang").collect()
      assert(tot.map(r => (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("en", 2L), ("fr", 3L)))
      // the second batch's fr share (1.0) drifted from prior 1/3
      assert(CorpusMonitor.alerts(spark, sink, threshold = 0.3)
        .filter(col("lang") === "fr").count() == 1)
    } finally q.stop()
  }
}
