package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.VersionedParquetSink
import graft.streaming.EmbeddingMonitor

/** Streaming embedding-drift monitor ([[EmbeddingMonitor]]): per-batch
  * per-source quantized centroid sums appended exactly-once to a
  * persisted log, with the batch-vs-prior-centroid cosine carried per
  * row. Covers: exact sum/drift math, the null-prior cases (first
  * batch, new source), batch-slicing independence of the cumulative
  * state (associativity of the integer sums), the replay no-op, drift
  * alerting on a semantic shift, the cumulative similarity matrix,
  * and the streaming face over a MemoryStream. */
class EmbeddingMonitorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(rows: (Long, String, Seq[Double])*) =
    rows.toSeq.toDF("vec_id", "source", "embedding")

  test("per-source sums and drift: exact micro-unit sums, null drift " +
      "on first batch and new sources, cosine on repeats") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("em1"))
    val b1 = vecs((1L, "a", Seq(1.0, 0.0)), (2L, "a", Seq(1.0, 0.0)),
      (3L, "b", Seq(0.0, 0.5)))
    assert(EmbeddingMonitor.appendStats(spark, sink, b1, "k1") == 2L)
    val r1 = sink.read(spark, "embedding_stats").orderBy("source").collect()
    assert(r1.map(_.getAs[String]("source")).toSeq == Seq("a", "b"))
    assert(r1(0).getAs[Long]("n_vecs") == 2L)
    assert(r1(0).getSeq[Long](r1(0).fieldIndex("sums")) ==
      Seq(2000000L, 0L))
    assert(r1(1).getSeq[Long](r1(1).fieldIndex("sums")) ==
      Seq(0L, 500000L))
    assert(r1.forall(_.isNullAt(r1(0).fieldIndex("drift_cos"))))

    // batch 2: source a turns orthogonal (drift 0), b stays on-axis
    // (drift 1), source c is new (null drift)
    val b2 = vecs((4L, "a", Seq(0.0, 1.0)), (5L, "b", Seq(0.0, 2.0)),
      (6L, "c", Seq(1.0, 1.0)))
    EmbeddingMonitor.appendStats(spark, sink, b2, "k2")
    val r2 = sink.read(spark, "embedding_stats")
      .filter(col("batch_key") === "k2").orderBy("source").collect()
    assert(r2(0).getAs[Double]("drift_cos") == 0.0)
    assert(r2(1).getAs[Double]("drift_cos") == 1.0)
    assert(r2(2).isNullAt(r2(2).fieldIndex("drift_cos")))

    // alert fires exactly for the orthogonal turn
    val al = EmbeddingMonitor.alerts(spark, sink, threshold = 0.8)
      .select("batch_key", "source").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(al == Set(("k2", "a")))
  }

  test("cumulative state is batch-slicing independent (associative " +
      "integer sums) and the similarity matrix matches closed form") {
    val all = Seq(
      (1L, "a", Seq(1.0, 0.0)), (2L, "a", Seq(1.0, 1.0)),
      (3L, "b", Seq(0.0, 1.0)), (4L, "b", Seq(0.5, 0.5)))
    val one = new VersionedParquetSink(TestSpark.tmpDir("em2a"))
    EmbeddingMonitor.appendStats(spark, one, vecs(all: _*), "k1")
    val two = new VersionedParquetSink(TestSpark.tmpDir("em2b"))
    EmbeddingMonitor.appendStats(spark, two, vecs(all.take(1): _*), "k1")
    EmbeddingMonitor.appendStats(spark, two, vecs(all.drop(1): _*), "k2")
    def tot(s: VersionedParquetSink) =
      EmbeddingMonitor.totals(spark, s).orderBy("source").collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_vecs"),
          r.getSeq[Long](r.fieldIndex("sums")))).toSeq
    assert(tot(one) == tot(two))
    // closed form: a = (2e6, 1e6), b = (5e5, 15e5)
    assert(tot(one) == Seq(("a", 2L, Seq(2000000L, 1000000L)),
      ("b", 2L, Seq(500000L, 1500000L))))
    val expected = math.floor((2.0 * 0.5 + 1.0 * 1.5) /
      (math.sqrt(5.0) * math.sqrt(0.25 + 2.25)) * 10000 + 0.5) / 10000
    Seq(one, two).foreach { s =>
      val m = EmbeddingMonitor.similarityMatrix(spark, s).collect()
      assert(m.length == 1)
      assert(m(0).getAs[Double]("cos_sim") == expected)
    }
  }

  test("crash replay: same key recomputes identical rows and no-ops") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("em3"))
    EmbeddingMonitor.appendStats(spark, sink,
      vecs((1L, "a", Seq(1.0, 0.0))), "k1")
    EmbeddingMonitor.appendStats(spark, sink,
      vecs((2L, "a", Seq(0.5, 0.5)), (3L, "b", Seq(0.0, 1.0))), "k2")
    val before = sink.read(spark, "embedding_stats").collect().toSet
    val v = sink.latestVersion(spark, "embedding_stats").get
    val n = EmbeddingMonitor.appendStats(spark, sink,
      vecs((2L, "a", Seq(0.5, 0.5)), (3L, "b", Seq(0.0, 1.0))), "k2")
    assert(n == 2L)
    assert(sink.latestVersion(spark, "embedding_stats").get == v)
    assert(sink.read(spark, "embedding_stats").collect().toSet == before)
  }

  test("streaming face: MemoryStream batches land exactly-once") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("em4"))
    val mem = MemoryStream[(Long, String, Seq[Double])](spark)
    val q = EmbeddingMonitor.monitorStream(
      mem.toDF().toDF("vec_id", "source", "embedding"), sink,
      TestSpark.tmpDir("em4_ck"),
      trigger = org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("50 milliseconds"))
    try {
      mem.addData((1L, "a", Seq(1.0, 0.0)), (2L, "b", Seq(0.0, 1.0)))
      q.processAllAvailable()
      mem.addData((3L, "a", Seq(-1.0, 0.0)))
      q.processAllAvailable()
      val rows = sink.read(spark, "embedding_stats")
      assert(rows.select("batch_key").distinct().count() == 2)
      // source a flipped 180 degrees: drift cosine -1 alerts
      val al = EmbeddingMonitor.alerts(spark, sink, threshold = 0.8)
        .collect()
      assert(al.length == 1 &&
        al(0).getAs[Double]("drift_cos") == -1.0)
      // cumulative: a sums cancel to the zero vector
      val tot = EmbeddingMonitor.totals(spark, sink)
        .orderBy("source").collect()
      assert(tot(0).getSeq[Long](tot(0).fieldIndex("sums")) ==
        Seq(0L, 0L))
      // zero-norm cumulative centroid -> null similarity, not NaN
      val m = EmbeddingMonitor.similarityMatrix(spark, sink).collect()
      assert(m.length == 1 && m(0).isNullAt(m(0).fieldIndex("cos_sim")))
    } finally q.stop()
  }
}
