package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.VersionedParquetSink

/** Clustered tables (Delta liquid-clustering UX): declare
  * `graft.cluster.columns` once and every append Morton-clusters its
  * batch into size-targeted files, auto-compact and OPTIMIZE re-cluster
  * their folds, and predicates on any declared column prune files
  * through the commit-log stats — no per-write zorderBy option, no
  * scheduled re-clustering command. */
class ClusteredTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scanFiles(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan) = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    unwrap(df.queryExecution.executedPlan).collectFirst {
      case s: FileSourceScanExec => s
    }.get.metrics("numFiles").value
  }

  private def graftRead(base: String) =
    spark.read.format("graft").load(s"$base/t")

  test("appends cluster on the declared columns; both dimensions prune") {
    val base = TestSpark.tmpDir("ct1")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((0L, 0L, "seed")).toDF("a", "b", "v"), "t")
    sink.setProperties(spark, "t",
      Map("graft.cluster.columns" -> "a,b",
        "graft.optimizeWrite.targetBytes" -> "2kb"))
    // one shuffled append: rows cover a 100x100 grid in RANDOMIZED order
    val rnd = new scala.util.Random(7)
    val rows = rnd.shuffle((0 until 100).flatMap(i =>
      (0 until 100).map(j => (i.toLong, j.toLong, s"$i-$j"))).toVector)
    sink.append(rows.toDF("a", "b", "v").repartition(8), "t")
    val total = Option(new java.io.File(s"$base/t").listFiles).toSeq.flatten
      .filter(d => d.isDirectory && d.getName.startsWith("d-"))
      .flatMap(d => Option(d.listFiles).toSeq.flatten)
      .count(_.getName.endsWith(".parquet")).toLong
    assert(total >= 4, s"want multiple clustered files, got $total")
    // point-band predicates on EITHER column open a fraction of files
    val fa = scanFiles(graftRead(base).filter(col("a") === 3L))
    val fb = scanFiles(graftRead(base).filter(col("b") === 97L))
    assert(fa < total && fb < total,
      s"clustered write did not prune: a->$fa b->$fb of $total")
    assert(graftRead(base).filter(col("a") === 3L).count() == 100L)
  }

  test("OPTIMIZE on a clustered table re-clusters without a zorder arg") {
    val base = TestSpark.tmpDir("ct2")
    val sink = new VersionedParquetSink(base)
    // UNclustered interleaved appends first; then declare clustering
    (0 until 4).foreach { k =>
      sink.append((0 until 250).map { i =>
        val n = i * 4 + k; ((n % 100).toLong, (n / 100).toLong, s"r$n")
      }.toDF("a", "b", "v").coalesce(1), "t")
    }
    val before = scanFiles(graftRead(base).filter(col("a") === 5L))
    assert(before == 4L, s"interleaved appends should not prune: $before")
    sink.setProperties(spark, "t", Map("graft.cluster.columns" -> "a,b"))
    sink.compact(spark, "t", targetFiles = Some(4))
    val after = scanFiles(graftRead(base).filter(col("a") === 5L))
    assert(after < 4L, s"OPTIMIZE did not re-cluster: $after of 4")
    assert(graftRead(base).filter(col("a") === 5L).count() == 10L)
  }
}
