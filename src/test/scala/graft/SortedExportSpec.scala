package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.SortedExport

/** Sorted-run export: non-overlapping, individually-sorted parquet
  * runs plus a key-range manifest, with no global sort anywhere. */
class SortedExportSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("runs are sorted, disjoint, covering, and manifest-described") {
    val out = TestSpark.tmpDir("sx1") + "/runs"
    // adversarial input: reverse order, duplicates, skewed tail
    val keys = (1000 to 1 by -1).map(_.toLong) ++ Seq.fill(50)(777L)
    val df = keys.zipWithIndex.map { case (k, i) => (k, s"p$i") }
      .toDF("k", "payload")
    val manifest = SortedExport.export(df, "k", out, runs = 4)
    assert(manifest.size >= 2 && manifest.size <= 4)
    assert(manifest.map(_.rows).sum == keys.size)
    // ranges ascending and DISJOINT (equal keys never straddle runs)
    manifest.sliding(2).foreach {
      case Seq(a, b) => assert(a.max.toLong < b.min.toLong,
        s"overlap: ${a.max} !< ${b.min}")
      case _ =>
    }
    // each run's file is internally sorted and inside its declared range
    manifest.foreach { r =>
      val vals = spark.read.parquet(s"$out/${r.file}")
        .select("k").collect().map(_.getLong(0)).toSeq
      assert(vals == vals.sorted, s"${r.file} not sorted")
      assert(vals.head == r.min.toLong && vals.last == r.max.toLong)
    }
    // all duplicates of 777 landed in ONE run
    assert(manifest.count(r =>
      r.min.toLong <= 777 && 777 <= r.max.toLong) == 1)
    // the export is lossless
    assert(spark.read.parquet(out).count() == keys.size)
    // the written manifest round-trips
    val json = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new java.io.File(s"$out/_runs.json"))
    assert(json.size == manifest.size)
    // bisection answer from the manifest alone: key 500 -> exactly one file
    val hits = manifest.filter(r =>
      r.min.toLong <= 500 && 500 <= r.max.toLong)
    assert(hits.size == 1)
    assert(spark.read.parquet(s"$out/${hits.head.file}")
      .filter($"k" === 500L).count() == 1)
  }

  test("string keys order natively; single run degenerates gracefully") {
    val out = TestSpark.tmpDir("sx2") + "/runs"
    val df = Seq("pear", "apple", "fig", "apple", "banana").toDF("s")
      .withColumn("x", org.apache.spark.sql.functions.lit(1))
    val m = SortedExport.export(df, "s", out, runs = 1)
    assert(m.size == 1 && m.head.min == "apple" && m.head.max == "pear")
    assert(m.head.rows == 5)
  }

  test("no global sort: the plan has no SinglePartition exchange") {
    val df = spark.range(10000).selectExpr("id AS k", "id * 2 AS v")
    val shaped = df.repartitionByRange(8,
      org.apache.spark.sql.functions.col("k"))
      .sortWithinPartitions("k")
    val plan = shaped.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.contains("SinglePartition"), "global funnel in export plan")
  }
}
