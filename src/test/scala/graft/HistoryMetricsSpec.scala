package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.VersionedParquetSink

/** DESCRIBE HISTORY operation metrics (Delta's operationMetrics):
  * per-commit file/row counts surfaced straight from the commit's own
  * stats payload — no data scan. */
class HistoryMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("history rows carry numFiles/numRecords from commit stats") {
    val base = TestSpark.tmpDir("hm1")
    val sink = new VersionedParquetSink(base)
    sink.append((1 to 5).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .coalesce(1), "t")
    sink.append((6 to 7).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .coalesce(1), "t")
    val h = sink.history(spark, "t").collect()
      .map(r => r.getLong(0) -> (r.getAs[java.lang.Long]("numFiles"),
        r.getAs[java.lang.Long]("numRecords"))).toMap
    assert(h(0L) == (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(5L)))
    assert(h(1L) == (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L)))
    // the catalog metadata table surfaces the same columns
    spark.conf.set("spark.sql.catalog.hmc",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.hmc.path", base)
    val sql = spark.sql(
      "SELECT numRecords FROM hmc.t.history WHERE version = 0").collect()
    assert(sql.head.getLong(0) == 5L)
  }

  test("userMetadata session conf annotates commits (Delta UX)") {
    val base = TestSpark.tmpDir("hm2")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((1L, "a")).toDF("id", "v"), "t") // unannotated
    spark.conf.set("spark.graft.commitInfo.userMetadata",
      "backfill ticket DATA-123")
    try sink.append(Seq((2L, "b")).toDF("id", "v"), "t")
    finally spark.conf.unset("spark.graft.commitInfo.userMetadata")
    sink.append(Seq((3L, "c")).toDF("id", "v"), "t") // conf cleared
    val h = sink.history(spark, "t").collect()
      .map(r => r.getLong(0) -> Option(r.getAs[String]("userMetadata")))
      .toMap
    assert(h(0L).isEmpty && h(2L).isEmpty)
    assert(h(1L).contains("backfill ticket DATA-123"), h)
  }
}
