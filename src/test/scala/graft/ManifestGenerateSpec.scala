package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.VersionedParquetSink

/** GENERATE symlink_format_manifest (Delta parity): the external-reader
  * integration file — current snapshot's data files, atomic publish,
  * refused while live DV masks would make the listed files over-serve. */
class ManifestGenerateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def manifestLines(base: String): Seq[String] = {
    val f = new java.io.File(s"$base/t/_symlink_format_manifest/manifest")
    assert(f.exists(), "manifest not published")
    scala.io.Source.fromFile(f).getLines().filter(_.nonEmpty).toSeq
  }

  test("manifest lists exactly the live snapshot's parquet files") {
    val base = TestSpark.tmpDir("mg1")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((1L, "a")).toDF("id", "v"), "t")
    sink.append(Seq((2L, "b")).toDF("id", "v"), "t")
    assert(sink.generateManifest(spark, "t") == 2)
    val lines = manifestLines(base)
    assert(lines.size == 2)
    assert(lines.forall(_.endsWith(".parquet")))
    // the listed files ARE the readable snapshot
    val viaManifest = spark.read.parquet(lines: _*)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(viaManifest == Seq(1L, 2L))
    // regenerate after compaction: folded layout replaces the old list
    sink.compact(spark, "t", targetFiles = Some(1))
    assert(sink.generateManifest(spark, "t") == 1)
    assert(manifestLines(base).size == 1)
  }

  test("refused while live deletion vectors exist; OK after REORG PURGE") {
    val base = TestSpark.tmpDir("mg2")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "t")
    sink.deleteVectored(spark, "t", col("id") === 1L) // DV mask
    val e = intercept[IllegalArgumentException] {
      sink.generateManifest(spark, "t")
    }
    assert(e.getMessage.contains("REORG"), e.getMessage)
    sink.reorgPurge(spark, "t")
    val n = sink.generateManifest(spark, "t")
    assert(n >= 1)
    assert(spark.read.parquet(manifestLines(base): _*)
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("CALL g.generate publishes from SQL") {
    val base = TestSpark.tmpDir("mg3")
    spark.conf.set("spark.sql.catalog.mgc",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mgc.path", base)
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((1L, "a")).toDF("id", "v"), "t")
    val r = spark.sql("CALL mgc.generate(table => 't')").collect()
    assert(r.head.getString(0).contains("1 file"), r.head)
    assert(manifestLines(base).size == 1)
  }
}
