package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.VersionedParquetSink

/** Vacuum retention via TBLPROPERTIES (Delta's
  * `deletedFileRetentionDuration`): a default-grace vacuum honors the
  * table's declared retention; an explicit caller grace always wins. */
class RetentionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dirCount(base: String): Int =
    Option(new java.io.File(s"$base/t").listFiles).toSeq.flatten
      .count(d => d.isDirectory && d.getName.startsWith("d-"))

  test("table retention property guards superseded dirs; 0h caller wins") {
    val base = TestSpark.tmpDir("ret1")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((1L, "a")).toDF("id", "v"), "t")
    sink.append(Seq((2L, "b")).toDF("id", "v"), "t")
    sink.setProperties(spark, "t",
      Map("graft.deletedFileRetentionDuration" -> "7d"))
    sink.compact(spark, "t") // supersedes the two append dirs
    val before = dirCount(base)
    // default-grace vacuum: the 7d retention keeps everything young
    sink.vacuum(spark, "t", includeSuperseded = true)
    assert(dirCount(base) == before,
      "vacuum ignored the table's 7d retention property")
    // explicit zero grace overrides the property
    sink.vacuum(spark, "t", graceMs = 0L, includeSuperseded = true)
    assert(dirCount(base) < before, "explicit grace did not win")
    assert(sink.read(spark, "t").count() == 2L)
  }
}
