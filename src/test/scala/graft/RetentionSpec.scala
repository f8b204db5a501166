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

  test("log retention retires checkpointed markers; everything still reads") {
    val base = TestSpark.tmpDir("ret2")
    // small interval so a short history crosses two checkpoints
    val sink = new VersionedParquetSink(base, checkpointInterval = 5)
    assert(sink.appendOnce(Seq((0L, "k")).toDF("id", "v"), "t", "key-0"))
    (1 to 12).foreach(i =>
      sink.append(Seq((i.toLong, s"v$i")).toDF("id", "v"), "t"))
    def markerFiles: Seq[String] =
      Option(new java.io.File(s"$base/t/_commits").listFiles).toSeq.flatten
        .map(_.getName).filter(_.endsWith(".commit"))
    val before = markerFiles.size
    assert(before == 13)
    val deleted = sink.vacuumLog(spark, "t", olderThanMs = 0L)
    assert(deleted > 0, "nothing retired despite checkpoints")
    assert(markerFiles.size < before)
    // full history, time travel, keyed dedup, and counts all intact:
    // everything at or below the checkpoint reads from the checkpoint
    assert(sink.versions(spark, "t") == (0L to 12L))
    assert(sink.read(spark, "t").count() == 13L)
    assert(sink.readAt(spark, "t", 3).count() == 4L)
    assert(sink.history(spark, "t").count() == 13L)
    assert(!sink.appendOnce(Seq((99L, "dup")).toDF("id", "v"), "t", "key-0"),
      "keyed dedup lost after log retention")
    // the TBLPROPERTIES opt-in drives it through plain vacuum
    sink.setProperties(spark, "t",
      Map("graft.logRetentionDuration" -> "0ms"))
    (13 to 18).foreach(i =>
      sink.append(Seq((i.toLong, s"v$i")).toDF("id", "v"), "t"))
    sink.vacuum(spark, "t", graceMs = 0L)
    assert(markerFiles.size < 10, s"vacuum did not retire: $markerFiles")
    assert(sink.read(spark, "t").count() == 19L)
  }

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
