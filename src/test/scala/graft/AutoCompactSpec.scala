package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.VersionedParquetSink

/** Auto-compaction (Delta `autoOptimize.autoCompact` parity): with
  * `graft.autoCompact.minDirs` in TBLPROPERTIES, appends fold the
  * accumulated SMALL dirs once the threshold is reached — LSM-style
  * amortization that bounds a micro-batch table's dir count with no
  * scheduled OPTIMIZE. Covers: trigger-at-threshold, content
  * preservation, off-by-default, size-scoped selection (an output past
  * targetBytes is never rewritten again), and the streaming epoch
  * path. */
class AutoCompactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dataDirs(base: String, t: String): Set[String] =
    Option(new java.io.File(s"$base/$t").listFiles).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("d-"))
      .map(_.getName).toSet

  private def liveDirCount(sink: VersionedParquetSink, t: String): Long =
    sink.describeDetail(spark, t).collect()(0).getAs[Long]("numFiles")

  test("appends past minDirs fold the small dirs; content preserved") {
    val base = TestSpark.tmpDir("ac1")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((0L, "seed")).toDF("id", "v"), "t")
    sink.setProperties(spark, "t", Map("graft.autoCompact.minDirs" -> "4"))

    (1 to 3).foreach(i =>
      sink.append(Seq((i.toLong, s"v$i")).toDF("id", "v"), "t"))
    // the threshold was crossed mid-sequence: a fold ran and the live
    // population stays bounded below the append count
    assert(sink.history(spark, "t")
      .filter(col("operation") === "COMPACT").count() >= 1)
    assert(liveDirCount(sink, "t") <= 2L,
      s"expected <=2 live files after auto-compact, got ${liveDirCount(sink, "t")}")
    assert(sink.read(spark, "t").collect().map(_.getLong(0)).toSet ==
      (0L to 3L).toSet)

    // keep appending: the fold output is itself small, so the next
    // trigger folds it together with the new dirs — still bounded
    (4 to 7).foreach(i =>
      sink.append(Seq((i.toLong, s"v$i")).toDF("id", "v"), "t"))
    assert(sink.read(spark, "t").collect().map(_.getLong(0)).toSet ==
      (0L to 7L).toSet)
    assert(liveDirCount(sink, "t") <= 4L)
  }

  test("off by default: no property, no folding") {
    val base = TestSpark.tmpDir("ac2")
    val sink = new VersionedParquetSink(base)
    (0 to 6).foreach(i =>
      sink.append(Seq((i.toLong, s"v$i")).toDF("id", "v"), "t"))
    assert(dataDirs(base, "t").size == 7)
    assert(sink.history(spark, "t")
      .filter(col("operation") === "COMPACT").count() == 0)
  }

  test("dirs past targetBytes are never refolded") {
    val base = TestSpark.tmpDir("ac3")
    val sink = new VersionedParquetSink(base)
    // big dir first (bigger than the tiny target below)
    sink.append((1 to 5000).map(i => (i.toLong, s"payload-$i" * 10))
      .toDF("id", "v"), "t")
    val bigDirs = dataDirs(base, "t")
    sink.setProperties(spark, "t",
      Map("graft.autoCompact.minDirs" -> "3",
        "graft.autoCompact.targetBytes" -> "4096"))
    (1 to 2).foreach(i =>
      sink.append(Seq((10000L + i, "small")).toDF("id", "v"), "t"))
    // trigger saw [big, small, small]: only the smalls (+ metadata-only
    // props dir) fold; the big dir must remain untouched and live
    assert(bigDirs.subsetOf(dataDirs(base, "t")))
    sink.vacuum(spark, "t", graceMs = 0L, includeSuperseded = true)
    assert(bigDirs.subsetOf(dataDirs(base, "t")),
      "auto-compact folded a dir past targetBytes")
    assert(sink.read(spark, "t").count() == 5002L)
  }

  test("streaming epochs auto-compact through commitStreamEpoch") {
    val base = TestSpark.tmpDir("ac4")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((0L, "seed")).toDF("id", "v"), "t")
    sink.setProperties(spark, "t", Map("graft.autoCompact.minDirs" -> "4"))
    val schema = sink.read(spark, "t").schema
    (1 to 3).foreach { i =>
      val unique = s"epoch-$i"
      Seq((i.toLong, s"v$i")).toDF("id", "v")
        .write.parquet(s"$base/t/$unique")
      assert(sink.commitStreamEpoch(spark, "t", unique, schema, s"key-$i"))
    }
    assert(sink.history(spark, "t")
      .filter(col("operation") === "COMPACT").count() >= 1)
    assert(liveDirCount(sink, "t") <= 2L)
    assert(sink.read(spark, "t").collect().map(_.getLong(0)).toSet ==
      (0L to 3L).toSet)
  }
}
