package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.VersionedParquetSink

/** `streamSince` (Delta streaming-source parity) and `history`
  * (DESCRIBE HISTORY parity) on the versioned sink. */
class SinkTailSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tail delivers appends incrementally, O(new data)") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("tail1"))
    sink.append(Seq((1, "a")).toDF("id", "v"), "t") // v0
    sink.append(Seq((2, "b")).toDF("id", "v"), "t") // v1
    val (c1, b1) = sink.streamSince(spark, "t", -1L)
    assert(c1 == 1L && b1.collect().map(_.getInt(0)).toSet == Set(1, 2))
    // nothing new: empty batch, cursor unchanged
    val (c2, b2) = sink.streamSince(spark, "t", c1)
    assert(c2 == 1L && b2.isEmpty)
    sink.append(Seq((3, "c")).toDF("id", "v"), "t") // v2
    val (c3, b3) = sink.streamSince(spark, "t", c2)
    assert(c3 == 2L && b3.collect().map(_.getInt(0)).toSeq == Seq(3))
  }

  test("compaction is transparent; data-changing commits throw unless skipped") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("tail2"))
    sink.append(Seq((1, "a")).toDF("id", "v"), "t") // v0
    val (c0, _) = sink.streamSince(spark, "t", -1L)
    sink.append(Seq((2, "b")).toDF("id", "v"), "t") // v1
    sink.compact(spark, "t", targetFiles = Some(1)) // v2: content-preserving
    val (c1, b1) = sink.streamSince(spark, "t", c0)
    assert(b1.collect().map(_.getInt(0)).toSeq == Seq(2),
      "compaction must not re-deliver or duplicate")
    sink.delete(spark, "t", col("id") === 1) // v3: data-changing
    sink.append(Seq((3, "c")).toDF("id", "v"), "t") // v4
    val e = intercept[IllegalStateException] {
      sink.streamSince(spark, "t", c1)
    }
    assert(e.getMessage.contains("skipChangeCommits"))
    val (c2, b2) = sink.streamSince(spark, "t", c1, skipChangeCommits = true)
    assert(c2 == 4L && b2.collect().map(_.getInt(0)).toSeq == Seq(3))
  }

  test("exactly-once composition: version-range keys dedup replays") {
    val src = new VersionedParquetSink(TestSpark.tmpDir("tail3s"))
    val dst = new VersionedParquetSink(TestSpark.tmpDir("tail3d"))
    src.append(Seq((1, "a"), (2, "b")).toDF("id", "v"), "t")
    def relay(from: Long): Long = {
      val (to, batch) = src.streamSince(spark, "t", from)
      if (to > from)
        dst.appendOnce(batch, "mirror", commitKey = s"t:$from-$to")
      to
    }
    val c1 = relay(-1L)
    relay(-1L) // crash-replay of the SAME range: keyed no-op
    src.append(Seq((3, "c")).toDF("id", "v"), "t")
    val c2 = relay(c1)
    relay(c1) // replay again
    assert(c2 > c1)
    assert(dst.read(spark, "mirror").collect().map(_.getInt(0)).sorted
      .toSeq == Seq(1, 2, 3))
  }

  test("tail projects to the latest schema across evolution and renames") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("tail4"))
    sink.append(Seq((1, "a")).toDF("id", "v"), "t") // v0
    val (c0, _) = sink.streamSince(spark, "t", -1L)
    sink.append(Seq((2, "b", 7L)).toDF("id", "v", "extra"), "t",
      allowEvolution = true) // v1
    sink.renameColumn(spark, "t", "v", "label") // v2 (metadata-only)
    val (c1, b1) = sink.streamSince(spark, "t", c0)
    assert(c1 == 2L)
    assert(b1.columns.toSeq == Seq("id", "label", "extra"))
    assert(b1.collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .toSeq == Seq((2, "b", 7L)))
  }

  test("history lists commits newest-first with operations and keys") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("hist1"))
    sink.append(Seq((1, 5)).toDF("id", "n"), "t") // v0
    sink.appendOnce(Seq((2, 6)).toDF("id", "n"), "t", "batch-7") // v1
    sink.addConstraint(spark, "t", "n_pos", "n > 0") // v2
    sink.compact(spark, "t", targetFiles = Some(1)) // v3
    sink.deleteVectored(spark, "t", col("id") === 1) // v4
    val h = sink.history(spark, "t").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(4L, 3L, 2L, 1L, 0L))
    assert(h.map(_.getString(2)).toSeq ==
      Seq("DV", "COMPACT", "CONSTRAINT", "WRITE", "WRITE"))
    assert(h(1).getLong(3) == 2L) // compaction supersedes versions <= 2
    assert(h(3).getString(4) == "batch-7")
    assert(h.forall(r => r.getTimestamp(1) != null))
  }
}
