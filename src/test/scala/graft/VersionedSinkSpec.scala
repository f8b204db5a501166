package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Pipeline, VersionedParquetSink}

class VersionedSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("append commits versions; read = union; readAt time-travels") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("vstore"))
    sink.append(Seq((1, "a"), (2, "b")).toDF("id", "v"), "t")
    sink.append(Seq((3, "c")).toDF("id", "v"), "t")
    assert(sink.versions(spark, "t") == Seq(0L, 1L))
    assert(sink.read(spark, "t").count() == 3)
    assert(sink.readAt(spark, "t", 0).collect().map(_.getInt(0)).toSet == Set(1, 2))
    assert(sink.readAt(spark, "t", 1).count() == 3)
  }

  test("uncommitted data directory is invisible to readers") {
    val base = TestSpark.tmpDir("vstore2")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((1, "a")).toDF("id", "v"), "t")
    // simulate a writer that died after writing data, before the marker
    Seq((99, "zz")).toDF("id", "v")
      .write.parquet(s"$base/t/d-orphan-died-uncommitted")
    assert(sink.read(spark, "t").collect().map(_.getInt(0)).toSet == Set(1))
    // next successful append must not collide with the orphan dir
    sink.append(Seq((2, "b")).toDF("id", "v"), "t")
    assert(sink.read(spark, "t").collect().map(_.getInt(0)).toSet == Set(1, 2))
  }

  test("appendOnce is idempotent per commit key (replayed micro-batch)") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("vstore5"))
    assert(sink.appendOnce(Seq((1, "a")).toDF("id", "v"), "t", "batch-0"))
    assert(!sink.appendOnce(Seq((1, "a")).toDF("id", "v"), "t", "batch-0")) // replay
    assert(sink.appendOnce(Seq((2, "b")).toDF("id", "v"), "t", "batch-1"))
    assert(sink.read(spark, "t").count() == 2) // no duplicate from the replay
    assert(sink.versions(spark, "t") == Seq(0L, 1L))
  }

  test("streaming fan-out on versioned sink: batch replays can't double-append") {
    val feeds = TestSpark.tmpDir("vsfeeds")
    java.nio.file.Files.write(java.nio.file.Paths.get(feeds, "b.json"),
      """{"title":"Mayor Ann Bell resigns","published":"Mon, 05 Feb 2024 10:30:00 GMT","description":"d","link":"l","guid":"g1","media_thumbnail":null,"feed":"Politics"}"""
        .getBytes("UTF-8"))
    val sink = new VersionedParquetSink(TestSpark.tmpDir("vstore6"))
    val ckpt = TestSpark.tmpDir("vsckpt")
    graft.streaming.StreamingPipeline.stream(spark, feeds, sink, ckpt)
      .awaitTermination()
    assert(sink.read(spark, "raw").count() == 1)
    // simulate the crash-window replay: re-running batch 0's writes
    val replayed = sink.appendOnce(
      sink.read(spark, "raw"), "raw", "batch-0")
    assert(!replayed)
    assert(sink.read(spark, "raw").count() == 1)
  }

  test("overwrite resets history") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("vstore3"))
    sink.append(Seq((1, "a")).toDF("id", "v"), "t")
    sink.overwrite(Seq((9, "z")).toDF("id", "v"), "t")
    assert(sink.versions(spark, "t") == Seq(0L))
    assert(sink.read(spark, "t").collect().map(_.getInt(0)).toSet == Set(9))
  }

  test("pipeline runs unchanged on the versioned sink (trait slot-in)") {
    val feeds = TestSpark.tmpDir("vfeeds")
    java.nio.file.Files.write(java.nio.file.Paths.get(feeds, "b.json"),
      """{"title":"Mayor Ann Bell resigns","published":"Mon, 05 Feb 2024 10:30:00 GMT","description":"d","link":"l","guid":"g1","media_thumbnail":null,"feed":"Politics"}"""
        .getBytes("UTF-8"))
    val sink = new VersionedParquetSink(TestSpark.tmpDir("vstore4"))
    val r = Pipeline.run(spark, feeds, sink)
    assert(r.newArticles == 1)
    assert(sink.read(spark, "raw").count() == 1)
    assert(Pipeline.run(spark, feeds, sink).newArticles == 0) // idempotent
  }
}
