package graft

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.VersionedParquetSink
import graft.sources.AdmissionLimits

/** Streaming admission control (Delta reader-rate-limit parity):
  * `maxFilesPerTrigger` / `maxBytesPerTrigger` bound how much backlog
  * one micro-batch admits, instead of serving a months-old checkpoint's
  * whole backlog as batch #1. Caps are SOFT — at least one data commit
  * per batch, so progress is guaranteed — and the admitted floor
  * persists under the checkpoint, so a restart stays capped. */
class RateLimitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Runs a capped stream to exhaustion, returning per-batch row counts
    * in order. */
  private def drain(df: org.apache.spark.sql.DataFrame,
      ckpt: String): Seq[Long] = {
    val batches = mutable.ArrayBuffer.empty[Long]
    val q = df.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += b.count() }; ()
      }
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable() finally q.stop()
    batches.synchronized(batches.filter(_ > 0).toSeq)
  }

  test("maxFilesPerTrigger splits a backlog into bounded micro-batches") {
    val base = TestSpark.tmpDir("rl1")
    val sink = new VersionedParquetSink(base)
    // six single-file commits of one row each
    (0 until 6).foreach(i =>
      sink.append(Seq((i, s"v$i")).toDF("id", "v").coalesce(1), "t"))
    val ckpt = TestSpark.tmpDir("rl1c")
    val batches = drain(
      spark.readStream.format("graft")
        .option("maxFilesPerTrigger", 2).load(s"$base/t"), ckpt)
    assert(batches.sum == 6L, s"lost/duplicated rows: $batches")
    assert(batches.size >= 3, s"cap ignored, backlog served in: $batches")
    assert(batches.forall(_ <= 2L), s"a batch exceeded the cap: $batches")
  }

  test("maxBytesPerTrigger is soft: an oversized commit still admits alone") {
    val base = TestSpark.tmpDir("rl2")
    val sink = new VersionedParquetSink(base)
    // one big commit (far over the 1-byte cap), then two small ones
    sink.append((0 until 500).map(i => (i, "x" * 50)).toDF("id", "v")
      .coalesce(1), "t")
    sink.append(Seq((1000, "a")).toDF("id", "v").coalesce(1), "t")
    sink.append(Seq((1001, "b")).toDF("id", "v").coalesce(1), "t")
    val batches = drain(
      spark.readStream.format("graft")
        .option("maxBytesPerTrigger", "1b").load(s"$base/t"),
      TestSpark.tmpDir("rl2c"))
    assert(batches.sum == 502L, batches)
    // every commit exceeds 1 byte, so each admits alone: three batches
    assert(batches == Seq(500L, 1L, 1L), batches)
  }

  test("restart from checkpoint stays capped and replays nothing") {
    val base = TestSpark.tmpDir("rl3")
    val sink = new VersionedParquetSink(base)
    (0 until 3).foreach(i =>
      sink.append(Seq((i, s"v$i")).toDF("id", "v").coalesce(1), "t"))
    val ckpt = TestSpark.tmpDir("rl3c")
    def capped = spark.readStream.format("graft")
      .option("maxFilesPerTrigger", 1).load(s"$base/t")
    val first = drain(capped, ckpt)
    assert(first == Seq(1L, 1L, 1L), first)
    // new backlog, same checkpoint: the persisted floor keeps batches
    // capped after restart (no giant catch-up batch, no redelivery)
    (3 until 6).foreach(i =>
      sink.append(Seq((i, s"v$i")).toDF("id", "v").coalesce(1), "t"))
    val second = drain(capped, ckpt)
    assert(second == Seq(1L, 1L, 1L), second)
  }

  test("change feed respects maxFilesPerTrigger") {
    val base = TestSpark.tmpDir("rl4")
    val sink = new VersionedParquetSink(base)
    (0 until 4).foreach(i =>
      sink.append(Seq((i, s"v$i")).toDF("id", "v").coalesce(1), "t"))
    val batches = drain(
      spark.readStream.format("graft").option("readChangeFeed", "true")
        .option("maxFilesPerTrigger", 1).load(s"$base/t"),
      TestSpark.tmpDir("rl4c"))
    assert(batches.sum == 4L, batches)
    assert(batches.size == 4, s"CDF cap ignored: $batches")
  }

  test("catalog readStream.table passes rate-limit options through") {
    val base = TestSpark.tmpDir("rl5")
    spark.conf.set("spark.sql.catalog.rlc",
      "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.rlc.path", base)
    val sink = new VersionedParquetSink(base)
    (0 until 4).foreach(i =>
      sink.append(Seq((i, s"v$i")).toDF("id", "v").coalesce(1), "t"))
    val batches = drain(
      spark.readStream.option("maxFilesPerTrigger", 2).table("rlc.t"),
      TestSpark.tmpDir("rl5c"))
    assert(batches.sum == 4L, batches)
    assert(batches.size >= 2 && batches.forall(_ <= 2L), batches)
  }

  test("Trigger.AvailableNow drains the whole backlog in capped batches") {
    val base = TestSpark.tmpDir("rl6")
    val sink = new VersionedParquetSink(base)
    (0 until 5).foreach(i =>
      sink.append(Seq((i, s"v$i")).toDF("id", "v").coalesce(1), "t"))
    val batches = mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft")
      .option("maxFilesPerTrigger", 2).load(s"$base/t")
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches.synchronized { batches += b.count() }; ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", TestSpark.tmpDir("rl6c")).start()
    q.awaitTermination(120000)
    val got = batches.synchronized(batches.filter(_ > 0).toSeq)
    assert(got.sum == 5L, s"AvailableNow lost rows: $got")
    assert(got.size >= 3 && got.forall(_ <= 2L),
      s"AvailableNow ignored the cap: $got")
  }

  test("admission math: soft caps, free metadata commits, early stop") {
    val lim = AdmissionLimits(Some(2), None)
    // metadata-only commits ride along free
    assert(lim.admit(Iterator((1L, 1, 10L), (2L, 0, 0L), (3L, 1, 10L),
      (4L, 1, 10L)), 4L) == 3L)
    // an oversized first commit admits alone
    assert(AdmissionLimits(Some(1), None)
      .admit(Iterator((1L, 5, 10L), (2L, 1, 10L)), 2L) == 1L)
    // byte cap
    assert(AdmissionLimits(None, Some(15L))
      .admit(Iterator((1L, 1, 10L), (2L, 1, 10L)), 2L) == 1L)
    // no caps hit: admit everything
    assert(lim.admit(Iterator((1L, 1, 1L)), 5L) == 5L)
    // lazy early stop: the iterator past the cap is never forced
    var forced = 0
    val it = Iterator((1L, 2, 10L), (2L, 1, 10L), (3L, 1, 10L))
      .map { e => forced += 1; e }
    assert(lim.admit(it, 3L) == 1L)
    assert(forced <= 2, s"forced $forced entries past the cap")
  }
}
