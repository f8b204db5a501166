package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark's built-in bounded-state streaming dedup
  * (`dropDuplicatesWithinWatermark`) as the scale-path complement to
  * engine/DedupIndex: the index remembers EVERYTHING ever seen (exact +
  * near, persisted), while the watermarked operator keeps only the last
  * watermark-window of fingerprints in the state store — constant state
  * at any stream length, which is the shape a 100 TB ingest needs when
  * duplicates arrive close together (replays, double-sends, at-least-once
  * upstreams) rather than months apart.
  *
  * Covers: in-window exact dedup by content fingerprint, state-bound
  * semantics (a dup arriving AFTER its state was watermark-evicted is
  * re-emitted — the documented trade for bounded state), and checkpoint
  * recovery (a restart keeps dropping dups whose fingerprints are in
  * recovered state).
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def t(min: Int) = Timestamp.valueOf(f"2026-01-01 10:$min%02d:00")

  private def dedup(mem: MemoryStream[(Long, String, Timestamp)]) =
    mem.toDF().toDF("doc_id", "text", "ts")
      .withColumn("fp", md5(col("text").cast("binary")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("fp")

  test("in-window duplicates drop by fingerprint; state stays bounded by watermark") {
    val mem = MemoryStream[(Long, String, Timestamp)](spark)
    val q = dedup(mem).writeStream.format("memory")
      .queryName("sdedup1").outputMode("append")
      .option("checkpointLocation", TestSpark.tmpDir("sdedup1_ck"))
      .start()
    try {
      // batch 1: two distinct docs + one in-batch exact dup
      mem.addData((1L, "alpha doc", t(0)), (2L, "beta doc", t(1)),
        (3L, "alpha doc", t(2)))
      q.processAllAvailable()
      val r1 = spark.table("sdedup1").select("doc_id").as[Long].collect().toSet
      assert(r1.intersect(Set(1L, 3L)).size == 1, s"exactly one alpha: $r1")
      assert(r1.contains(2L))

      // batch 2: cross-batch dup inside the watermark window drops;
      // genuinely new doc passes
      mem.addData((10L, "beta doc", t(5)), (11L, "gamma doc", t(6)))
      q.processAllAvailable()
      val r2 = spark.table("sdedup1").select("doc_id").as[Long].collect().toSet
      assert(!r2.contains(10L), s"in-window dup must drop: $r2")
      assert(r2.contains(11L))

      // advance event time far past the watermark, then replay an old
      // fingerprint: its state entry has been evicted, so it re-emits —
      // the bounded-state trade (DedupIndex is the remember-forever path)
      mem.addData((20L, "delta doc", t(40)))
      q.processAllAvailable()
      mem.addData((21L, "alpha doc", t(41)))
      q.processAllAvailable()
      val r3 = spark.table("sdedup1").select("doc_id").as[Long].collect().toSet
      assert(r3.contains(21L),
        s"post-eviction replay re-emits (bounded state): $r3")
    } finally q.stop()
  }

  test("checkpoint recovery keeps dropping dups from recovered state") {
    // memory sink can't recover from a checkpoint; use the durable
    // parquet file sink (the production shape anyway)
    val ck = TestSpark.tmpDir("sdedup2_ck")
    val out = TestSpark.tmpDir("sdedup2_out")
    val mem = MemoryStream[(Long, String, Timestamp)](spark)
    def ids(): Set[Long] =
      spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    val q1 = dedup(mem).writeStream.format("parquet")
      .outputMode("append")
      .option("checkpointLocation", ck)
      .start(out)
    try {
      mem.addData((1L, "alpha doc", t(0)), (2L, "beta doc", t(1)))
      q1.processAllAvailable()
      assert(ids() == Set(1L, 2L))
    } finally q1.stop()

    // restart on the same checkpoint: a dup of pre-restart state must
    // still drop (fingerprint state recovered from the state store)
    val q2 = dedup(mem).writeStream.format("parquet")
      .outputMode("append")
      .option("checkpointLocation", ck)
      .start(out)
    try {
      mem.addData((10L, "alpha doc", t(3)), (11L, "epsilon doc", t(4)))
      q2.processAllAvailable()
      val r = ids()
      assert(!r.contains(10L), s"dup vs recovered state must drop: $r")
      assert(r.contains(11L), s"new doc must pass: $r")
    } finally q2.stop()
  }
}
