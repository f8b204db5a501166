package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{SampleIndex, Sampling, VersionedParquetSink}

/** engine/SampleIndex.scala: the persisted streaming weighted reservoir
  * held to its algebra — incremental absorption equals the one-shot
  * batch sample over the union (top-k distributes over union for A-Res
  * keys), replay converges without idempotency keys, and checkpoint
  * loss needs no healing protocol. */
class SampleIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 10

  private def docsDf(rows: Seq[(Long, Long)]) = rows.toDF("doc_id", "wt")

  /** The one-shot reference: Sampling.weightedTopK over everything. */
  private def batchSample(rows: Seq[(Long, Long)]): Seq[Long] =
    Sampling.weightedTopK(docsDf(rows), col("doc_id"), col("wt"), K)
      .collect().map(_.getLong(0)).sorted.toSeq

  private def reservoirIds(sink: VersionedParquetSink): Seq[Long] =
    sink.read(spark, "reservoir").collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq

  test("incremental absorption equals the one-shot sample over the union") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("six_store"))
    val rnd = new scala.util.Random(41)
    val all = (1L to 300L).map(i => i -> (1L + rnd.nextInt(500)))
    all.grouped(70).foreach { chunk =>
      SampleIndex.absorb(spark, sink, docsDf(chunk), K)
    }
    assert(reservoirIds(sink) == batchSample(all),
      "incremental reservoir diverged from the batch sample")
  }

  test("absorbing the same batch twice is a no-op (replay convergence)") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("six_replay"))
    val b1 = (1L to 50L).map(i => i -> (i % 7 + 1))
    val b2 = (51L to 90L).map(i => i -> (i % 11 + 1))
    SampleIndex.absorb(spark, sink, docsDf(b1), K)
    SampleIndex.absorb(spark, sink, docsDf(b2), K)
    val before = reservoirIds(sink)
    SampleIndex.absorb(spark, sink, docsDf(b2), K) // replay
    SampleIndex.absorb(spark, sink, docsDf(b1), K) // out-of-order replay
    assert(reservoirIds(sink) == before, "replay changed the reservoir")
    assert(before == batchSample(b1 ++ b2))
  }

  test("size bound: never more than k rows, fewer when input is small") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("six_small"))
    SampleIndex.absorb(spark, sink, docsDf(Seq(1L -> 5L, 2L -> 3L)), K)
    assert(sink.read(spark, "reservoir").count() == 2)
    SampleIndex.absorb(spark, sink,
      docsDf((3L to 200L).map(_ -> 4L)), K)
    assert(sink.read(spark, "reservoir").count() == K.toLong)
  }

  test("streaming ingestion: micro-batches fold in; checkpoint loss converges") {
    val docsDir = TestSpark.tmpDir("six_in")
    val ckpt = TestSpark.tmpDir("six_ck")
    val sink = new VersionedParquetSink(TestSpark.tmpDir("six_sstore"))
    def line(id: Long, len: Int) =
      s"""{"doc_id":$id,"text":"${"x" * len}"}"""
    Files.write(Paths.get(docsDir, "b1.json"),
      (1L to 40L).map(i => line(i, (i % 9 + 1).toInt * 10))
        .mkString("\n").getBytes)
    Files.write(Paths.get(docsDir, "b2.json"),
      (41L to 80L).map(i => line(i, (i % 5 + 1).toInt * 25))
        .mkString("\n").getBytes)
    SampleIndex.streamSampled(spark, docsDir, sink, ckpt, K)
      .awaitTermination()
    val first = reservoirIds(sink)
    assert(first.size == K)
    // the reservoir equals the batch sample with the SAME weights
    val want = batchSample(
      (1L to 40L).map(i => i -> (i % 9 + 1) * 10) ++
        (41L to 80L).map(i => i -> (i % 5 + 1) * 25))
    assert(first == want)
    // restart with the same checkpoint: offsets hold, nothing changes
    SampleIndex.streamSampled(spark, docsDir, sink, ckpt, K)
      .awaitTermination()
    assert(reservoirIds(sink) == first)
    // checkpoint LOST: every file replays — idempotent merge converges
    SampleIndex.streamSampled(spark, docsDir, sink,
      TestSpark.tmpDir("six_ck2"), K).awaitTermination()
    assert(reservoirIds(sink) == first,
      "checkpoint-loss replay changed the reservoir")
  }
}
