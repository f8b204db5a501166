package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{SampleIndex, Sampling, VersionedParquetSink}

/** engine/SampleIndex.scala: the persisted streaming weighted reservoir
  * held to its algebra — the candidate log's top-k view equals the
  * one-shot batch sample over the union (top-k distributes over union
  * for A-Res keys), replay converges withOUT idempotency keys,
  * checkpoint loss needs no healing protocol, and compaction
  * interleaved with absorbs loses nothing (serializable rewrite). */
class SampleIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 10

  private def docsDf(rows: Seq[(Long, Long)]) = rows.toDF("doc_id", "wt")

  /** The one-shot reference: Sampling.weightedTopK over everything. */
  private def batchSample(rows: Seq[(Long, Long)]): Seq[Long] =
    Sampling.weightedTopK(docsDf(rows), col("doc_id"), col("wt"), K)
      .collect().map(_.getLong(0)).sorted.toSeq

  private def sampleIds(sink: VersionedParquetSink): Seq[Long] =
    SampleIndex.sample(spark, sink, K).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq

  test("incremental absorption equals the one-shot sample over the union") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("six_store"))
    val rnd = new scala.util.Random(41)
    val all = (1L to 300L).map(i => i -> (1L + rnd.nextInt(500)))
    all.grouped(70).foreach { chunk =>
      SampleIndex.absorb(spark, sink, docsDf(chunk), K)
    }
    assert(sampleIds(sink) == batchSample(all),
      "incremental reservoir diverged from the batch sample")
    // log growth is bounded by k per batch
    assert(sink.read(spark, "reservoir").count() <= 5L * K)
  }

  test("re-absorbed id with a CHANGED weight resolves to max es_key, " +
      "absorb-order-independently") {
    // A re-crawl can change a doc's length, so the same doc_id lands in
    // the log twice with different weights (different es_key). The
    // survivor must be the max-key row regardless of which absorb came
    // first — an arbitrary dropDuplicates survivor made the top-k
    // partitioning-dependent.
    def build(order: Seq[Seq[(Long, Long)]]): (Seq[Long], Long) = {
      val sink = new VersionedParquetSink(
        TestSpark.tmpDir(s"six_rewt_${order.hashCode}"))
      order.foreach(b => SampleIndex.absorb(spark, sink, docsDf(b), K))
      val s = SampleIndex.sample(spark, sink, K).collect()
      (s.map(_.getAs[Long]("doc_id")).sorted.toSeq,
        s.find(_.getAs[Long]("doc_id") == 7L)
          .map(_.getAs[Long]("wt")).getOrElse(-1L))
    }
    val others = (100L to 120L).map(_ -> 50L)
    val light = Seq(7L -> 1L)    // tiny weight: key far below zero
    val heavy = Seq(7L -> 99999L) // huge weight: key near zero (wins)
    val (idsA, wtA) = build(Seq(others, light, heavy))
    val (idsB, wtB) = build(Seq(others, heavy, light))
    assert(idsA == idsB, "sample depends on absorb order")
    assert(wtA == 99999L && wtB == 99999L,
      s"survivor must carry the max-key weight, got $wtA / $wtB")
  }

  test("keyless replay never corrupts the sample; keys bound log growth") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("six_replay"))
    val b1 = (1L to 50L).map(i => i -> (i % 7 + 1))
    val b2 = (51L to 90L).map(i => i -> (i % 11 + 1))
    SampleIndex.absorb(spark, sink, docsDf(b1), K, batchKey = Some("b1"))
    SampleIndex.absorb(spark, sink, docsDf(b2), K, batchKey = Some("b2"))
    val before = sampleIds(sink)
    val logBefore = sink.read(spark, "reservoir").count()
    // keyed replay: appendOnce no-ops, the log does not grow
    SampleIndex.absorb(spark, sink, docsDf(b2), K, batchKey = Some("b2"))
    assert(sink.read(spark, "reservoir").count() == logBefore)
    // UNKEYED out-of-order replay (checkpoint-loss re-batching): the log
    // grows but the sample is unchanged — duplicate rows are identical
    SampleIndex.absorb(spark, sink, docsDf(b2), K)
    SampleIndex.absorb(spark, sink, docsDf(b1), K)
    assert(sampleIds(sink) == before, "replay changed the sample")
    assert(before == batchSample(b1 ++ b2))
  }

  test("compaction folds the log to k rows and preserves the sample; " +
    "absorbs after compaction keep composing") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("six_compact"))
    val b1 = (1L to 120L).map(i => i -> (i % 13 + 1))
    val b2 = (121L to 240L).map(i => i -> (i % 17 + 1))
    SampleIndex.absorb(spark, sink, docsDf(b1), K)
    SampleIndex.absorb(spark, sink, docsDf(b2), K)
    val before = sampleIds(sink)
    SampleIndex.compact(spark, sink, K)
    assert(sink.read(spark, "reservoir").count() == K.toLong)
    assert(sampleIds(sink) == before, "compaction changed the sample")
    // post-compaction absorb still composes exactly
    val b3 = (241L to 360L).map(i => i -> (i % 19 + 1))
    SampleIndex.absorb(spark, sink, docsDf(b3), K)
    assert(sampleIds(sink) == batchSample(b1 ++ b2 ++ b3))
  }

  test("compaction racing concurrent absorbs loses nothing (serializable)") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("six_race"))
    SampleIndex.absorb(spark, sink,
      docsDf((1L to 60L).map(i => i -> (i % 5 + 1))), K)
    // interleave: 4 absorbing writers race 3 compactions
    val pool = java.util.concurrent.Executors.newFixedThreadPool(7)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val absorbs = (0 until 4).map { t =>
      scala.concurrent.Future {
        val rows = (1L to 30L).map(i => (1000L * (t + 1) + i) -> (i % 7 + 1))
        SampleIndex.absorb(spark, sink, docsDf(rows), K)
      }
    }
    val compacts = (0 until 3).map { _ =>
      scala.concurrent.Future(SampleIndex.compact(spark, sink, K))
    }
    import scala.concurrent.duration._
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(absorbs ++ compacts), 300.seconds)
    pool.shutdown()
    // final compact quiesced, then the sample must equal the one-shot
    // sample over EVERYTHING any writer contributed
    SampleIndex.compact(spark, sink, K)
    val all = (1L to 60L).map(i => i -> (i % 5 + 1)) ++
      (0 until 4).flatMap(t =>
        (1L to 30L).map(i => (1000L * (t + 1) + i) -> (i % 7 + 1)))
    assert(sampleIds(sink) == batchSample(all),
      "a concurrent absorb's contribution was lost")
  }

  test("compaction + vacuum reclaim the log's superseded storage") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("six_vac"))
    (0 until 6).foreach { t =>
      SampleIndex.absorb(spark, sink,
        docsDf((1L to 40L).map(i => (100L * t + i) -> (i % 9 + 1))), K)
    }
    val before = sampleIds(sink)
    SampleIndex.compact(spark, sink, K)
    // the compaction commit supersedes the six appended log segments;
    // an includeSuperseded vacuum reclaims them and the sample survives
    val reclaimed = sink.vacuum(spark, "reservoir", graceMs = 0L,
      includeSuperseded = true)
    assert(reclaimed >= 6, s"expected >=6 superseded dirs, got $reclaimed")
    assert(sampleIds(sink) == before, "vacuum changed the sample")
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
    val first = sampleIds(sink)
    assert(first.size == K)
    // the sample equals the batch sample with the SAME weights
    val want = batchSample(
      (1L to 40L).map(i => i -> (i % 9 + 1) * 10) ++
        (41L to 80L).map(i => i -> (i % 5 + 1) * 25))
    assert(first == want)
    // restart with the same checkpoint: offsets hold, nothing changes
    SampleIndex.streamSampled(spark, docsDir, sink, ckpt, K)
      .awaitTermination()
    assert(sampleIds(sink) == first)
    val logAfter = sink.read(spark, "reservoir").count()
    // checkpoint LOST: files replay — content keys no-op the appends
    // (same per-file batches), and the sample converges regardless
    SampleIndex.streamSampled(spark, docsDir, sink,
      TestSpark.tmpDir("six_ck2"), K).awaitTermination()
    assert(sampleIds(sink) == first,
      "checkpoint-loss replay changed the sample")
    assert(sink.read(spark, "reservoir").count() == logAfter,
      "keyed appends re-appended on an identical replay")
  }
}
