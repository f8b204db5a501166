package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{AnnIndex, VersionedParquetSink}

/** The persisted incremental ANN index ([[graft.engine.AnnIndex]]):
  * IVF-PQ quantizers + encoded corpus as versioned tables, O(batch)
  * appends against frozen quantizers with exactly-once replay, search
  * over codes only, and generation-swapping retrain with history. */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vectors(ids: Range, dim: Int) =
    ids.map { i =>
      (i.toLong, (0 until dim).map { j =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"${i}_$j".getBytes("UTF-8"))
        ((h(0) & 0xff) * 256 + (h(1) & 0xff)) / 65535.0 - 0.5
      })
    }.toDF("id", "vec")

  test("build publishes atomically; search runs over codes; appends are exactly-once") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("annidx"))
    val seed = vectors(0 until 60, 16)
    AnnIndex.build(spark, sink, "ann", seed, dim = 16,
      kCoarse = 4, m = 2, subK = 16)

    // all three tables landed in one transaction
    assert(sink.read(spark, "ann_centroids").count() == 4)
    assert(sink.read(spark, "ann_codebooks").count() == 32) // 2 subs x 16
    assert(sink.read(spark, "ann_vectors").count() == 60)

    val hits = AnnIndex.search(spark, sink, "ann",
      vectors(0 until 2, 16), probes = 4, k = 5)
    assert(hits.groupBy("q_id").count().collect()
      .forall(_.getLong(1) == 5))

    // a replayed build is rejected loudly (the index already exists)
    intercept[IllegalArgumentException] {
      AnnIndex.build(spark, sink, "ann", seed, 16, 4, 2, 16)
    }

    // append a new batch: encoded against the FROZEN quantizers —
    // existing rows' codes must be byte-identical afterwards
    val before = sink.read(spark, "ann_vectors")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](2)).toMap
    assert(AnnIndex.append(spark, sink, "ann",
      vectors(60 until 90, 16), batchKey = "b1"))
    val after = sink.read(spark, "ann_vectors")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](2)).toMap
    assert(after.size == 90)
    before.foreach { case (id, codes) => assert(after(id) == codes) }

    // crash-replay of the same batch encodes NOTHING twice
    assert(!AnnIndex.append(spark, sink, "ann",
      vectors(60 until 90, 16), batchKey = "b1"))
    assert(sink.read(spark, "ann_vectors").count() == 90)

    // new vectors are immediately searchable
    val hits2 = AnnIndex.search(spark, sink, "ann",
      vectors(60 until 61, 16), probes = 4, k = 5)
    assert(hits2.count() == 5)

    // cell health covers every vector exactly once
    val health = AnnIndex.cellHealth(spark, sink, "ann").collect()
    assert(health.map(_.getLong(1)).sum == 90)
  }

  test("streaming ingestion: files append exactly-once, replay-safe") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("annidx3"))
    AnnIndex.build(spark, sink, "ann", vectors(0 until 30, 8),
      dim = 8, kCoarse = 3, m = 2, subK = 8)

    val dir = TestSpark.tmpDir("annvecs")
    def writeFile(name: String, ids: Range): Unit = {
      val lines = ids.map { i =>
        val v = vectors(i to i, 8).head.getSeq[Double](1)
        s"""{"id":$i,"vec":[${v.mkString(",")}]}"""
      }
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/$name.json"),
        lines.mkString("\n").getBytes("UTF-8"))
      ()
    }
    writeFile("a", 30 until 40)
    writeFile("b", 40 until 50)
    val cp = TestSpark.tmpDir("anncp")
    AnnIndex.streamAppend(spark, dir, sink, "ann", dim = 8,
      checkpoint = cp).awaitTermination()
    assert(sink.read(spark, "ann_vectors").count() == 50)

    // checkpoint loss + replay over the SAME files: content keys no-op
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(cp))
    AnnIndex.streamAppend(spark, dir, sink, "ann", dim = 8,
      checkpoint = TestSpark.tmpDir("anncp2")).awaitTermination()
    assert(sink.read(spark, "ann_vectors").count() == 50)

    // a new file after the loss still lands
    writeFile("c", 50 until 55)
    AnnIndex.streamAppend(spark, dir, sink, "ann", dim = 8,
      checkpoint = TestSpark.tmpDir("anncp3")).awaitTermination()
    assert(sink.read(spark, "ann_vectors").count() == 55)
    assert(sink.read(spark, "ann_vectors").select("id").distinct()
      .count() == 55)
  }

  test("retrain swaps generations atomically per table; history survives") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("annidx2"))
    AnnIndex.build(spark, sink, "ann", vectors(0 until 40, 8),
      dim = 8, kCoarse = 3, m = 2, subK = 8)
    AnnIndex.append(spark, sink, "ann", vectors(40 until 80, 8), "b1")
    val grown = AnnIndex.cellHealth(spark, sink, "ann").collect()
      .map(_.getLong(1)).sum
    assert(grown == 80)

    // retrain on the full current corpus: the quantizer generation
    // swaps, every vector re-encodes, search stays correct
    AnnIndex.retrain(spark, sink, "ann", vectors(0 until 80, 8),
      dim = 8, kCoarse = 5, m = 2, subK = 16)
    assert(sink.read(spark, "ann_centroids").count() == 5)
    assert(sink.read(spark, "ann_vectors").count() == 80)
    val hits = AnnIndex.search(spark, sink, "ann",
      vectors(0 until 2, 8), probes = 5, k = 3)
    assert(hits.count() == 6)
    // the pre-retrain index generation is still time-travelable
    assert(sink.readAt(spark, "ann_centroids", 0).count() == 3)
  }
}
