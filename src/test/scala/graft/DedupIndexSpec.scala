package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{DedupIndex, ParquetTableSink, VersionedParquetSink}

class DedupIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val longA = "the committee approved the annual budget after a " +
    "long debate over infrastructure spending and road maintenance costs"
  private val longB = "astronomers observed a distant comet passing close " +
    "to the outer planets during the early winter observation window"
  private val longC = "local bakers won the regional pastry competition " +
    "with an unusual sourdough recipe passed down through generations"

  test("incremental dedup: exact + near dups dropped across rounds, index grows") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("dix"))

    // round 1: one in-batch exact duplicate
    val r1 = DedupIndex.appendDeduped(spark, sink,
      Seq((1L, longA), (2L, longA), (3L, longB)).toDF("doc_id", "text"))
    assert(r1.appended == 2)
    assert(r1.droppedExact == 1)
    assert(r1.droppedNear == 0)
    assert(sink.read(spark, "corpus").count() == 2)

    // round 2: exact dup of round-1 doc, near dup (one word changed),
    // and a genuinely new doc
    val nearA = longA.replace("annual", "yearly")
    val r2 = DedupIndex.appendDeduped(spark, sink,
      Seq((10L, longB), (11L, nearA), (12L, longC)).toDF("doc_id", "text"))
    assert(r2.droppedExact == 1, s"exact dup of stored doc must drop: $r2")
    assert(r2.droppedNear == 1, s"near dup of stored doc must drop: $r2")
    assert(r2.appended == 1)
    val ids = sink.read(spark, "corpus").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L, 12L))

    // round 3: replay of round 2 is fully absorbed by the index
    val r3 = DedupIndex.appendDeduped(spark, sink,
      Seq((20L, longB), (21L, nearA), (22L, longC)).toDF("doc_id", "text"))
    assert(r3.appended == 0, s"replayed batch must append nothing: $r3")
    assert(sink.read(spark, "corpus").count() == 3)
    // the index absorbs every exact-distinct doc SEEN — including the
    // near-victim (doc 11), which never reached the corpus but must be
    // remembered so replays and future dups of it stay dropped
    assert(sink.read(spark, "dedup_fp").count() == 4)
    assert(sink.read(spark, "dedup_sig").count() == 16)
    // an exact copy of the dropped near-victim is also absorbed
    val r4 = DedupIndex.appendDeduped(spark, sink,
      Seq((30L, longA.replace("annual", "yearly"))).toDF("doc_id", "text"))
    assert(r4.appended == 0 && r4.droppedExact == 1)
  }

  test("streaming ingestion dedups each micro-batch against the index") {
    import java.nio.file.{Files, Paths}
    val docsDir = TestSpark.tmpDir("dixs_in")
    val ckpt = TestSpark.tmpDir("dixs_ck")
    val sink = new VersionedParquetSink(TestSpark.tmpDir("dixs_store"))
    def line(id: Long, text: String) =
      s"""{"doc_id":$id,"text":"$text"}"""

    Files.write(Paths.get(docsDir, "b1.json"),
      Seq(line(1, longA), line(2, longB)).mkString("\n").getBytes)
    DedupIndex.streamDeduped(spark, docsDir, sink, ckpt).awaitTermination()
    assert(sink.read(spark, "corpus").count() == 2)

    // second drop: an exact dup, a near dup, and a new doc
    Files.write(Paths.get(docsDir, "b2.json"),
      Seq(line(10, longA), line(11, longB.replace("distant", "remote")),
        line(12, longC)).mkString("\n").getBytes)
    DedupIndex.streamDeduped(spark, docsDir, sink, ckpt).awaitTermination()
    val ids = sink.read(spark, "corpus").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 12L), s"got $ids")
    // restart with no new files: checkpointed offsets, nothing re-runs
    DedupIndex.streamDeduped(spark, docsDir, sink, ckpt).awaitTermination()
    assert(sink.read(spark, "corpus").count() == 3)

    // catastrophic restart: checkpoint LOST, every batch replays from
    // scratch — the batchId-keyed sink commits plus the content index
    // absorb the full replay with zero duplicates
    val ckpt2 = TestSpark.tmpDir("dixs_ck2")
    DedupIndex.streamDeduped(spark, docsDir, sink, ckpt2).awaitTermination()
    assert(sink.read(spark, "corpus").count() == 3)
    assert(sink.read(spark, "corpus").select("doc_id").distinct().count() == 3)
  }

  test("precision stage: LSH false positive dropped without verification, kept with it") {
    import graft.functions.{MinHashLsh, Text}
    // Engineer a real band collision with LOW true jaccard: tiny doc A
    // (one shingle) vs "A's tokens + filler" — B inherits A's shingle, and
    // for SOME filler one band's two slice-minima both stay on that shared
    // shingle. Deterministic search over seeds; the corpus is fixed, so
    // the found seed is stable.
    // Pre-searched offline against the md5 slice scheme (md5("alpha beta
    // gamma447") has band 2's both slices tiny, so that band's minima in
    // B stay on the shared shingle): verified colliding + low-jaccard
    // below, so scheme drift can't silently hollow out the test.
    val a = "alpha beta gamma447" // exactly one 3-gram shingle
    val b = a + " " + (1 to 12).map(i => s"w1-$i").mkString(" ")
    def bands(text: String): Set[(Int, String)] =
      MinHashLsh.signatures(spark, Seq((0L, text)).toDF("doc_id", "text"))
        .collect().map(r => (r.getInt(1), r.getString(2))).toSet
    assert(bands(a).intersect(bands(b)).nonEmpty, "band collision gone")
    assert(Text.jaccard(a, b, 3) < 0.3, "not a false positive any more")

    // without verification: the collision costs document B
    val s1 = new VersionedParquetSink(TestSpark.tmpDir("dixv1"))
    val r1 = DedupIndex.appendDeduped(spark, s1,
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"))
    assert(r1.appended == 1 && r1.droppedNear == 1, s"$r1")

    // with verification: exact jaccard exposes the false positive in-batch
    val s2 = new VersionedParquetSink(TestSpark.tmpDir("dixv2"))
    val r2 = DedupIndex.appendDeduped(spark, s2,
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"),
      verifyThreshold = Some(0.5))
    assert(r2.appended == 2 && r2.droppedNear == 0, s"$r2")

    // index-side path: the same false positive arriving in a LATER batch
    // is verified against the corpus text and survives too
    val s3 = new VersionedParquetSink(TestSpark.tmpDir("dixv3"))
    DedupIndex.appendDeduped(spark, s3,
      Seq((1L, a)).toDF("doc_id", "text"), verifyThreshold = Some(0.5))
    val r3 = DedupIndex.appendDeduped(spark, s3,
      Seq((2L, b)).toDF("doc_id", "text"), verifyThreshold = Some(0.5))
    assert(r3.appended == 1 && r3.droppedNear == 0, s"$r3")
    // a genuine near-dup (one trailing token changed, jaccard ~0.83)
    // must still drop with verification on
    val nearB = (b.split(" ").init :+ "zzz").mkString(" ")
    val r4 = DedupIndex.appendDeduped(spark, s2,
      Seq((4L, nearB)).toDF("doc_id", "text"),
      verifyThreshold = Some(0.5))
    assert(r4.appended == 0 && r4.droppedNear == 1, s"$r4")
  }

  test("streaming ingestion passes verifyThreshold through to the precision stage") {
    import java.nio.file.{Files, Paths}
    // same engineered band-collision false-positive pair as the batch
    // precision test: without verification the collision costs doc 2;
    // with the threshold the streamed micro-batch keeps both
    val a = "alpha beta gamma447"
    val b = a + " " + (1 to 12).map(i => s"w1-$i").mkString(" ")
    def line(id: Long, text: String) = s"""{"doc_id":$id,"text":"$text"}"""
    val docsDir = TestSpark.tmpDir("dixsv_in")
    Files.write(Paths.get(docsDir, "b1.json"),
      Seq(line(1, a), line(2, b)).mkString("\n").getBytes)

    val plain = new VersionedParquetSink(TestSpark.tmpDir("dixsv_s1"))
    DedupIndex.streamDeduped(spark, docsDir, plain,
      TestSpark.tmpDir("dixsv_ck1")).awaitTermination()
    assert(plain.read(spark, "corpus").count() == 1)

    val verified = new VersionedParquetSink(TestSpark.tmpDir("dixsv_s2"))
    DedupIndex.streamDeduped(spark, docsDir, verified,
      TestSpark.tmpDir("dixsv_ck2"),
      verifyThreshold = Some(0.5)).awaitTermination()
    assert(verified.read(spark, "corpus").count() == 2)
  }

  test("works identically on the plain parquet sink (trait slot-in)") {
    val sink = new ParquetTableSink(TestSpark.tmpDir("dixp"))
    val r1 = DedupIndex.appendDeduped(spark, sink,
      Seq((1L, longA)).toDF("doc_id", "text"))
    val r2 = DedupIndex.appendDeduped(spark, sink,
      Seq((2L, longA), (3L, longB)).toDF("doc_id", "text"))
    assert(r1.appended == 1 && r2.appended == 1 && r2.droppedExact == 1)
    assert(sink.read(spark, "corpus").count() == 2)
  }
}
