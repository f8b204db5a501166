package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val media = Multimodal.fromBinary(
    Seq((1L, "abcdefgh"), (2L, "zz")).toDF("doc_id", "text"),
    "doc_id", "text", "image")

  test("fromBinary: opaque payload + typed metadata schema") {
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    val kinds = media.select("meta.kind").collect().map(_.getString(0)).toSet
    assert(kinds == Set("image"))
  }

  test("extractFeatures: deterministic stub features, fixed dim, checksum") {
    val f1 = Multimodal.extractFeatures(spark, media, dim = 4).orderBy("media_id").collect()
    val f2 = Multimodal.extractFeatures(spark, media, dim = 4).orderBy("media_id").collect()
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq) // deterministic
    assert(f1(0).getAs[scala.collection.Seq[Double]]("features").length == 4)
    assert(f1(0).getAs[Long]("n_bytes") == 8L)
    assert(f1(1).getAs[Long]("n_bytes") == 2L)
    assert(f1(0).getAs[Long]("checksum") != f1(1).getAs[Long]("checksum"))
  }

  test("nearDuplicates: perturbed payload flagged, unrelated not; exact dups via checksum") {
    val base = "the quick brown fox jumps over the lazy dog, repeatedly " * 6
    val corpus = Multimodal.fromBinary(Seq(
      (10L, base),
      (11L, base.dropRight(1) + "!"),                 // 1-byte perturbation
      (12L, base),                                    // exact duplicate
      (13L, scala.util.Random.javaRandomToRandom(
        new java.util.Random(7)).alphanumeric.take(base.length).mkString))
      .toDF("doc_id", "text"), "doc_id", "text", "image")

    val pairs = Multimodal.nearDuplicates(spark, corpus, dim = 8,
      threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((10L, 11L)), s"perturbed dup missed: $pairs")
    assert(pairs.contains((10L, 12L)), s"exact dup missed: $pairs")
    assert(!pairs.exists(p => p._1 == 13L || p._2 == 13L),
      s"unrelated payload flagged: $pairs")

    // exact byte-dup detection is a checksum groupBy, no features needed
    val byCrc = Multimodal.extractFeatures(spark, corpus)
      .groupBy("checksum").count().filter($"count" > 1).collect()
    assert(byCrc.length == 1 && byCrc(0).getLong(1) == 2)
  }

  test("sampleFrames: one row per sampled fixed-size chunk") {
    val frames = Multimodal.sampleFrames(spark, media, frameSize = 2, stride = 2)
      .orderBy("media_id", "frame_no").collect()
    // doc1: chunks 0..3 -> frames 0,2 ; doc2: chunk 0 -> frame 0
    assert(frames.map(r => (r.getLong(0), r.getInt(1))).toSeq ==
      Seq((1L, 0), (1L, 2), (2L, 0)))
    assert(new String(frames(1).getAs[Array[Byte]]("frame_bytes")) == "ef")
  }
}
