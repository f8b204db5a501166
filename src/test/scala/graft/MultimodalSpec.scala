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

  // --- real-codec path (javax.imageio — JDK readers, no container deps) ---

  /** 64x48 RGB test image: `vertical=true` is a bright-left/dark-right
    * split, false a bright-top/dark-bottom split — the two have grid
    * cosine ~0.6, far below any near-dup threshold. */
  private def testImage(vertical: Boolean): java.awt.image.BufferedImage = {
    val (w, h) = (64, 48)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val bright = if (vertical) x < w / 2 else y < h / 2
      img.setRGB(x, y, if (bright) 0xffffff else 0x000000)
    }
    img
  }

  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"no $fmt writer")
    out.toByteArray
  }

  test("ImageIoDecoder: real dims; pixel features identical across PNG/BMP") {
    val png = encode(testImage(vertical = true), "png")
    val bmp = encode(testImage(vertical = true), "bmp")
    assert(png.length != bmp.length) // genuinely different containers
    assert(Multimodal.ImageIoDecoder.dimensions(png).contains((64, 48)))
    assert(Multimodal.ImageIoDecoder.dimensions(bmp).contains((64, 48)))
    val fp = Multimodal.ImageIoDecoder.features(png, 8)
    val fb = Multimodal.ImageIoDecoder.features(bmp, 8)
    assert(fp.toSeq == fb.toSeq, "same pixels must give same features")
    assert(fp.forall(v => v >= 0.0 && v <= 1.0))
    assert(fp.distinct.length > 1, "grid features carry spatial signal")
    // undecodable bytes: deterministic fallback, not a crash
    val junk = Array[Byte](1, 2, 3, 4)
    assert(Multimodal.ImageIoDecoder.features(junk, 8).toSeq ==
      Multimodal.StubDecoder.features(junk, 8).toSeq)
    assert(Multimodal.ImageIoDecoder.dimensions(junk).isEmpty)
    // RECOGNIZED but corrupt: a truncated PNG makes the PNG reader THROW
    // (unlike junk, where read() returns null) — must also fall back
    val corrupt = png.take(64)
    assert(Multimodal.ImageIoDecoder.features(corrupt, 8).toSeq ==
      Multimodal.StubDecoder.features(corrupt, 8).toSeq)
    assert(Multimodal.ImageIoDecoder.dimensions(corrupt).isEmpty)
  }

  test("decodeMeta: width/height filled from container bytes") {
    val m = Multimodal.fromBinary(
      Seq((1L, encode(testImage(vertical = true), "png")),
        (2L, Array[Byte](9, 9))).toDF("doc_id", "bytes"),
      "doc_id", "bytes", "image")
    val rows = Multimodal.decodeMeta(spark, m).orderBy("media_id")
      .select("media_id", "meta.width", "meta.height").collect()
    assert(rows(0).getInt(1) == 64 && rows(0).getInt(2) == 48)
    assert(rows(1).getInt(1) == 0 && rows(1).getInt(2) == 0) // opaque: untouched
  }

  test("nearDuplicates(ImageIoDecoder): re-encoded image found, different image not") {
    val corpus = Multimodal.fromBinary(Seq(
      (1L, encode(testImage(vertical = true), "png")),
      (2L, encode(testImage(vertical = true), "bmp")), // same pixels, new container
      (3L, encode(testImage(vertical = false), "png")))
      .toDF("doc_id", "bytes"), "doc_id", "bytes", "image")
    val pairs = Multimodal.nearDuplicates(spark, corpus, dim = 8,
      threshold = 0.999, decoder = Multimodal.ImageIoDecoder)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
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
