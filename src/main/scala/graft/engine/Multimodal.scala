package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column support (SURVEY.md §2.8): image/audio/video as
  * opaque `binary` payloads with typed metadata, plus decode /
  * feature-extract / frame-sample stages.
  *
  * Spark-side design for 100 TB:
  *  - payloads travel as BinaryType columns next to their metadata
  *    struct, so pruning a query down to metadata never reads the bytes
  *    (parquet column pruning drops the payload pages entirely);
  *  - per-item decode runs as `mapPartitions` over a typed Dataset —
  *    batched, executor-parallel, no driver round-trip; a real codec
  *    binding slots into [[MediaDecoder]] without touching the plumbing;
  *  - frame sampling emits one row per frame via flatMap (generator
  *    shape), keyed by (media_id, frame_no) for downstream joins.
  *
  * The decode itself is STUBBED: this container has no image/audio
  * codecs, so [[StubDecoder]] derives deterministic pseudo-features from
  * the bytes. The schema, partitioning, and batch shape — the parts that
  * matter for the engine — are real and tested.
  */
object Multimodal {

  case class MediaMeta(kind: String, width: Int, height: Int, durationMs: Long)
  case class MediaItem(media_id: Long, meta: MediaMeta, payload: Array[Byte])
  case class MediaFeatures(
      media_id: Long, n_bytes: Long, checksum: Long, features: Array[Double])
  case class Frame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  /** Decoder boundary: a real implementation binds an image/audio codec
    * library here (javax.imageio, javacv, ffmpeg-cli, ...). Must be
    * serializable — it ships to executors. */
  trait MediaDecoder extends Serializable {
    def features(payload: Array[Byte], dim: Int): Array[Double]
    /** Container-level (width, height), if this decoder understands the
      * format; None for opaque payloads. */
    def dimensions(payload: Array[Byte]): Option[(Int, Int)] = None
  }

  /** STUB: deterministic pseudo-decoder — byte histogram folded into a
    * fixed-dim feature vector. Stands in for a real codec; keeps every
    * test reproducible. */
  object StubDecoder extends MediaDecoder {
    override def features(payload: Array[Byte], dim: Int): Array[Double] = {
      val acc = new Array[Double](dim)
      var i = 0
      while (i < payload.length) {
        acc(i % dim) += (payload(i) & 0xff) / 255.0
        i += 1
      }
      acc
    }
  }

  /** Real image decoder on javax.imageio — PNG/BMP/GIF/JPEG readers ship
    * in the JDK, so no native codecs are needed. Features are the mean
    * luminance (Rec.601 weights) over a g x g tile grid of the DECODED
    * pixels (g = ceil(sqrt(dim)), truncated to dim): pixel-content
    * features, so the same image re-encoded in a different container
    * (PNG vs BMP) lands on identical features — which is exactly what
    * [[nearDuplicates]] needs, and what the byte-level [[StubDecoder]]
    * cannot provide. Undecodable payloads fall back to StubDecoder's
    * deterministic pseudo-features rather than failing the batch (one
    * corrupt image must not kill a 100 TB decode stage). */
  object ImageIoDecoder extends MediaDecoder {
    private def read(payload: Array[Byte]): java.awt.image.BufferedImage = {
      javax.imageio.ImageIO.setUseCache(false) // no temp-file churn on executors
      // ImageIO.read returns null for UNRECOGNIZED formats but THROWS for
      // recognized-but-corrupt payloads (e.g. a PNG with truncated IDAT);
      // both must degrade to the fallback, not kill the executor task
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    }

    override def features(payload: Array[Byte], dim: Int): Array[Double] = {
      val img = read(payload)
      if (img == null) return StubDecoder.features(payload, dim)
      val g = math.ceil(math.sqrt(dim.toDouble)).toInt
      val (w, h) = (img.getWidth, img.getHeight)
      val acc = new Array[Double](g * g)
      val cnt = new Array[Long](g * g)
      val row = new Array[Int](w) // row-batched getRGB: one JNI-ish call per scanline
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, row, 0, w)
        val cy = y * g / h
        var x = 0
        while (x < w) {
          val rgb = row(x)
          val lum = (0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
            0.114 * (rgb & 0xff)) / 255.0
          val c = cy * g + x * g / w
          acc(c) += lum
          cnt(c) += 1
          x += 1
        }
        y += 1
      }
      val out = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        out(i) = if (i < g * g && cnt(i) > 0) acc(i) / cnt(i) else 0.0
        i += 1
      }
      out
    }

    override def dimensions(payload: Array[Byte]): Option[(Int, Int)] = {
      val img = read(payload)
      if (img == null) None else Some((img.getWidth, img.getHeight))
    }
  }

  /** Wrap a text/blob column as media items (how opaque payloads enter
    * the engine; in production the payloads come from object storage). */
  def fromBinary(df: DataFrame, idCol: String, payloadCol: String,
      kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      struct(lit(kind).as("kind"), lit(0).as("width"), lit(0).as("height"),
        lit(0L).as("durationMs")).as("meta"),
      col(payloadCol).cast("binary").as("payload"))

  /** Batched feature extraction: one decode pass per partition. */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int = 8,
      decoder: MediaDecoder = StubDecoder): DataFrame = {
    import spark.implicits._
    media.as[MediaItem].mapPartitions(_.map { m =>
      var crc = 0L
      var i = 0
      while (i < m.payload.length) { crc = crc * 31 + (m.payload(i) & 0xff); i += 1 }
      MediaFeatures(m.media_id, m.payload.length.toLong, crc,
        decoder.features(m.payload, dim))
    }).toDF()
  }

  /** Fill in meta.width/height from the actual container bytes (decode
    * headers only conceptually — imageio reads the frame, which a
    * production binding would avoid with a header-only parse). Payloads
    * the decoder doesn't understand keep their existing meta. */
  def decodeMeta(spark: SparkSession, media: DataFrame,
      decoder: MediaDecoder = ImageIoDecoder): DataFrame = {
    import spark.implicits._
    media.as[MediaItem].mapPartitions(_.map { m =>
      decoder.dimensions(m.payload) match {
        case Some((w, h)) => m.copy(meta = m.meta.copy(width = w, height = h))
        case None => m
      }
    }).toDF()
  }

  /** Sample every `stride`-th fixed-size chunk as a "frame" (video
    * frame-sampling shape: flatMap generator, one row per frame). */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameSize: Int, stride: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaItem].flatMap { m =>
      m.payload.grouped(frameSize).zipWithIndex
        .filter { case (_, i) => i % stride == 0 }
        .map { case (bytes, i) => Frame(m.media_id, i, bytes) }
    }.toDF()
  }

  /** Near-duplicate media detection over decoded features — the
    * multimodal face of the embedding-dedup path (q_dedup_embed /
    * q_ann_bucket): features -> banded sign-bit buckets -> cosine
    * (codegen'd `graft_dot`) only for co-bucketed pairs, so the join
    * never goes all-pairs; exact byte-duplicates are a checksum groupBy
    * away and need no features at all.
    *
    * TWO OR'd bands of 2 sign bits each (not one AND-of-4-bits bucket):
    * a near-tie coordinate can flip one bit under perturbation, and with
    * a single all-bits bucket that one flip silently drops a
    * 0.9999-cosine pair — the recall collapse multi-band LSH exists to
    * prevent. A pair survives if it co-buckets in EITHER band.
    *
    * Returns (m1, m2, sim) pairs with rounded cosine >= threshold. */
  private case class FeatsKey(session: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      dim: Int, decoder: String)
  private val featsCache =
    new java.util.concurrent.ConcurrentHashMap[FeatsKey, DataFrame]()

  /** Drop all memoized decoded-feature tables (and their cached blocks).
    * The memo keys on the input's CANONICALIZED PLAN, so re-reading the
    * same directory after new files landed still hits the old entry —
    * call this (or use a new session) to force a re-scan. */
  def clearFeatureCache(): Unit = {
    featsCache.values.forEach(df =>
      if (!df.sparkSession.sparkContext.isStopped) { df.unpersist(); () })
    featsCache.clear()
  }

  def nearDuplicates(spark: SparkSession, media: DataFrame, dim: Int = 8,
      threshold: Double = 0.999,
      decoder: MediaDecoder = StubDecoder): DataFrame = {
    graft.GraftExtensions.ensureRegistered(spark)
    require(dim >= 8, "bucketing pairs coordinates (k, k+4); need dim >= 8")
    // hyperplane bit k = sign of f[k] - f[k+4]: scale-invariant and
    // balanced even for non-centered features (StubDecoder's are all
    // positive, so a fixed >=0 threshold would put EVERYTHING in one
    // bucket — the classic LSH pitfall with non-centered data)
    def bit(k: Int) =
      when(element_at(col("features"), k + 1) >=
        element_at(col("features"), k + 5), lit(1 << (k % 2)))
        .otherwise(lit(0))
    // the decode (mapPartitions, arbitrarily expensive with a real
    // codec) feeds both join sides — cache it so it runs once per item;
    // memoized per (session, input plan, dim, decoder) so repeated calls
    // reuse ONE cached table instead of leaking a new block set each
    // invocation (same fix class as NorthStarQueries.cappedShingles).
    // SNAPSHOT semantics: a file-based input re-read after new files
    // landed canonicalizes EQUAL and serves the first call's features —
    // call clearFeatureCache() to re-scan a grown directory.
    featsCache.keySet.removeIf(k => k.session.sparkContext.isStopped)
    val feats = featsCache.computeIfAbsent(
      FeatsKey(spark, media.queryExecution.analyzed.canonicalized, dim,
        decoder.getClass.getName),
      _ => extractFeatures(spark, media, dim, decoder)
        .withColumn("nrm", sqrt(expr("graft_dot(features, features)")))
        .filter(col("nrm") > 0))
    // (re-)cache: a host's clearCache() drops blocks but not this memo
    if (feats.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      feats.cache()
    val banded = feats.select(col("media_id"), col("features"), col("nrm"),
      explode(array(
        struct(lit(0).as("band"), (bit(0) + bit(1)).as("bk")),
        struct(lit(1).as("band"), (bit(2) + bit(3)).as("bk")))).as("bb"))
      .select(col("media_id"), col("features"), col("nrm"),
        col("bb.band").as("band"), col("bb.bk").as("bk"))
    val a = banded.select(col("media_id").as("m1"), col("features").as("f1"),
      col("nrm").as("n1"), col("band"), col("bk"))
    val b = banded.select(col("media_id").as("m2"), col("features").as("f2"),
      col("nrm").as("n2"), col("band"), col("bk"))
    a.join(b, Seq("band", "bk"))
      .filter(col("m1") < col("m2"))
      .select(col("m1"), col("m2"),
        round(expr("graft_dot(f1, f2)") / (col("n1") * col("n2")), 4).as("sim"))
      .filter(col("sim") >= threshold)
      .distinct() // a pair can co-bucket in both bands
  }

}
