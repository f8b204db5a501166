package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental ANN index — the production shape of similarity search at
  * 100 TB, composing the repo's storage and ANN layers: the IVF-PQ
  * index PERSISTS on a [[TableSink]] (quantizers + encoded corpus as
  * versioned tables), new vectors encode against the FROZEN quantizers
  * in O(new batch), and search never touches raw vectors — the same
  * maintenance recipe as [[DedupIndex]]/[[SpanIndex]], applied to the
  * vector side.
  *
  * Index tables (on any [[TableSink]]):
  *  - `<prefix>_centroids`: (cell, c_emb, c_nrm) — the coarse quantizer
  *  - `<prefix>_codebooks`: (sub, cell, c_emb, c_nrm) — PQ sub-codebooks
  *  - `<prefix>_vectors`:   (id, cell, codes) — the encoded corpus
  *  - `<prefix>_supers`:    (sc, s_emb, s_nrm) — g ≈ √k super-centroids
  *  - `<prefix>_cellmap`:   (sc, cell, c_emb, c_nrm) — each centroid's
  *    home super-cell (the two-level probe/assign structures, a pure
  *    deterministic function of the centroids, persisted so appends
  *    and searches don't re-train them per call)
  *  - `<prefix>_meta`:      (n, fpsum) — additive corpus fingerprint
  *    rows (content-drift detection for registry readers)
  *
  * [[build]] lands all six in ONE cross-table transaction (a reader
  * can never observe quantizers without their corpus or vice versa);
  * [[append]] is keyed per batch, so a crash-replayed micro-batch
  * encodes exactly once; [[retrain]] re-fits on the current corpus and
  * swaps the index as logged rewrites — time travel below the retrain
  * still resolves the old index. [[cellHealth]] is the retrain trigger
  * readout (cells drifting oversized = quantizer stale).
  *
  * Freezing the quantizers between retrains is what makes increments
  * O(batch): codes are comparable only under ONE codebook generation,
  * exactly how FAISS/SCANN deployments roll their indexes. */
object AnnIndex {

  private def tbl(prefix: String, part: String) = s"${prefix}_$part"

  /** Coarse-cell assignment for ingest: flat (score all k centroids —
    * the oracle-mirrored rule, O(batch·k)) when `superProbes` is None,
    * or two-level via [[Ivf.assignHierarchical]] (O(batch·√k·(1+p)))
    * when Some(p) — the production setting once k scales with the
    * corpus (the k ∝ N cell-size rule makes flat ingest O(N²/target)).
    * Cells only gate candidate generation, so a hierarchical
    * assignment is a recall trade (boundary effect, lever = p), never
    * a correctness one; with p >= g (g = ceil(√k) super-cells) the two
    * are bit-identical. Use ONE mode per index generation — mixing
    * modes across appends still searches correctly but makes cell
    * populations reflect two rules. */
  private def assignCells(spark: SparkSession, vectors: DataFrame,
      coarse: DataFrame, superProbes: Option[Int],
      superStructs: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    // vanilla-session safety: the Some branch's withColumn(graft_dot)
    // analyzes eagerly (Spark 4) before assignHierarchical registers
    graft.GraftExtensions.ensureRegistered(spark)
    superProbes match {
      case None => Pq.assignCells(spark, vectors, coarse)
      case Some(p) =>
        val vecs = vectors.select(col("id").as("vec_id"),
            col("vec").cast("array<double>").as("emb"))
          .withColumn("nrm", sqrt(expr("graft_dot(emb, emb)")))
        Ivf.assignHierarchical(spark, vecs, coarse, p, superStructs)
          .select(col("vec_id").as("id"), col("cell"))
    }
  }

  /** Centroid-set fingerprint (count, crc32 sum over "cell,c_emb") —
    * k rows, trivial to compute; lets [[loadSupers]] detect a
    * cellmap that no longer matches the live centroids. */
  private def coarseFp(df: DataFrame): (Long, Long) = {
    val r = df.agg(count(lit(1)),
      coalesce(sum(crc32(concat_ws(",", col("cell"),
        col("c_emb").cast("string")))), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Persisted super-structures, when the index carries them AND they
    * still describe `coarse`: a crash between retrain's per-table
    * rewrites (or a reader racing one) can leave generation-N
    * centroids next to generation-N-1 supers/cellmap, and both
    * generations number cells 0..k-1 — a stale map would join cleanly
    * and probe cells chosen by the OLD quantizer's geometry, silently.
    * The cellmap carries each centroid's (cell, c_emb), so validating
    * its fingerprint against the live centroids catches any desync;
    * on mismatch (and for indexes built before the table pair
    * existed) callers fall back to re-deriving from the live
    * centroids — bit-identical, just slower, and self-healing. */
  private def loadSupers(spark: SparkSession, sink: TableSink,
      prefix: String, coarse: DataFrame): Option[(DataFrame, DataFrame)] =
    if (sink.exists(spark, tbl(prefix, "supers")) &&
        sink.exists(spark, tbl(prefix, "cellmap"))) {
      val cellmap = sink.read(spark, tbl(prefix, "cellmap"))
      if (coarseFp(cellmap) == coarseFp(coarse))
        Some((sink.read(spark, tbl(prefix, "supers")), cellmap))
      else None
    } else None

  private def loadModel(spark: SparkSession, sink: TableSink,
      prefix: String): (Pq.Model, DataFrame) = {
    val coarse = sink.read(spark, tbl(prefix, "centroids"))
    val books0 = sink.read(spark, tbl(prefix, "codebooks"))
    val m = books0.agg(max("sub")).head.getInt(0) + 1
    val subDim = books0.select(size(col("c_emb"))).head.getInt(0)
    val books = (0 until m).map(i => books0.filter(col("sub") === i)
      .select("cell", "c_emb", "c_nrm"))
    (Pq.Model(m, subDim, books), coarse)
  }

  /** Corpus-fingerprint row for `<prefix>_meta`: (n, fpsum), fpsum =
    * sum of crc32 over the canonical "id,vec-as-double-array-string"
    * form. ADDITIVE — per-append rows sum to the fingerprint of
    * everything ingested — so readers (the registry's annAssigned)
    * can recompute the same aggregate over their corpus and fail
    * loudly on CONTENT drift (same ids, re-embedded vectors), which a
    * count-coverage check cannot see. */
  private[engine] def fingerprintRow(vectors: DataFrame): DataFrame =
    vectors.agg(count(lit(1)).as("n"),
      coalesce(sum(crc32(concat_ws(",", col("id"),
        col("vec").cast("array<double>").cast("string")))), lit(0L))
        .as("fpsum"))

  /** Train quantizers on the seed corpus, encode it, and publish the
    * whole index as ONE cross-table transaction. `vectors` carries
    * (id, vec) with `dim`-wide vectors. */
  def build(spark: SparkSession, sink: TableSink, prefix: String,
      vectors: DataFrame, dim: Int, kCoarse: Int, m: Int, subK: Int,
      iters: Int = 2, superProbes: Option[Int] = None,
      trainCap: Option[Int] = None): Unit = {
    val model = Pq.train(spark, vectors, dim, m, subK, iters)
    val coarse = KMeans.train(spark,
      vectors.select(col("id").as("vec_id"),
          col("vec").cast("array<double>").as("emb"))
        .withColumn("nrm", sqrt(expr("graft_dot(emb, emb)"))),
      kCoarse, iters, trainCap)
    val (supers, cellmap) = Ivf.deriveSupers(spark,
      coarse.select("cell", "c_emb", "c_nrm"))
    val encoded = Pq.encode(spark, vectors, model)
      .join(assignCells(spark, vectors, coarse, superProbes,
        Some((supers, cellmap))), "id")
      .select("id", "cell", "codes")
    val books = model.codebooks.zipWithIndex.map { case (cb, i) =>
      cb.select(lit(i).as("sub"), col("cell"), col("c_emb"), col("c_nrm"))
    }.reduce(_.unionByName(_))
    require(sink.multiAppendOnce(Seq(
      coarse.select("cell", "c_emb", "c_nrm") -> tbl(prefix, "centroids"),
      books -> tbl(prefix, "codebooks"),
      encoded -> tbl(prefix, "vectors"),
      supers -> tbl(prefix, "supers"),
      cellmap -> tbl(prefix, "cellmap"),
      fingerprintRow(vectors) -> tbl(prefix, "meta")),
      txnKey = s"$prefix-build"), s"index '$prefix' already built")
  }

  /** Encode a NEW batch against the persisted (frozen) quantizers and
    * append it — O(batch) work, keyed for exactly-once replay. Returns
    * false when `batchKey` already landed (the replay no-op). */
  def append(spark: SparkSession, sink: TableSink, prefix: String,
      newVectors: DataFrame, batchKey: String,
      superProbes: Option[Int] = None): Boolean = {
    val (model, coarse) = loadModel(spark, sink, prefix)
    val encoded = Pq.encode(spark, newVectors, model)
      .join(assignCells(spark, newVectors, coarse, superProbes,
        superProbes.flatMap(_ => loadSupers(spark, sink, prefix, coarse))),
        "id")
      .select("id", "cell", "codes")
    val landed = sink.appendOnce(encoded, tbl(prefix, "vectors"),
      s"$prefix-append-$batchKey")
    // ALWAYS attempt the meta append, even on a keyed vectors replay:
    // a crash between the two table writes must heal on replay (each
    // table's keyed append fills in independently — the SpanIndex
    // two-table recipe)
    sink.appendOnce(fingerprintRow(newVectors), tbl(prefix, "meta"),
      s"$prefix-append-$batchKey:meta")
    landed
  }

  /** Continuous ingestion: stream vector files (JSON lines with
    * id/vec) and [[append]] every micro-batch against the frozen
    * quantizers. The key is CONTENT-derived, not batchId (the
    * DedupIndex chaos-test recipe): after checkpoint loss a re-formed
    * batch may merge committed files with new ones — a content key
    * makes an identical replay a no-op while any re-batched superset
    * proceeds, keeping ingestion exactly-once under ANY re-batching.
    * One file per trigger keeps batch composition deterministic. */
  def streamAppend(spark: SparkSession, vecsDir: String, sink: TableSink,
      prefix: String, dim: Int, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      superProbes: Option[Int] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("vec",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType), nullable = false)))
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .json(vecsDir)
      .writeStream
      .queryName(s"graft-ann-ingest-$prefix")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sig = batch.agg(count(lit(1)),
          sum(crc32(concat_ws("", col("id"),
            col("vec").cast("string"))))).head()
        if (sig.getLong(0) > 0) {
          append(batch.sparkSession, sink, prefix, batch,
            batchKey = s"${sig.getLong(0)}-${sig.getLong(1)}",
            superProbes = superProbes)
          ()
        }
      }
      .start()
  }

  /** IVF-PQ search over the PERSISTED index: probe `probes` coarse
    * cells per query, ADC-score their members from codes.
    * `superProbes = Some(p)` routes the probe stage through two-level
    * cell selection (O(√k) per query instead of O(k) — the large-k
    * production setting, same flag semantics as ingest). */
  def search(spark: SparkSession, sink: TableSink, prefix: String,
      queries: DataFrame, probes: Int, k: Int,
      superProbes: Option[Int] = None): DataFrame = {
    val (model, coarse) = loadModel(spark, sink, prefix)
    Pq.searchIvf(spark, sink.read(spark, tbl(prefix, "vectors")),
      coarse, model, queries, probes, k, superProbes,
      superProbes.flatMap(_ => loadSupers(spark, sink, prefix, coarse)))
  }

  /** Per-cell population (cell, n_vectors) plus the skew readout the
    * retrain decision watches: a cell drifting far above the mean means
    * the frozen quantizer no longer fits the data distribution. */
  def cellHealth(spark: SparkSession, sink: TableSink,
      prefix: String): DataFrame =
    sink.read(spark, tbl(prefix, "vectors"))
      .groupBy("cell").agg(count(lit(1)).as("n_vectors"))
      .orderBy("cell")

  /** Re-fit quantizers on the CURRENT corpus vectors and swap the index
    * — each table a logged rewrite, so readers atomically move
    * generations and time travel below the retrain resolves the old
    * index. `vectors` must be the full current corpus (the caller owns
    * the raw vectors; the index stores only codes). */
  def retrain(spark: SparkSession, sink: TableSink, prefix: String,
      vectors: DataFrame, dim: Int, kCoarse: Int, m: Int, subK: Int,
      iters: Int = 2, superProbes: Option[Int] = None,
      trainCap: Option[Int] = None): Unit = {
    val model = Pq.train(spark, vectors, dim, m, subK, iters)
    val coarse = KMeans.train(spark,
      vectors.select(col("id").as("vec_id"),
          col("vec").cast("array<double>").as("emb"))
        .withColumn("nrm", sqrt(expr("graft_dot(emb, emb)"))),
      kCoarse, iters, trainCap)
    val (supers, cellmap) = Ivf.deriveSupers(spark,
      coarse.select("cell", "c_emb", "c_nrm"))
    val encoded = Pq.encode(spark, vectors, model)
      .join(assignCells(spark, vectors, coarse, superProbes,
        Some((supers, cellmap))), "id")
      .select("id", "cell", "codes")
    val books = model.codebooks.zipWithIndex.map { case (cb, i) =>
      cb.select(lit(i).as("sub"), col("cell"), col("c_emb"), col("c_nrm"))
    }.reduce(_.unionByName(_))
    sink.overwrite(coarse.select("cell", "c_emb", "c_nrm"),
      tbl(prefix, "centroids"))
    sink.overwrite(books, tbl(prefix, "codebooks"))
    sink.overwrite(encoded, tbl(prefix, "vectors"))
    sink.overwrite(supers, tbl(prefix, "supers"))
    sink.overwrite(cellmap, tbl(prefix, "cellmap"))
    sink.overwrite(fingerprintRow(vectors), tbl(prefix, "meta"))
  }
}
