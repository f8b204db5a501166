package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-probe IVF search — the recall lever of inverted-file ANN.
  *
  * Probe-1 recall is capped by the DATA, not the quantizer: on an
  * isotropic corpus (like the synthetic embeddings table — measured
  * within/cross-label cosine both ~0) even a fully converged k-means
  * gives ~0.32 recall@5 with k=10 cells, because a query's true
  * neighbors straddle cell boundaries. Probing the P nearest cells
  * recovers recall (measured on sf0.1: P=1 -> 0.32, P=3 -> 0.64,
  * P=5 -> 0.84) while still scanning only P/k of the corpus — the same
  * trade every production IVF index (FAISS nprobe) exposes.
  *
  * Scale shape: the probe list is a broadcast join against the k-row
  * centroid table; candidate scan joins on `cell`, i.e. stays
  * co-partitioned with an `assigned` table partitioned by cell; top-k
  * per query is a WindowGroupLimit, never a global sort.
  */
object Ivf {

  /** Search `assigned` (vec_id, emb, nrm, cell) for the top-`k`
    * cosine neighbors of each query row (rows matching `queryPred`),
    * probing each query's `probes` nearest cells by centroid cosine.
    * `cents` is the trained (cell, c_emb, c_nrm) table.
    *
    * `broadcastQueries` (default true) force-broadcasts the probe list —
    * queries x probes rows INCLUDING their embedding arrays — which is
    * the right shape for the usual ANN request batch (hundreds to tens
    * of thousands of queries). For a corpus-scale query set (e.g.
    * all-pairs self-search) set it false: the probe join then shuffles
    * on `cell`, co-partitioned with a cell-partitioned corpus, instead
    * of blowing the broadcast ceiling. */
  def search(spark: SparkSession, assigned: DataFrame, cents: DataFrame,
      queryPred: Column, probes: Int, k: Int,
      broadcastQueries: Boolean = true): DataFrame = {
    graft.GraftExtensions.ensureRegistered(spark)
    val queries = assigned.filter(queryPred)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
        col("nrm").as("q_nrm"))
    val wProbe = Window.partitionBy("q_id").orderBy(desc("csim"), asc("cell"))
    val qCells = queries.join(broadcast(cents))
      .withColumn("csim",
        round(expr("graft_dot(q_emb, c_emb)") / (col("q_nrm") * col("c_nrm")), 4))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= probes)
      .select("q_id", "q_emb", "q_nrm", "cell")
    val wTop = Window.partitionBy("q_id").orderBy(desc("sim"), asc("vec_id"))
    val probeSide = if (broadcastQueries) broadcast(qCells) else qCells
    assigned.join(probeSide, Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim",
        round(expr("graft_dot(q_emb, emb)") / (col("q_nrm") * col("nrm")), 4))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= k)
      .select("q_id", "vec_id", "sim")
  }

  /** Two-level cell assignment — the fix for large-k assignment cost.
    *
    * Flat assignment scores every vector against all k centroids: an
    * O(N·k) pass that dominates once k scales with the corpus (the
    * cell-bounded rule k = N/target makes it O(N²/target) — measured
    * as the 100x-probe wall in scale_probe_param_100x.json). Here the
    * k centroids are themselves clustered into g ≈ ceil(√k)
    * super-centroids (k-means ON THE CENTROIDS — k rows, driver-scale)
    * and each vector scores g supers plus only the member centroids of
    * its `superProbes` nearest super-cells: O(N·√k·(1+superProbes)),
    * the standard two-level IVF shape (IMI/IVF-HNSW family).
    *
    * The assignment is APPROXIMATE: a vector whose true nearest
    * centroid lives outside its probed super-cells is assigned to the
    * best centroid it saw (boundary effect, recall lever =
    * `superProbes`; with superProbes >= g the result is bit-identical
    * to flat assignment — property-tested). Fine for the engine ANN /
    * dedup-blocking paths where cells only gate candidate generation;
    * NOT used by the oracle-mirrored registry queries, whose DuckDB
    * mirror pins flat assignment.
    *
    * Determinism: same rounded-cosine + cell-asc tie-break tree as
    * flat assignment at every level; KMeans is deterministic.
    * Input `vecs`: (vec_id, emb, nrm); `cents`: (cell, c_emb, c_nrm).
    * Returns (vec_id, emb, nrm, cell). */
  def assignHierarchical(spark: SparkSession, vecs: DataFrame,
      cents: DataFrame, superProbes: Int = 2,
      superStructs: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    // probes <= 0 would filter EVERY probe row and silently assign
    // nothing — the silent-row-loss class this method is hardened
    // against; fail at the misconfiguration instead
    require(superProbes >= 1, s"superProbes must be >= 1, got $superProbes")
    graft.GraftExtensions.ensureRegistered(spark)
    // `superStructs` short-circuits the super-quantizer derivation:
    // (supers, centSc) are a pure deterministic function of `cents`,
    // so a persisted copy (AnnIndex stores them at build time) is
    // bit-identical to recomputing — and recomputing trains a k-means
    // on every call, which dominates small-batch assignment cost
    val (supers, centSc) = superStructs.getOrElse(
      deriveSupers(spark, cents))
    // Probe only super-cells that WON at least one centroid: KMeans
    // keeps a stale centroid for an empty cell, so a super-cell can
    // have zero members (clustered/duplicate centroids trigger it) —
    // and a vector whose every probed super-cell were member-less
    // would lose all rows in the member join and silently vanish.
    // Restricting the probe list to live super-cells makes coverage
    // structural: every probed super-cell yields >= 1 candidate, and
    // at least one live super-cell always exists because every
    // centroid is assigned to exactly one. (A vector ranking an empty
    // super-cell above a live one now probes the next LIVE one
    // instead — strictly more candidates, i.e. closer to flat.)
    val liveSupers = supers.join(
      centSc.select("sc").distinct(), Seq("sc"))
    // vectors: top `superProbes` super-cells, then only their members
    val wv = Window.partitionBy("vec_id").orderBy(desc("ssim"), asc("sc"))
    val vecSc = vecs.crossJoin(broadcast(liveSupers))
      .withColumn("ssim", round(expr("graft_dot(emb, s_emb)") /
        (col("nrm") * col("s_nrm")), 4))
      .withColumn("rn", row_number().over(wv))
      .filter(col("rn") <= superProbes)
      .select(col("vec_id"), col("emb"), col("nrm"), col("sc"))
    val wa = Window.partitionBy("vec_id").orderBy(desc("csim"), asc("cell"))
    vecSc.join(broadcast(centSc), Seq("sc"))
      .withColumn("csim", round(expr("graft_dot(emb, c_emb)") /
        (col("nrm") * col("c_nrm")), 4))
      .withColumn("rn", row_number().over(wa))
      .filter(col("rn") === 1)
      .select("vec_id", "emb", "nrm", "cell")
  }

  /** [[superMembership]] with the canonical g-derivation rule
    * (g = ceil(√k) super-cells over the k centroids) — THE single
    * definition every fallback and the persisted-table writer share,
    * so a persisted copy is always bit-identical to re-deriving. */
  private[graft] def deriveSupers(spark: SparkSession,
      cents: DataFrame): (DataFrame, DataFrame) = {
    // vanilla-session safety: superMembership's withColumn(graft_dot)
    // analyzes eagerly and this entry point can be the first one hit
    graft.GraftExtensions.ensureRegistered(spark)
    val k = cents.count().toInt
    val g = math.max(1, math.ceil(math.sqrt(k.toDouble)).toInt)
    superMembership(spark, cents.select("cell", "c_emb", "c_nrm"), g)
  }

  /** The super-level structures of [[assignHierarchical]]: `g`
    * super-centroids trained ON the k centroids (k rows — driver
    * scale) and each centroid's home super-cell. Exposed private[graft]
    * so the spec can assert the empty-super-cell case (a super-cell
    * that wins no centroid) is both reachable and harmless.
    * Returns (supers(sc, s_emb, s_nrm), centSc(sc, cell, c_emb, c_nrm)). */
  private[graft] def superMembership(spark: SparkSession,
      cents: DataFrame, g: Int): (DataFrame, DataFrame) = {
    val centVecs = cents.select(col("cell").as("vec_id"),
      col("c_emb").as("emb"), col("c_nrm").as("nrm"))
    val supers = KMeans.train(spark, centVecs, g, iters = 2)
      .select(col("cell").as("sc"), col("c_emb").as("s_emb"),
        col("c_nrm").as("s_nrm"))
    // each centroid's home super-cell (k x g rows — tiny)
    val wc = Window.partitionBy("cell").orderBy(desc("ssim"), asc("sc"))
    val centSc = cents.crossJoin(broadcast(supers))
      .withColumn("ssim", round(expr("graft_dot(c_emb, s_emb)") /
        (col("c_nrm") * col("s_nrm")), 4))
      .withColumn("rn", row_number().over(wc))
      .filter(col("rn") === 1)
      .select("sc", "cell", "c_emb", "c_nrm")
    (supers, centSc)
  }
}
