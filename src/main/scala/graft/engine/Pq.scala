package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, public) — the compression
  * layer of IVF-PQ, the architecture production ANN runs at 100 TB: a
  * vector becomes `m` small codes (one per subspace), so the index holds
  * m bytes per vector instead of dim floats, and search scores
  * candidates from per-query lookup tables (asymmetric distance
  * computation) in O(m) per candidate.
  *
  * This is the PARAMETERIZED scale path behind the fixed-geometry oracle
  * queries `q_pq_encode`/`q_pq_ann`/`q_pq_recall`
  * (queries/PqQueries.scala, M=2/SubK=8 literals the DuckDB mirror
  * needs): arbitrary subspace count and codebook size — production PQ
  * sizes SubK=256 (byte codes) and scales FIDELITY by adding subspaces,
  * both corpus-independent constants, so training cost is
  * O(N·SubK·dim) per sweep and no term is quadratic in the corpus.
  *
  * Deterministic end to end (the [[KMeans]] guarantees): hash-seeded
  * init, decimal-exact updates, rounded-cosine assignment with cell-id
  * tie-breaks — codes are partition-count-invariant, asserted in
  * PqSpec.
  */
object Pq {

  /** A trained model: per-subspace codebooks (cell, c_emb, c_nrm),
    * subspace width, and the source dimension. */
  final case class Model(m: Int, subDim: Int, codebooks: Seq[DataFrame])

  private def halfAt(vectors: DataFrame, lo: Int, subDim: Int): DataFrame =
    vectors.select(col("id").as("vec_id"),
        slice(col("vec").cast("array<double>"), lo, subDim).as("emb"))
      .withColumn("nrm", sqrt(expr("graft_dot(emb, emb)")))

  /** Train `m` sub-quantizers of `subK` codewords each over `vectors`
    * (columns `id`, `vec: array` of width `dim`, which must divide
    * evenly into m). */
  def train(spark: SparkSession, vectors: DataFrame, dim: Int, m: Int,
      subK: Int, iters: Int = 2): Model = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must split into m=$m subspaces")
    graft.GraftExtensions.ensureRegistered(spark)
    val subDim = dim / m
    val books = (0 until m).map { i =>
      KMeans.train(spark, halfAt(vectors, i * subDim + 1, subDim), subK, iters)
    }
    Model(m, subDim, books)
  }

  /** Encode every vector as its m nearest-codeword ids:
    * (id, codes: array<int>). Each subspace is one broadcast-codebook
    * assignment pass (the q_ivf_assign rule: rounded cosine desc, cell
    * asc tie-break); the m per-subspace results join back on id. */
  def encode(spark: SparkSession, vectors: DataFrame,
      model: Model): DataFrame = {
    // vanilla-session safety: withColumn analyzes EAGERLY (Spark 4),
    // so halfAt's graft_dot must be resolvable before any sibling
    // entry point has had a chance to register it
    graft.GraftExtensions.ensureRegistered(spark)
    val parts = (0 until model.m).map { i =>
      val h = halfAt(vectors, i * model.subDim + 1, model.subDim)
      val w = Window.partitionBy("vec_id").orderBy(desc("sim"), asc("cell"))
      h.join(broadcast(model.codebooks(i)))
        .withColumn("sim",
          round(expr("graft_dot(emb, c_emb)") / (col("nrm") * col("c_nrm")), 4))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id").as("id"), col("cell").as(s"code$i"))
    }
    parts.reduce(_.join(_, "id"))
      .select(col("id"),
        array((0 until model.m).map(i => col(s"code$i")): _*).as("codes"))
  }

  /** Coarse-cell assignment over FULL vectors (the IVF half of IVF-PQ):
    * (id, cell) by the q_ivf_assign rule — rounded cosine to the
    * broadcast centroid table, cell-id tie-break. `coarse` is a
    * [[KMeans.train]] result over the full-width vectors. */
  def assignCells(spark: SparkSession, vectors: DataFrame,
      coarse: DataFrame): DataFrame = {
    graft.GraftExtensions.ensureRegistered(spark)
    val e = vectors.select(col("id").as("vec_id"),
        col("vec").cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(expr("graft_dot(emb, emb)")))
    val w = Window.partitionBy("vec_id").orderBy(desc("sim"), asc("cell"))
    e.join(broadcast(coarse))
      .withColumn("sim",
        round(expr("graft_dot(emb, c_emb)") / (col("nrm") * col("c_nrm")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id").as("id"), col("cell"))
  }

  /** IVF-PQ search (the FAISS `IndexIVFPQ` shape — the architecture a
    * 100 TB ANN deployment actually runs): probe each query's `probes`
    * nearest coarse cells, then ADC-score ONLY the candidates in those
    * cells from their codes. Cost per query = probes/k_coarse of the
    * corpus × O(m) lookups — both levers corpus-independent. `encoded`
    * must carry (id, codes, cell) — [[encode]] joined with
    * [[assignCells]]. */
  def searchIvf(spark: SparkSession, encoded: DataFrame,
      coarse: DataFrame, model: Model, queries: DataFrame,
      probes: Int, k: Int, superProbes: Option[Int] = None,
      superStructs: Option[(DataFrame, DataFrame)] = None): DataFrame = {
    graft.GraftExtensions.ensureRegistered(spark)
    val q = queries.select(col("id").as("q_id"),
        col("vec").cast("array<double>").as("q_vec"))
      .withColumn("qn", sqrt(expr("graft_dot(q_vec, q_vec)")))
    val wProbe = Window.partitionBy("q_id").orderBy(desc("csim"), asc("cell"))
    // Probe-list stage. Flat (None) scores every query against all k
    // coarse cells — O(Q·k), fine for request batches but the last
    // O(·k) surface once BOTH the corpus and k grow. Some(p) goes
    // two-level, the [[Ivf.assignHierarchical]] shape on the query
    // side: score g ≈ √k super-cells, then only the member cells of
    // the p nearest — O(Q·√k·(1+p)). Approximate (the probed cell
    // list is drawn from p super-cells; recall lever = p); with p
    // covering every live super-cell the probe list is bit-identical
    // to flat, property-tested in AnnIndexSpec.
    val probed = superProbes match {
      case None =>
        q.join(broadcast(coarse))
          .withColumn("csim",
            round(expr("graft_dot(q_vec, c_emb)") /
              (col("qn") * col("c_nrm")), 4))
          .withColumn("pr", row_number().over(wProbe))
          .filter(col("pr") <= probes)
          .select(col("q_id").as("pq_id"), col("cell"))
      case Some(p) =>
        require(p >= 1, s"superProbes must be >= 1, got $p")
        // persisted super-structures (AnnIndex stores them at build
        // time) skip the per-search super-quantizer derivation — a
        // deterministic function of `coarse`, so bit-identical either way
        val (supers, centSc) = superStructs.getOrElse(
          Ivf.deriveSupers(spark, coarse))
        val live = supers.join(centSc.select("sc").distinct(), Seq("sc"))
        val wS = Window.partitionBy("q_id").orderBy(desc("ssim"), asc("sc"))
        val qSc = q.crossJoin(broadcast(live))
          .withColumn("ssim", round(expr("graft_dot(q_vec, s_emb)") /
            (col("qn") * col("s_nrm")), 4))
          .withColumn("rn", row_number().over(wS))
          .filter(col("rn") <= p)
          .select("q_id", "q_vec", "qn", "sc")
        qSc.join(broadcast(centSc), Seq("sc"))
          .withColumn("csim", round(expr("graft_dot(q_vec, c_emb)") /
            (col("qn") * col("c_nrm")), 4))
          .withColumn("pr", row_number().over(wProbe))
          .filter(col("pr") <= probes)
          .select(col("q_id").as("pq_id"), col("cell"))
    }
    val scoped = encoded.join(broadcast(probed), Seq("cell"))
      .select(col("id"), col("codes"), col("pq_id"))
    // ADC over the scoped candidates: reuse [[search]]'s LUT machinery
    // by scoring only rows whose probe-query matches the LUT's query
    val luts = (0 until model.m).map { i =>
      q.withColumn("qh", slice(col("q_vec"), i * model.subDim + 1, model.subDim))
        .crossJoin(model.codebooks(i))
        .withColumn(s"dp$i", expr("graft_dot(qh, c_emb)"))
        .select(col("q_id").as(s"q$i"), col("qn").as(s"qn$i"),
          col("cell").as(s"c$i"), col(s"dp$i"), col("c_nrm").as(s"cn$i"))
    }
    val base = scoped.select(col("id") +: col("pq_id") +:
      (0 until model.m).map(i =>
        element_at(col("codes"), i + 1).as(s"code$i")): _*)
    val joined = (0 until model.m).foldLeft(base) { (acc, i) =>
      acc.join(broadcast(luts(i)),
        col(s"code$i") === col(s"c$i") && col("pq_id") === col(s"q$i"))
    }
    val num = (0 until model.m).map(i => col(s"dp$i")).reduce(_ + _)
    val den = col("qn0") * sqrt(
      (0 until model.m).map(i => col(s"cn$i") * col(s"cn$i")).reduce(_ + _))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), asc("id"))
    joined
      .withColumn("q_id", col("pq_id"))
      .filter(col("id") =!= col("q_id"))
      .withColumn("sim", round(num / den, 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("q_id", "id", "sim")
  }

  /** ADC top-`k` neighbors of each query row over a PQ-`encoded` corpus
    * (id, codes): per query and subspace, a subK-row lookup table of
    * query-half-to-codeword dots; candidates join the tables ON THEIR
    * CODE — O(m) lookups per candidate, raw corpus vectors never read
    * at search time. Scores are cosine(query, reconstruction):
    * Σdpᵢ / (qn · sqrt(Σcnᵢ²)), the same tree as q_pq_ann. */
  def search(spark: SparkSession, encoded: DataFrame, model: Model,
      queries: DataFrame, k: Int): DataFrame = {
    graft.GraftExtensions.ensureRegistered(spark)
    val q = queries.select(col("id").as("q_id"),
        col("vec").cast("array<double>").as("q_vec"))
      .withColumn("qn", sqrt(expr("graft_dot(q_vec, q_vec)")))
    val luts = (0 until model.m).map { i =>
      q.withColumn("qh", slice(col("q_vec"), i * model.subDim + 1, model.subDim))
        .crossJoin(model.codebooks(i))
        .withColumn(s"dp$i", expr("graft_dot(qh, c_emb)"))
        .select(col("q_id").as(s"q$i"), col("qn").as(s"qn$i"),
          col("cell").as(s"c$i"), col(s"dp$i"), col("c_nrm").as(s"cn$i"))
    }
    val base = encoded.select(col("id") +: (0 until model.m).map(i =>
      element_at(col("codes"), i + 1).as(s"code$i")): _*)
    val joined = (0 until model.m).foldLeft(base) { (acc, i) =>
      val cond = if (i == 0) col("code0") === col("c0")
        else col(s"code$i") === col(s"c$i") && col("q0") === col(s"q$i")
      acc.join(broadcast(luts(i)), cond)
    }
    val num = (0 until model.m).map(i => col(s"dp$i")).reduce(_ + _)
    val den = col("qn0") * sqrt(
      (0 until model.m).map(i => col(s"cn$i") * col(s"cn$i")).reduce(_ + _))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), asc("id"))
    joined
      .withColumn("q_id", col("q0"))
      .filter(col("id") =!= col("q_id"))
      .withColumn("sim", round(num / den, 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("q_id", "id", "sim")
  }
}
