package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-space contamination detection — the PARAMETERIZED scale
  * path behind the fixed-k oracle query `q_embed_contam`
  * (queries/AuditQueries.scala), exactly the SemDedup split: the
  * oracle's DuckDB mirror needs a corpus-independent literal k, so a
  * fixed-k probe run inflates the within-cell pair term as the corpus
  * grows; THIS path re-derives k = ceil(nTrain / targetCellSize) from
  * the input each run, keeping per-cell membership — and the
  * eval × train pair term — bounded at ANY corpus size (the SemDeDup
  * scaling argument; cell-boundedness asserted in ContaminationSpec).
  *
  * Centroids train on the TRAIN side only (the eval set must not
  * steer the quantizer — at benchmark-hygiene time the eval set is
  * small and fixed while train grows); both sides assign to the same
  * trained cells, candidates pair within a cell, and an eval vector
  * with any train neighbor at cosine ≥ τ is contaminated. The k-row
  * centroid table broadcasts; the pair join keys on the cell.
  * Deterministic end to end (hash-seeded KMeans, lowest-cell
  * assignment ties, rounded cosines). */
object Contamination {

  /** Per-eval-vector verdicts: (id, cell, contaminated, n_hits,
    * max_sim — null when clean). Inputs carry `id` (long) and `vec`
    * (array<double>). */
  def verdicts(spark: SparkSession, train: DataFrame, eval: DataFrame,
      targetCellSize: Int, tau: Double, iters: Int = 2): DataFrame = {
    graft.GraftExtensions.ensureRegistered(spark)
    val nTrain = train.count()
    val k = math.max(1, math.ceil(nTrain.toDouble / targetCellSize).toInt)
    def norm(df: DataFrame): DataFrame = df
      .select(col("id").as("vec_id"),
        col("vec").cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(expr("graft_dot(emb, emb)")))
    val tr = norm(train)
    val cents = KMeans.train(spark, tr, k, iters)
      .select(col("cell"), col("c_emb"), col("c_nrm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(desc("csim"), asc("cell"))
    def assign(df: DataFrame): DataFrame = df
      .join(broadcast(cents))
      .withColumn("csim",
        round(expr("graft_dot(emb, c_emb)") / (col("nrm") * col("c_nrm")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("emb"), col("nrm"), col("cell"))
    val ta = assign(tr)
      .select(col("cell"), col("emb").as("te"), col("nrm").as("tn"))
    val ea = assign(norm(eval))
      .select(col("vec_id"), col("cell"),
        col("emb").as("qe"), col("nrm").as("qn"))
    val hits = ea.join(ta, Seq("cell"))
      .withColumn("sim",
        round(expr("graft_dot(qe, te)") / (col("qn") * col("tn")), 4))
      .filter(col("sim") >= tau)
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_hits"), max("sim").as("max_sim"))
    ea.select(col("vec_id").as("id"), col("cell"))
      .join(hits.withColumnRenamed("vec_id", "id"), Seq("id"), "left")
      .withColumn("contaminated", col("n_hits").isNotNull)
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
  }

  /** The clean (uncontaminated) rows of `eval`. */
  def clean(spark: SparkSession, train: DataFrame, eval: DataFrame,
      targetCellSize: Int, tau: Double): DataFrame =
    eval.join(
      verdicts(spark, train, eval, targetCellSize, tau)
        .filter(!col("contaminated")).select("id"),
      Seq("id"), "left_semi")
}
