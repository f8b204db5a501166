package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al. 2023, public): semantic deduplication by
  * clustering embeddings and removing, within each cluster, every member
  * of a cosine-≥-τ pair that sits FARTHER from the cluster centroid
  * (tie -> higher id removed) — keeping the most prototypical
  * representative of each semantic-duplicate group.
  *
  * This is the PARAMETERIZED scale path behind the fixed-k oracle query
  * `q_semdedup` (queries/CurationQueries.scala): the pair join is
  * blocked on the trained cell key, so its cost is N²/k — bounded only
  * if k grows with the corpus. Production SemDeDup picks k so the
  * expected cluster SIZE stays constant (the paper uses 50k clusters
  * for a 440M-image corpus ≈ 9k per cluster); [[semdedup]] does the
  * same: k = ceil(N / targetCellSize), re-derived from the input each
  * run, so per-cell membership — and with it the quadratic term — stays
  * bounded at ANY corpus size. The oracle query can't do this (its
  * DuckDB mirror needs a corpus-independent literal k), which is why the
  * scale story lives here and the correctness story lives there.
  *
  * Deterministic end to end: KMeans.train is hash-seeded and
  * decimal-exact, assignment ties break to the lowest cell, removal
  * ties to the higher vec_id.
  */
object SemDedup {

  /** Per-vector verdicts: (id, cell, removed). Input must carry an
    * `id` column (long) and a `vec` column (array<double>). */
  def verdicts(spark: SparkSession, vectors: DataFrame,
      targetCellSize: Int, tau: Double, iters: Int = 2): DataFrame = {
    graft.GraftExtensions.ensureRegistered(spark)
    val n = vectors.count()
    val k = math.max(1, math.ceil(n.toDouble / targetCellSize).toInt)
    val e = vectors
      .select(col("id").as("vec_id"), col("vec").cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(expr("graft_dot(emb, emb)")))
    val cents = KMeans.train(spark, e, k, iters)
      .select(col("cell"), col("c_emb"), col("c_nrm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy(desc("csim"), asc("cell"))
    val assigned = e.join(broadcast(cents))
      .withColumn("csim",
        round(expr("graft_dot(emb, c_emb)") / (col("nrm") * col("c_nrm")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("emb"), col("nrm"), col("cell"), col("csim"))
    val l = assigned.select(col("cell"), col("vec_id").as("d1"),
      col("emb").as("e1"), col("nrm").as("n1"), col("csim").as("c1"))
    val r = assigned.select(col("cell"), col("vec_id").as("d2"),
      col("emb").as("e2"), col("nrm").as("n2"), col("csim").as("c2"))
    val removed = l.join(r, Seq("cell"))
      .filter(col("d1") < col("d2"))
      .filter(round(expr("graft_dot(e1, e2)") / (col("n1") * col("n2")), 4) >= tau)
      .select(col("cell"),
        when(col("c1") < col("c2"), col("d1"))
          .when(col("c1") > col("c2"), col("d2"))
          .otherwise(greatest(col("d1"), col("d2"))).as("id"))
      .distinct()
    assigned.select(col("vec_id").as("id"), col("cell"))
      .join(removed.select(col("id"), lit(true).as("removed")),
        Seq("id"), "left")
      .withColumn("removed", coalesce(col("removed"), lit(false)))
  }

  /** The kept (deduplicated) rows of `vectors`. */
  def dedup(spark: SparkSession, vectors: DataFrame,
      targetCellSize: Int, tau: Double): DataFrame =
    vectors.join(
      verdicts(spark, vectors, targetCellSize, tau)
        .filter(!col("removed")).select("id"),
      Seq("id"), "left_semi")
}
