package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic distributed k-means for IVF coarse quantization
  * (reference capability: inverted-file ANN cell assignment; see
  * SURVEY.md §2.8 N14/N15).
  *
  * Every step is engineered to be bit-reproducible ACROSS ENGINES (the
  * DuckDB oracle unrolls the identical algorithm in SQL) and across
  * cluster topologies — the property a correctness-gated 100 TB pipeline
  * needs from its quantizer:
  *
  *  - init: the k vectors with the smallest `md5(vec_id)` — hash-ordered,
  *    so no dependence on row order; planned as TakeOrderedAndProject
  *    (top-k, never a global sort);
  *  - assignment: rounded cosine (round 4, the repo's irrational-mantissa
  *    convention) with `cell` as tie-break — same rule as q_ivf_assign;
  *  - update: per-coordinate mean through DECIMAL(18,6) sums of
  *    floor-rounded coordinates — exact, ORDER-INDEPENDENT arithmetic
  *    (double summation order varies with partitioning; decimal doesn't),
  *    then the mean itself floor-rounded back to 6 decimals
  *    (floor(x*1e6+0.5)/1e6 — bit-identical IEEE ops in both engines);
  *  - empty cells keep their previous centroid (COALESCE on a left join),
  *    identically on both engines;
  *  - fixed iteration count — no data-dependent convergence test.
  *
  * Scale shape: assignment is a broadcast join (k centroids) + one
  * per-vector window over k candidates; the update is one shuffle keyed
  * (cell, coordinate) with map-side partial decimal sums. Nothing ever
  * collects the corpus; the k x dim centroid table is the only small
  * artifact, and it stays distributed until callers broadcast it.
  */
object KMeans {

  /** Train k centroids over `vecs` (columns `vec_id`, `emb: array<double>`,
    * `nrm`). Returns (cell, c_emb, c_nrm) with cells 0..k-1 numbered in
    * init-hash order.
    *
    * `trainCap`: train on the `cap` vectors with the smallest
    * `md5(vec_id)` instead of the full corpus — the standard quantizer
    * practice (FAISS trains nlist centroids on a bounded sample) that
    * turns the per-iteration O(N·k) assignment into O(cap·k), the term
    * that dominates large-k training (measured: k=1000 over 200k
    * vectors spends minutes per iteration in the assignment window).
    * The hash-top-cap sample is DETERMINISTIC and order-independent
    * (the same rule as the init pick, which is automatically a subset
    * of it), so capped training is still bit-reproducible — it is just
    * a DIFFERENT quantizer than full-corpus training, which is why the
    * oracle-mirrored default (cap = None) trains on everything.
    * Callers assign the full corpus against the returned centroids as
    * before; only the update loop sees the sample. */
  def train(spark: SparkSession, vecs: DataFrame, k: Int, iters: Int,
      trainCap: Option[Int] = None): DataFrame = {
    graft.GraftExtensions.ensureRegistered(spark)
    require(trainCap.forall(_ >= k),
      s"trainCap must be >= k (need $k init vectors)")
    // The capped sample is CACHED: the update loop references trainSet
    // once per iteration, and uncached each iteration would re-run the
    // full-corpus hash top-cap (an O(N log cap) pass) — eroding the
    // O(cap·k)/iter win the cap exists to buy. cap is bounded (caller
    // chooses it), so the cached block set is too; unpersisted before
    // return. The uncapped path stays uncached — callers own `vecs`.
    val trainSet = trainCap match {
      case Some(cap) =>
        vecs.select(md5(col("vec_id").cast("string")).as("__hk"),
            col("vec_id"), col("emb"), col("nrm"))
          .orderBy("__hk").limit(cap)
          .drop("__hk")
          .cache()
      case None => vecs
    }
    val hashed = trainSet.select(md5(col("vec_id").cast("string")).as("hk"),
      col("emb"))
    // top-k by hash (TakeOrderedAndProject); the row_number window then
    // runs over k rows only — never the corpus
    val init = hashed.orderBy("hk").limit(k)
      .withColumn("cell", row_number().over(Window.orderBy("hk")) - 1)
      .select(col("cell"), col("emb").as("c_emb"))

    // Materialize the k-row centroid table each round (k x dim doubles —
    // bytes, not data): without this the logical plan REFERENCES the
    // previous round's centroids twice (assignment + empty-cell
    // fallback), doubling plan size every iteration — exponential
    // analysis/execution cost by iters=5. Driver-resident centroids are
    // the idiomatic Spark shape for k-means (MLlib's KMeans does the
    // same); the corpus itself never leaves the executors.
    def materialize(df: DataFrame): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(df.orderBy("cell").collect(): _*),
        df.schema)

    var cents = materialize(init)
    for (_ <- 0 until iters) {
      val withNrm = cents.withColumn("c_nrm",
        sqrt(expr("graft_dot(c_emb, c_emb)")))
      val wAssign = Window.partitionBy("vec_id").orderBy(desc("sim"), asc("cell"))
      val assigned = trainSet.join(broadcast(withNrm))
        .withColumn("sim",
          round(expr("graft_dot(emb, c_emb)") / (col("nrm") * col("c_nrm")), 4))
        .withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
        .select(col("cell"), col("emb"))
      // order-independent per-coordinate mean: decimal-exact sum of
      // 6-decimal floor-rounded coordinates, mean re-rounded the same way
      val means = assigned
        .select(col("cell"), posexplode(col("emb")).as(Seq("j", "v")))
        .groupBy("cell", "j")
        .agg((sum((floor(col("v") * 1000000 + 0.5) / 1000000)
          .cast("decimal(18,6)")).cast("double") / count(lit(1))).as("m"))
        .groupBy("cell")
        .agg(array_sort(collect_list(struct(col("j"),
          (floor(col("m") * 1000000 + 0.5) / 1000000).as("mr")))).as("p"))
        .select(col("cell"), expr("transform(p, x -> x.mr)").as("m_emb"))
      cents = materialize(cents.join(means, Seq("cell"), "left")
        .select(col("cell"), coalesce(col("m_emb"), col("c_emb")).as("c_emb")))
    }
    // centroids are already driver-resident (materialize collects each
    // round), so the sample's cached blocks are no longer referenced
    if (trainCap.isDefined) trainSet.unpersist()
    cents.withColumn("c_nrm", sqrt(expr("graft_dot(c_emb, c_emb)")))
  }

  /** The oracle-side mirror: the SAME algorithm unrolled as DuckDB CTEs,
    * producing `<out>(cell, ce, cn)`. Expects a `<src>(vec_id, e, nrm)`
    * CTE in scope (the repo's standard embedding CTE). `dim` is the
    * embedding width (list indexing is 1-based in DuckDB). `pfx` names
    * the intermediate CTEs so several quantizers can coexist in one
    * oracle (product quantization trains one per subspace). */
  def oracleCte(k: Int, iters: Int, dim: Int, src: String = "n",
      out: String = "c", pfx: String = "km"): String = {
    val init =
      s"""${pfx}_init AS (SELECT md5(vec_id::VARCHAR) AS hk, e FROM $src ORDER BY hk LIMIT $k),
         |${pfx}_c0 AS (SELECT row_number() OVER (ORDER BY hk) - 1 AS cell, e AS ce FROM ${pfx}_init)""".stripMargin
    val steps = (1 to iters).map { i =>
      val prev = s"${pfx}_c${i - 1}"
      s"""${pfx}_a$i AS (
         |  SELECT cell, e FROM (
         |    SELECT $src.vec_id, $src.e, c.cell,
         |      row_number() OVER (PARTITION BY $src.vec_id ORDER BY
         |        round(list_dot_product($src.e, c.ce) / ($src.nrm * sqrt(list_dot_product(c.ce, c.ce))), 4) DESC,
         |        c.cell) AS rn
         |    FROM $src CROSS JOIN $prev c) WHERE rn = 1),
         |${pfx}_m$i AS (
         |  SELECT cell, j,
         |    CAST(SUM(CAST(floor(e[j] * 1000000 + 0.5::DOUBLE) / 1000000 AS DECIMAL(18,6))) AS DOUBLE)
         |      / count(*) AS m
         |  FROM ${pfx}_a$i CROSS JOIN range(1, ${dim + 1}) t(j) GROUP BY cell, j),
         |${pfx}_p$i AS (
         |  SELECT cell, list(floor(m * 1000000 + 0.5::DOUBLE) / 1000000 ORDER BY j) AS ce
         |  FROM ${pfx}_m$i GROUP BY cell),
         |${pfx}_c$i AS (
         |  SELECT p.cell, COALESCE(u.ce, p.ce) AS ce
         |  FROM $prev p LEFT JOIN ${pfx}_p$i u ON p.cell = u.cell)""".stripMargin
    }
    (Seq(init) ++ steps ++ Seq(
      s"$out AS (SELECT cell, ce, sqrt(list_dot_product(ce, ce)) AS cn FROM ${pfx}_c$iters)"))
      .mkString(",\n")
  }
}
