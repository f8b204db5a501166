package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.KMeans
import NorthStarQueries.{emb, embCte, memoize}

/** Product quantization (Jégou et al. 2011, public) — the compression
  * half of the IVF-PQ architecture every 100 TB-scale ANN deployment
  * runs: split each vector into `M` subvectors, train an independent
  * `SubK`-entry codebook per subspace, and represent every vector by its
  * M code bytes. Search then runs over CODES (asymmetric distance
  * computation: per-query lookup tables of query-to-codeword dots), so
  * per-candidate cost drops from O(dim) float ops to O(M) table
  * lookups and the corpus shrinks from dim doubles to M small ints per
  * vector.
  *
  *  - q_pq_encode: codebook training + encoding + per-vector
  *    reconstruction quality (cosine of vector vs its quantized form) —
  *    the compression-fidelity readout that picks M/SubK.
  *  - q_pq_ann: ADC top-k for the fixed query set — candidates join the
  *    per-query lookup tables on their CODE (two broadcast joins of
  *    Q x SubK rows), never touching raw corpus vectors.
  *
  * Determinism: the sub-quantizers are [[KMeans.train]] on the halved
  * vectors (decimal-exact, partition-count-invariant, oracle-unrolled
  * via `KMeans.oracleCte(src/out/pfx)` — one CTE chain per subspace);
  * assignments tie-break on the cell id; ADC scores compute
  * `(dp1 + dp2) / (qn * sqrt(cn1² + cn2²))` with the SAME operation
  * tree on both engines; rounds are the irrational-mantissa plain
  * round(4) (cosines). Codebooks/LUTs are O(SubK) and O(Q x SubK) —
  * broadcast-safe at any corpus size; the only corpus-sized work is one
  * assignment pass per subspace and the keyed LUT joins.
  */
object PqQueries {

  /** Subspace geometry: 64-dim embeddings as M=2 halves of 32; SubK=8
    * codewords per subspace (64 distinct code pairs), 2 training
    * iterations — the same iteration budget as the IVF quantizer. */
  private val HalfDim = 32
  private val SubK = 8
  private val Iters = 2

  /** One subspace's view of the corpus: (vec_id, emb=half, nrm=half
    * norm) — the [[KMeans.train]] input contract. `lo` is 1-based. */
  private def half(s: SparkSession, d: String, lo: Int): DataFrame =
    emb(s, d).select(col("vec_id"),
        slice(col("emb"), lo, HalfDim).as("emb"))
      .withColumn("nrm", sqrt(expr("graft_dot(emb, emb)")))

  private val cbCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private val cb2Cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** The two trained codebooks (cell, c_emb, c_nrm), memoized like the
    * IVF centroids (every PQ query retrains them otherwise). */
  private[queries] def codebook1(s: SparkSession, d: String): DataFrame =
    memoize(cbCache, s, d) {
      KMeans.train(s, half(s, d, 1), SubK, Iters)
    }
  private[queries] def codebook2(s: SparkSession, d: String): DataFrame =
    memoize(cb2Cache, s, d) {
      KMeans.train(s, half(s, d, HalfDim + 1), SubK, Iters)
    }

  /** Nearest-codeword assignment for one subspace: the q_ivf_assign
    * rule (rounded cosine desc, cell asc tie-break). Output
    * (vec_id, code, ce, cn) — the codeword rides along for
    * reconstruction / norm computation. */
  private def assign(h: DataFrame, cb: DataFrame, code: String,
      ce: String, cn: String): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(desc("sim"), asc("cell"))
    h.join(broadcast(cb))
      .withColumn("sim",
        round(expr("graft_dot(emb, c_emb)") / (col("nrm") * col("c_nrm")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("cell").as(code),
        col("c_emb").as(ce), col("c_nrm").as(cn))
  }

  private val encCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()

  /** PQ-encoded corpus (vec_id, code1, code2, ce1, ce2, cn1, cn2),
    * memoized: both PQ queries consume it, and q_pq_ann reads it twice
    * (query side + candidate side). */
  private[queries] def encoded(s: SparkSession, d: String): DataFrame =
    memoize(encCache, s, d) {
      assign(half(s, d, 1), codebook1(s, d), "code1", "ce1", "cn1")
        .join(assign(half(s, d, HalfDim + 1), codebook2(s, d),
          "code2", "ce2", "cn2"), "vec_id")
    }

  /** Oracle mirror of the halved corpus + both codebook chains +
    * per-subspace assignments, shared by both PQ oracles. */
  private def pqCtes: String = {
    def halfCte(name: String, lo: Int): String = {
      val hi = lo + HalfDim - 1
      s"""$name AS (
         |  SELECT vec_id, e[$lo:$hi] AS e,
         |    sqrt(list_dot_product(e[$lo:$hi], e[$lo:$hi])) AS nrm
         |  FROM n)""".stripMargin
    }
    def assignCte(name: String, src: String, cb: String): String =
      s"""$name AS (
         |  SELECT vec_id, cell, ce, cn FROM (
         |    SELECT $src.vec_id, c.cell, c.ce, c.cn,
         |      row_number() OVER (PARTITION BY $src.vec_id ORDER BY
         |        round(list_dot_product($src.e, c.ce) / ($src.nrm * c.cn), 4) DESC,
         |        c.cell) AS rn
         |    FROM $src CROSS JOIN $cb c) WHERE rn = 1)""".stripMargin
    Seq(
      halfCte("n1", 1), halfCte("n2", HalfDim + 1),
      KMeans.oracleCte(SubK, Iters, HalfDim, src = "n1", out = "cb1", pfx = "k1"),
      KMeans.oracleCte(SubK, Iters, HalfDim, src = "n2", out = "cb2", pfx = "k2"),
      assignCte("enc1", "n1", "cb1"), assignCte("enc2", "n2", "cb2"),
      """enc AS (
        |  SELECT e1.vec_id, e1.cell AS code1, e2.cell AS code2,
        |    e1.ce AS ce1, e2.ce AS ce2, e1.cn AS cn1, e2.cn AS cn2
        |  FROM enc1 e1 JOIN enc2 e2 ON e1.vec_id = e2.vec_id)""".stripMargin
    ).mkString(",\n")
  }

  /** ADC top-5 per query (q_id, vec_id, sim) — shared by q_pq_ann (the
    * search itself) and q_pq_recall (its quality audit). */
  private def adcTop5(s: SparkSession, d: String): DataFrame = {
    val q = emb(s, d).filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"),
        slice(col("emb"), 1, HalfDim).as("q1"),
        slice(col("emb"), HalfDim + 1, HalfDim).as("q2"),
        col("nrm").as("qn"))
    val lut1 = q.crossJoin(codebook1(s, d))
      .withColumn("dp1", expr("graft_dot(q1, c_emb)"))
      .select(col("q_id"), col("qn"), col("cell").as("code1"),
        col("dp1"), col("c_nrm").as("cn1"))
    val lut2 = q.crossJoin(codebook2(s, d))
      .withColumn("dp2", expr("graft_dot(q2, c_emb)"))
      .select(col("q_id").as("q_id2"), col("cell").as("code2b"),
        col("dp2"), col("c_nrm").as("cn2"))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), asc("vec_id"))
    encoded(s, d).select("vec_id", "code1", "code2")
      .join(broadcast(lut1), Seq("code1"))
      .join(broadcast(lut2),
        col("q_id") === col("q_id2") && col("code2") === col("code2b"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("sim", round((col("dp1") + col("dp2")) /
        (col("qn") * sqrt(col("cn1") * col("cn1") + col("cn2") * col("cn2"))), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select("q_id", "vec_id", "sim")
  }

  /** Oracle mirror of [[adcTop5]]: CTE chain producing
    * `adc(q_id, vec_id, sim)`. Expects `n` + [[pqCtes]] in scope. */
  private val adcCtes: String =
    s"""q AS (SELECT vec_id AS q_id, e[1:$HalfDim] AS q1,
       |        e[${HalfDim + 1}:${2 * HalfDim}] AS q2, nrm AS qn
       |      FROM n WHERE vec_id < 5),
       |lut1 AS (SELECT q_id, qn, cell AS code1,
       |           list_dot_product(q1, ce) AS dp1, cn AS cn1
       |         FROM q CROSS JOIN cb1),
       |lut2 AS (SELECT q_id, cell AS code2,
       |           list_dot_product(q2, ce) AS dp2, cn AS cn2
       |         FROM q CROSS JOIN cb2),
       |cand AS (
       |  SELECT l1.q_id, enc.vec_id,
       |    round((l1.dp1 + l2.dp2) /
       |      (l1.qn * sqrt(l1.cn1 * l1.cn1 + l2.cn2 * l2.cn2)), 4) + 0.0 AS sim
       |  FROM enc
       |  JOIN lut1 l1 ON enc.code1 = l1.code1
       |  JOIN lut2 l2 ON l2.q_id = l1.q_id AND enc.code2 = l2.code2
       |  WHERE enc.vec_id <> l1.q_id),
       |adc AS (
       |  SELECT q_id, vec_id, sim FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY sim DESC, vec_id) AS rn FROM cand) WHERE rn <= 5)""".stripMargin

  val all: Seq[Q] = Seq(

    // PQ training + encoding + reconstruction fidelity: every vector's
    // 2-byte code plus the cosine between the vector and its quantized
    // reconstruction (codeword concatenation) — the readout that decides
    // whether M=2/SubK=8 compresses this corpus acceptably. Corpus-side
    // work is the two assignment passes (broadcast codebooks, one window
    // per subspace); the reconstruction join is by vec_id, keyed.
    Q("q_pq_encode",
      (s, d) => {
        val e = emb(s, d)
        encoded(s, d).join(e, "vec_id")
          .withColumn("recon", concat(col("ce1"), col("ce2")))
          .withColumn("recon_sim",
            round(expr("graft_dot(emb, recon)") /
              (col("nrm") * sqrt(expr("graft_dot(recon, recon)"))), 4))
          .select("vec_id", "code1", "code2", "recon_sim")
          .orderBy("vec_id")
      },
      Some(s"""WITH $embCte,
             $pqCtes
             SELECT enc.vec_id, code1, code2,
               round(list_dot_product(n.e, ce1 || ce2) /
                 (n.nrm * sqrt(list_dot_product(ce1 || ce2, ce1 || ce2))), 4) + 0.0 AS recon_sim
             FROM enc JOIN n ON enc.vec_id = n.vec_id
             ORDER BY enc.vec_id""")),

    // ADC (asymmetric distance computation) top-5: per query, an
    // 8-entry lookup table per subspace holds the query-half-to-codeword
    // dots; candidates join the tables ON THEIR CODE and score as
    // (dp1+dp2)/(qn*sqrt(cn1²+cn2²)) = cosine(query, reconstruction) —
    // O(M) lookups per candidate instead of O(dim) float ops, the PQ
    // search shape. LUTs are Q x SubK rows (broadcast at any corpus
    // size); the candidate side never touches raw vectors.
    Q("q_pq_ann",
      (s, d) => adcTop5(s, d).orderBy(col("q_id"), desc("sim"), col("vec_id")),
      Some(s"""WITH $embCte,
             $pqCtes,
             $adcCtes
             SELECT q_id, vec_id, sim FROM adc
             ORDER BY q_id, sim DESC, vec_id""")),

    // PQ recall audit (the q_ivf_recall pattern for the compression
    // side): per query, recall@5 of the ADC search against brute-force
    // exact top-5 — the readout that decides whether M=2/SubK=8 ranks
    // faithfully enough or the codebooks need more codewords. The exact
    // side runs only for the FIXED query set (broadcast of |Q| rows);
    // recall is a small-rational ratio -> r4 floor-rounding.
    Q("q_pq_recall",
      (s, d) => {
        val e = emb(s, d)
        val q = e.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
            col("nrm").as("q_nrm"))
        val w = Window.partitionBy("q_id").orderBy(desc("sim"), asc("vec_id"))
        val exact = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
          .withColumn("sim",
            round(expr("graft_dot(q_emb, emb)") / (col("q_nrm") * col("nrm")), 4))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select("q_id", "vec_id")
        val approx = adcTop5(s, d)
          .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
        exact.join(approx, Seq("q_id", "vec_id"), "left")
          .groupBy("q_id")
          .agg(count(lit(1)).as("k"), count(col("hit")).as("n_hit"))
          .withColumn("recall", Helpers.r4(col("n_hit").cast("double") / col("k")))
          .select("q_id", "n_hit", "recall")
          .orderBy("q_id")
      },
      Some(s"""WITH $embCte,
             $pqCtes,
             $adcCtes,
             ex AS (
               SELECT q.q_id, n.vec_id,
                 round(list_dot_product(q1 || q2, n.e) / (qn * n.nrm), 4) AS sim
               FROM q JOIN n ON n.vec_id <> q.q_id),
             exact AS (
               SELECT q_id, vec_id FROM (
                 SELECT *, row_number() OVER (PARTITION BY q_id
                   ORDER BY sim DESC, vec_id) AS rn FROM ex) WHERE rn <= 5)
             SELECT e.q_id, CAST(count(a.vec_id) AS BIGINT) AS n_hit,
               floor(count(a.vec_id)::DOUBLE / count(*) * 10000 + 0.5::DOUBLE) / 10000 AS recall
             FROM exact e LEFT JOIN adc a
               ON e.q_id = a.q_id AND e.vec_id = a.vec_id
             GROUP BY e.q_id ORDER BY e.q_id"""))
  )
}
