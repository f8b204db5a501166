package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.engine.GraphMetrics

/** Round-9 third wave: graph analytics over the duplication graph.
  *
  * The dedup family already answers "which documents are the same"
  * (connected components over the candidate-pair graph). These queries
  * ask what the graph's *shape* says about the corpus — the signals a
  * curation pipeline reads before deciding what to drop (the
  * reference's stored-revision redundancy, collector.py:136-154, makes
  * the duplication graph its dominant structure):
  *
  *  - q_pagerank: damped PageRank over the near-dup graph — high-rank
  *    nodes are the template/boilerplate hubs (the canonical member a
  *    keep-one policy should prefer, and the first documents a human
  *    should eyeball). Exact scaled-BIGINT arithmetic: zero floats, so
  *    distributed sum order cannot perturb a single bit.
  *  - q_triangles: per-node triangle counts + local clustering
  *    coefficient — cc ~ 1 neighborhoods are true re-crawl clusters
  *    (everything matches everything); cc ~ 0 stars are one template
  *    touching many one-off variants.
  *  - q_assortativity: degree assortativity (Pearson over edge-endpoint
  *    degrees) — one number separating hub-to-leaf duplication
  *    (disassortative, template syndication) from clique duplication
  *    (assortative, mirrored crawls).
  *  - q_mutual_nn: mutual nearest neighbors between the label-0 and
  *    label-1 embedding populations, blocked on the shared trained-IVF
  *    cell — the bitext-mining candidate primitive (Artetxe &
  *    Schwenk): a pair survives only if each side is the other's
  *    top-1, suppressing hub vectors.
  *  - q_margin_nn: the margin-ratio selection over the same pair
  *    table — the LASER/CCMatrix scoring function, discounting hub
  *    targets by their backward top-k average.
  *
  * Edges are the memoized dedup candidate pairs (NorthStarQueries
  * .scoredPairs — ONE cached table shared with the whole dedup family)
  * at jaccard >= 0.1: the df-capped shingle join keeps the edge list
  * O(candidate pairs) at any corpus size, and every graph step below
  * shuffles on a vertex id, never all-pairs.
  *
  * Determinism: PageRank is integer-exact by construction (see
  * engine/GraphMetrics.scala — both engines run the same BIGINT
  * recurrence, DuckDB with `//`, Spark with `div`); clustering
  * coefficients and assortativity follow the q_spearman rule (exact
  * integer/DECIMAL sums, one double formula at the end, identical
  * operation tree, r4); mutual-NN ties break (sim desc, id asc) on
  * 4-decimal-rounded cosines exactly like the IVF family.
  */
object GraphQueries {

  private def r4(c: Column): Column = Helpers.r4(c)

  /** Jaccard threshold for graph edges — looser than the dedup
    * family's 0.8 on purpose: structure queries want the near-dup
    * *neighborhood*, not just the merge-safe core. */
  private val GraphTau = 0.1

  private val PrScale = 1000000000000L
  private val PrIters = 5

  /** Spark-side edge list: d1 < d2, distinct, from the shared cached
    * candidate-pair table. */
  private def edges(s: org.apache.spark.sql.SparkSession, d: String) =
    NorthStarQueries.scoredPairs(s, d)
      .filter(col("jaccard") >= GraphTau)
      .select("d1", "d2")

  /** Oracle mirror of [[edges]] + the symmetrized view and degrees:
    * e(d1, d2), e2(u, v), deg(u, deg). Multiply-referenced CTEs are
    * marked MATERIALIZED: DuckDB otherwise re-inlines the full shingle
    * pipeline per reference, which turns the unrolled PageRank chain
    * (each r_t reads r_{t-1} twice) into 2^iters evaluations — measured
    * 71 s -> 0.1 s at sf0.01 with the hints. */
  private val edgeCte =
    s"""${NorthStarQueries.shingleCte},
       |shm AS MATERIALIZED (SELECT doc_id, s FROM sh),
       |sizes AS (SELECT doc_id, count(*) AS n FROM shm GROUP BY doc_id),
       |p0 AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
       |  FROM shm a JOIN shm b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |e AS MATERIALIZED (SELECT d1, d2 FROM p0
       |  JOIN sizes s1 ON s1.doc_id = d1
       |  JOIN sizes s2 ON s2.doc_id = d2
       |  WHERE floor(inter::DOUBLE / (s1.n + s2.n - inter) * 10000 + 0.5::DOUBLE) / 10000 >= $GraphTau),
       |e2 AS MATERIALIZED (SELECT d1 AS u, d2 AS v FROM e
       |       UNION ALL SELECT d2 AS u, d1 AS v FROM e),
       |deg AS MATERIALIZED (SELECT u, count(*) AS deg FROM e2 GROUP BY u)""".stripMargin

  /** The PageRank recurrence of engine/GraphMetrics.pagerank unrolled
    * as CTEs — same scaled-BIGINT arithmetic, DuckDB `//` for Spark's
    * `div` (both truncate on non-negative operands). */
  private def pagerankCtes: String = {
    val sb = new StringBuilder(
      s"""nn AS (SELECT count(*) AS n FROM deg),
         |r0 AS MATERIALIZED (SELECT u, deg,
         |  (15 * $PrScale) // (100 * n) AS base,
         |  $PrScale // n AS r
         |  FROM deg CROSS JOIN nn)""".stripMargin)
    for (t <- 1 to PrIters) {
      sb.append(
        s""",
           |m$t AS (SELECT e2.v AS u, sum(r${t - 1}.r // r${t - 1}.deg)::BIGINT AS m
           |  FROM e2 JOIN r${t - 1} ON e2.u = r${t - 1}.u GROUP BY e2.v),
           |r$t AS MATERIALIZED (SELECT p.u, p.deg, p.base,
           |  p.base + (85 * coalesce(m$t.m, 0)) // 100 AS r
           |  FROM r${t - 1} p LEFT JOIN m$t ON m$t.u = p.u)""".stripMargin)
    }
    sb.toString
  }

  private val MarginK = 4

  /** One side of the bitext pairing: the label-`l` population of the
    * (memoized) IVF-assigned embedding table, in mutual/marginTopOne's
    * (id, emb, nrm, cell) shape. */
  private def bitextSide(s: org.apache.spark.sql.SparkSession, d: String,
      l: Int) = {
    val lab = NorthStarQueries.emb(s, d).select("vec_id", "label")
    NorthStarQueries.ivfAssigned(s, d).join(lab, "vec_id")
      .filter(col("label") === l)
      .select(col("vec_id").as("id"), col("emb"), col("nrm"), col("cell"))
  }

  /** Shared oracle prefix for the bitext queries: IVF assignment (the
    * q_dedup_embed CTEs), the two label populations, and the in-cell
    * scored pair table p(cell, sid, tid, sim). */
  private val bitextCte =
    s"""${NorthStarQueries.embCte},
       |${NorthStarQueries.kmeansCte},
       |scored AS (
       |  SELECT n.vec_id, c.cell,
       |    round(list_dot_product(n.e, ce) / (n.nrm * cn), 4) AS sim
       |  FROM n CROSS JOIN c),
       |asn AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT *, row_number() OVER (PARTITION BY vec_id
       |      ORDER BY sim DESC, cell) AS rn FROM scored)
       |  WHERE rn = 1),
       |m AS MATERIALIZED (SELECT n.vec_id, n.e, n.nrm, n.label, asn.cell
       |      FROM n JOIN asn USING (vec_id)),
       |a AS (SELECT vec_id, e, nrm, cell FROM m WHERE label = 0),
       |b AS (SELECT vec_id, e, nrm, cell FROM m WHERE label = 1),
       |p AS MATERIALIZED (
       |  SELECT a.cell, a.vec_id AS sid, b.vec_id AS tid,
       |    round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 4) + 0.0 AS sim
       |  FROM a JOIN b ON a.cell = b.cell)""".stripMargin

  val all: Seq[Q] = Seq(

    // PageRank over the near-dup graph: the duplication hubs. 5 damped
    // (0.85) rounds in scaled-BIGINT units of 1e-12 — the output column
    // IS the exact integer both engines must agree on.
    Q("q_pagerank",
      (s, d) => GraphMetrics
        .pagerank(edges(s, d), PrIters, PrScale)
        .select(col("v").as("doc_id"), col("deg"), col("rank_s"))
        .orderBy("doc_id"),
      Some(s"""WITH $edgeCte,
             $pagerankCtes
             SELECT u AS doc_id, deg, r AS rank_s FROM r$PrIters
             ORDER BY doc_id""")),

    // per-node triangle counts + local clustering coefficient over the
    // same edge set; cc = 2T / deg(deg-1) via the shared r4 tree.
    Q("q_triangles",
      (s, d) => GraphMetrics.triangles(edges(s, d))
        .withColumn("cc", when(col("deg") >= 2,
            r4(lit(2) * col("n_tri") / (col("deg") * (col("deg") - 1))))
          .otherwise(lit(0.0)))
        .select(col("v").as("doc_id"), col("deg"), col("n_tri"), col("cc"))
        .orderBy("doc_id"),
      Some(s"""WITH $edgeCte,
             tri AS MATERIALIZED (
               SELECT ab.d1 AS x, ab.d2 AS y, bc.d2 AS z
               FROM e ab JOIN e bc ON ab.d2 = bc.d1
                         JOIN e ac ON ac.d1 = ab.d1 AND ac.d2 = bc.d2),
             tv AS (SELECT x AS u FROM tri UNION ALL SELECT y FROM tri
                    UNION ALL SELECT z FROM tri),
             tc AS (SELECT u, count(*) AS n_tri FROM tv GROUP BY u)
             SELECT deg.u AS doc_id, deg.deg,
               coalesce(tc.n_tri, 0) AS n_tri,
               CASE WHEN deg.deg >= 2 THEN
                 floor(2 * coalesce(tc.n_tri, 0) / (deg.deg * (deg.deg - 1))
                   * 10000 + 0.5::DOUBLE) / 10000
               ELSE 0.0 END AS cc
             FROM deg LEFT JOIN tc ON tc.u = deg.u
             ORDER BY doc_id""")),

    // degree assortativity of the dup graph: Pearson over the
    // edge-endpoint degree pairs (x, y) of the symmetrized edge list —
    // exact DECIMAL sums, one double formula, r4 (the q_spearman
    // shape). Single-row corpus summary.
    Q("q_assortativity",
      (s, d) => {
        val ed = edges(s, d)
        // r17 (guide §5 / VERDICT r16 #5): materialize the lean (u, v)
        // long-pair table once — it feeds the degree aggregate AND the
        // two degree-attach joins, and without the checkpoint every
        // task closure carries the full candidate-pair logical plan
        // (measured 6.1 s summed task deserialization at sf0.1, the
        // query's dominant cost). Freed by the ContextCleaner when the
        // plan is GC'd (the GraphMetrics precedent).
        val e2 = ed.select(col("d1").as("u"), col("d2").as("v"))
          .union(ed.select(col("d2").as("u"), col("d1").as("v")))
          .localCheckpoint(true)
        val deg = e2.groupBy("u").agg(count(lit(1)).as("deg"))
        val x = col("x").cast("decimal(18,0)")
        val y = col("y").cast("decimal(18,0)")
        e2.join(deg.select(col("u"), col("deg").as("x")), "u")
          .join(deg.select(col("u").as("v"), col("deg").as("y")), "v")
          .agg(count(lit(1)).as("n"),
            sum(x).cast("double").as("sx"),
            sum(y).cast("double").as("sy"),
            sum(x * y).cast("double").as("sxy"),
            sum(x * x).cast("double").as("sxx"),
            sum(y * y).cast("double").as("syy"))
          .select(expr("n div 2").as("n_edges"),
            r4((col("n") * col("sxy") - col("sx") * col("sy")) /
              sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
                (col("n") * col("syy") - col("sy") * col("sy"))))
              .as("assort"))
      },
      Some(s"""WITH $edgeCte,
             dd AS (
               SELECT du.deg::DECIMAL(18,0) AS x, dv.deg::DECIMAL(18,0) AS y
               FROM e2 JOIN deg du ON du.u = e2.u
                       JOIN deg dv ON dv.u = e2.v),
             st AS (SELECT count(*) AS n,
               sum(x)::DOUBLE AS sx, sum(y)::DOUBLE AS sy,
               sum(x * y)::DOUBLE AS sxy,
               sum(x * x)::DOUBLE AS sxx, sum(y * y)::DOUBLE AS syy
               FROM dd)
             SELECT n // 2 AS n_edges,
               floor((n * sxy - sx * sy) /
                 sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
                 * 10000 + 0.5::DOUBLE) / 10000 AS assort
             FROM st""")),

    // mutual nearest neighbors label-0 <-> label-1 inside the shared
    // trained-IVF cell (the bitext-mining candidate set). The oracle's
    // fixed k makes the parameterized engine path
    // (Contamination.scala's k = n/target rule) the 100-TB form, same
    // as q_embed_contam / q_semdedup; GRAFT_CELLS_PER
    // (NorthStarQueries.ivfK) runs this form with k ∝ corpus — the
    // shape ScaleProbe measures. Applies to q_margin_nn below too.
    Q("q_mutual_nn",
      (s, d) => GraphMetrics.mutualTopOne(bitextSide(s, d, 0), bitextSide(s, d, 1))
        .select(col("cell"), col("sid").as("src_id"),
          col("tid").as("tgt_id"), col("sim"))
        .orderBy("src_id"),
      Some(s"""WITH $bitextCte,
             w AS (SELECT *,
               row_number() OVER (PARTITION BY sid ORDER BY sim DESC, tid) AS rs,
               row_number() OVER (PARTITION BY tid ORDER BY sim DESC, sid) AS rt
               FROM p)
             SELECT cell, sid AS src_id, tid AS tgt_id, sim
             FROM w WHERE rs = 1 AND rt = 1
             ORDER BY src_id""")),

    // margin-ratio neighbor selection (Artetxe & Schwenk; the
    // LASER/CCMatrix scoring function): per source, the top-4-by-sim
    // candidate maximizing sim / ((avgTop4(src) + avgTop4(tgt)) / 2) —
    // hub targets with a high backward average are discounted, the
    // failure mode raw top-1 (q_mutual_nn) cannot see. The margin is
    // ONE double division of exact BIGINT products (scaled sims summed
    // as integers), so no partial double sums exist in either engine.
    Q("q_margin_nn",
      (s, d) => GraphMetrics
        .marginTopOne(bitextSide(s, d, 0), bitextSide(s, d, 1), MarginK)
        .select(col("cell"), col("sid").as("src_id"),
          col("tid").as("tgt_id"), col("sim"), col("margin"))
        .orderBy("src_id"),
      Some(s"""WITH $bitextCte,
             ps AS MATERIALIZED (SELECT *,
               CAST(floor(sim * 10000 + 0.5::DOUBLE) AS BIGINT) AS s,
               row_number() OVER (PARTITION BY sid ORDER BY sim DESC, tid) AS rn_s,
               row_number() OVER (PARTITION BY tid ORDER BY sim DESC, sid) AS rn_t
               FROM p),
             sa AS (SELECT sid, sum(s)::BIGINT AS sa, count(*) AS na
                    FROM ps WHERE rn_s <= $MarginK GROUP BY sid),
             sb AS (SELECT tid, sum(s)::BIGINT AS sb, count(*) AS nb
                    FROM ps WHERE rn_t <= $MarginK GROUP BY tid),
             mg AS (SELECT ps.cell, ps.sid, ps.tid, ps.sim,
                 floor((2 * ps.s * sa.na * sb.nb) /
                     (sa.sa * sb.nb + sb.sb * sa.na)
                   * 10000 + 0.5::DOUBLE) / 10000 AS margin
               FROM ps JOIN sa ON sa.sid = ps.sid JOIN sb ON sb.tid = ps.tid
               WHERE ps.rn_s <= $MarginK
                 AND (sa.sa * sb.nb + sb.sb * sa.na) > 0),
             w AS (SELECT *, row_number() OVER (PARTITION BY sid
                 ORDER BY margin DESC, tid) AS rm FROM mg)
             SELECT cell, sid AS src_id, tid AS tgt_id, sim, margin
             FROM w WHERE rm = 1
             ORDER BY src_id"""))
  )

}
