package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Extended operator surface beyond SURVEY.md §2 and the first north-star
  * wave: the remaining operations a large-scale training-data pipeline
  * reaches for — sessionization, deterministic train/valid/test splits,
  * per-group deterministic sampling, TF-IDF, pivot/cube shapes, binning,
  * exact-arithmetic correlation, range (band) joins, string aggregation,
  * and approximate distinct counts.
  *
  * Same determinism contract as CoreQueries: total ORDER BY everywhere,
  * double sums through DECIMAL(18,2), md5 for anything hash-ordered
  * (cross-engine-stable), floor(x*1e4+0.5)/1e4 for rational scores,
  * timestamps emitted as NTZ.
  *
  * Scale notes per query inline — the common theme: one shuffle keyed on
  * the natural partition key (user, doc, term, group), window functions
  * over per-key partitions (never a global window), tiny dimension sides
  * broadcast (bands), and sampling/splitting via per-row hashing so no
  * coordination is needed at any parallelism.
  */
object ExtendedQueries {

  // shared determinism helpers — single definition in Helpers.scala
  private def ntz(c: Column): Column = Helpers.ntz(c)
  private def dsum(c: Column): Column = Helpers.dsum(c)
  private def r4(c: Column): Column = Helpers.r4(c)

  /** DuckDB-side parse of 4 hex chars -> 0..65535 (shared definition). */
  private def hex4(h: String): String = Helpers.hex4(h)

  /** (w, true_n) corpus word counts, memoized+cached per (session, dir):
    * q_cms_err reads it three times (sketch build, probe set, truth). */
  /** Per-doc BM25 score (Robertson-Sparck Jones, k1 = 1.2, b = 0.75)
    * for the fixed 3-term query — the lexical ranking arm shared by
    * q_bm25 (top-25 report) and NorthStarQueries' q_rrf (hybrid
    * fusion). Returns (doc_id, bm25) for every document containing at
    * least one query term, rounded to 4 decimals; [[bm25Cte]] is its
    * oracle mirror ending in the CTE `bm` with the same two columns.
    * Determinism: per-term scores carry one ln (irrational mantissa →
    * plain round, the cosine precedent); the per-doc sum is a
    * FIXED-ORDER coalesce chain over the three pivoted term columns,
    * never a float sum in shuffle order; len/avgdl is spelled
    * (len*N)/totLen with exact integer numerators and ONE division,
    * identically in both engines. Scale: the term filter cuts the
    * explode to query-term rows only; df and the corpus totals are
    * broadcast scalars. */
  private[queries] def bm25Scores(s: SparkSession, d: String): DataFrame = {
    val qTerms = Seq("table", "query", "spark")
    val docs = Tables.documents(s, d)
    val lens = docs
      .withColumn("len", size(split(col("text"), " ")).cast("long"))
      .select("doc_id", "len")
    val totals = lens.agg(count(lit(1)).as("n_docs"),
      sum("len").as("tot_len"))
    val tf = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("term"))
      .filter(col("term").isin(qTerms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("dft"))
    val termScore = tf.join(broadcast(df_), "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(totals))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs").cast("double") - col("dft").cast("double") +
          lit(0.5)) / (col("dft").cast("double") + lit(0.5))))
      .withColumn("tsc", col("idf") *
        (col("tf").cast("double") * lit(2.2)) /
        (col("tf").cast("double") + lit(1.2) *
          (lit(0.25) + lit(0.75) *
            (col("len") * col("n_docs")).cast("double") /
              col("tot_len").cast("double"))))
    termScore.groupBy("doc_id")
      .agg(
        max(when(col("term") === "table", col("tsc"))).as("s1"),
        max(when(col("term") === "query", col("tsc"))).as("s2"),
        max(when(col("term") === "spark", col("tsc"))).as("s3"))
      .withColumn("bm25", round(
        coalesce(col("s1"), lit(0.0)) + coalesce(col("s2"), lit(0.0)) +
          coalesce(col("s3"), lit(0.0)), 4))
      .select("doc_id", "bm25")
  }

  /** Oracle CTE chain mirroring [[bm25Scores]]; ends in `bm(doc_id,
    * bm25)`. Spliced into q_bm25's and q_rrf's oracle SQL. */
  private[queries] val bm25Cte: String =
    """lens AS (SELECT doc_id, CAST(len(str_split(text, ' '))
                 AS BIGINT) AS len FROM documents),
             tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(len) AS BIGINT) AS tot_len FROM lens),
             toks AS (SELECT doc_id, unnest(str_split(text, ' ')) AS term
                 FROM documents),
             tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
                 WHERE term IN ('table', 'query', 'spark') GROUP BY 1, 2),
             df AS (SELECT term, count(*) AS dft FROM tf GROUP BY 1),
             sc AS (SELECT tf.doc_id, tf.term,
                 ln(1.0::DOUBLE + (n_docs::DOUBLE - dft::DOUBLE
                     + 0.5::DOUBLE) / (dft::DOUBLE + 0.5::DOUBLE)) *
                   (tf::DOUBLE * 2.2::DOUBLE) /
                   (tf::DOUBLE + 1.2::DOUBLE * (0.25::DOUBLE +
                     0.75::DOUBLE * (len * n_docs)::DOUBLE
                       / tot_len::DOUBLE)) AS tsc
               FROM tf JOIN df ON tf.term = df.term
               JOIN lens ON lens.doc_id = tf.doc_id CROSS JOIN tot),
             piv AS (SELECT doc_id,
                 max(CASE WHEN term = 'table' THEN tsc END) AS s1,
                 max(CASE WHEN term = 'query' THEN tsc END) AS s2,
                 max(CASE WHEN term = 'spark' THEN tsc END) AS s3
               FROM sc GROUP BY 1),
             bm AS (SELECT doc_id, round(coalesce(s1, 0.0::DOUBLE)
                 + coalesce(s2, 0.0::DOUBLE)
                 + coalesce(s3, 0.0::DOUBLE), 4) AS bm25 FROM piv)"""

  private val minhashPairCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]

  /** LSH candidate pairs with the signature-agreement estimate, exact
    * shingle intersection, and both doc sizes — columns (d1, d2, est,
    * inter, n1, n2). The shared audit substrate of q_minhash_est
    * (jaccard) and q_containment (overlap coefficient), memoized per
    * (session, dir) because both queries read the same expensive
    * candidate join; [[minhashPairCte]] is its oracle mirror ending in
    * the CTE `pairs` with the same six columns.
    *
    * Scale: candidates are O(LSH pairs) — measured linear in corpus
    * (100x probe exponent 0.94/decade) — so no broadcast hint: a
    * shuffle join on d1 scales, and AQE broadcasts while small; the
    * exact intersection runs only on the candidate-pruned subset of
    * the shingle stream, never a full self-join. */
  private[queries] def minhashPairs(s: SparkSession, d: String): DataFrame =
    NorthStarQueries.memoize(minhashPairCache, s, d) {
      import graft.functions.MinHashLsh.{NumBands, NumHashes}
      // memoized+cached upstream (NorthStarQueries.hashedShingles):
      // feeds mins, sizes, AND both sides of the exact intersection —
      // a bare per-call cache here would leak blocks per invocation
      val sh = NorthStarQueries.hashedShingles(s, d)
      // same slice-minima scheme (and the SAME constants) as the
      // shared MinHashLsh helper — hardcoded 4/8 literals would keep
      // auditing an old scheme if the helper were ever retuned
      val mins = graft.functions.MinHashLsh.sliceMins(
        sh.select("doc_id", "h"))
      // band index is PART of the signature — without it, band 0 of
      // one doc could spuriously match band 2 of another
      val bands = mins.select(Seq(col("doc_id"),
        explode(array((0 until NumBands).map(b =>
          concat_ws("|", lit(b.toString),
            col(s"m${2 * b}"), col(s"m${2 * b + 1}"))): _*)).as("bsig")) ++
        (0 until NumHashes).map(j => col(s"m$j")): _*)
      val cands = bands.as("a")
        .join(bands.as("b"),
          col("a.bsig") === col("b.bsig") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          ((0 until NumHashes).map(j =>
            when(col(s"a.m$j") === col(s"b.m$j"), 1).otherwise(0))
            .reduce(_ + _) / lit(NumHashes.toDouble)).as("est"))
        .groupBy("d1", "d2").agg(r4(max("est")).as("est"))
      // shingled() is distinct-per-doc by construction — no re-distinct
      val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.select(col("doc_id").as("d1"), col("s"))
        .join(cands.select("d1", "d2"), "d1")
        .join(sh.select(col("doc_id").as("d2"), col("s")), Seq("d2", "s"))
        .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
      cands
        .join(inter, Seq("d1", "d2"))
        .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
        .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
        .select(col("d1"), col("d2"), col("est"), col("inter"),
          col("s1.n").as("n1"), col("s2.n").as("n2"))
    }

  /** Oracle CTE chain mirroring [[minhashPairs]] (assumes the
    * shingleCteUncapped `sh` CTE precedes it); ends in `pairs(d1, d2,
    * est, inter, n1, n2)`. */
  private[queries] val minhashPairCte: String =
    """hashed AS (SELECT doc_id, s, md5(s) AS h FROM sh),
             minsig AS (
               SELECT doc_id, j, min(substr(h, 4 * j + 1, 4)) AS mh
               FROM hashed, unnest(range(0, 8)) AS v(j)
               GROUP BY 1, 2),
             wide AS (
               SELECT doc_id,
                 min(CASE WHEN j = 0 THEN mh END) AS m0, min(CASE WHEN j = 1 THEN mh END) AS m1,
                 min(CASE WHEN j = 2 THEN mh END) AS m2, min(CASE WHEN j = 3 THEN mh END) AS m3,
                 min(CASE WHEN j = 4 THEN mh END) AS m4, min(CASE WHEN j = 5 THEN mh END) AS m5,
                 min(CASE WHEN j = 6 THEN mh END) AS m6, min(CASE WHEN j = 7 THEN mh END) AS m7
               FROM minsig GROUP BY doc_id),
             bands AS (
               SELECT doc_id, b, concat_ws('|', b::VARCHAR,
                 CASE b WHEN 0 THEN m0 WHEN 1 THEN m2 WHEN 2 THEN m4 ELSE m6 END,
                 CASE b WHEN 0 THEN m1 WHEN 1 THEN m3 WHEN 2 THEN m5 ELSE m7 END) AS bsig,
                 m0, m1, m2, m3, m4, m5, m6, m7
               FROM wide, unnest(range(0, 4)) AS u(b)),
             cands AS (
               SELECT a.doc_id AS d1, b.doc_id AS d2,
                 floor(max(((CASE WHEN a.m0 = b.m0 THEN 1 ELSE 0 END) +
                   (CASE WHEN a.m1 = b.m1 THEN 1 ELSE 0 END) +
                   (CASE WHEN a.m2 = b.m2 THEN 1 ELSE 0 END) +
                   (CASE WHEN a.m3 = b.m3 THEN 1 ELSE 0 END) +
                   (CASE WHEN a.m4 = b.m4 THEN 1 ELSE 0 END) +
                   (CASE WHEN a.m5 = b.m5 THEN 1 ELSE 0 END) +
                   (CASE WHEN a.m6 = b.m6 THEN 1 ELSE 0 END) +
                   (CASE WHEN a.m7 = b.m7 THEN 1 ELSE 0 END)) / 8.0::DOUBLE) * 10000 + 0.5::DOUBLE) / 10000 AS est
               FROM bands a JOIN bands b
                 ON a.bsig = b.bsig AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
             sizes AS (SELECT doc_id, count(DISTINCT s) AS n FROM sh GROUP BY 1),
             inter AS (
               SELECT c.d1, c.d2, count(*) AS inter
               FROM cands c
               JOIN sh a ON a.doc_id = c.d1
               JOIN sh b ON b.doc_id = c.d2 AND b.s = a.s
               GROUP BY 1, 2),
             pairs AS (
               SELECT c.d1, c.d2, c.est, i.inter, s1.n AS n1, s2.n AS n2
               FROM cands c
               JOIN inter i ON i.d1 = c.d1 AND i.d2 = c.d2
               JOIN sizes s1 ON s1.doc_id = c.d1
               JOIN sizes s2 ON s2.doc_id = c.d2)"""

  private val wordCountCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private[queries] def wordCounts(s: SparkSession, d: String): DataFrame =
    NorthStarQueries.memoize(wordCountCache, s, d) {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
        .groupBy("w")
        .agg(count(lit(1)).as("true_n"))
    }

  val all: Seq[Q] = Seq(

    // Sessionization: split each user's event stream on >30min
    // inactivity gaps — THE canonical event-log prep step. One shuffle
    // on user_id; both windows (lag + running sum) share that partition,
    // so Spark plans a single Exchange + sort. Deterministic tie-break
    // (ts, event_id) pins duplicate-timestamp ordering on both engines.
    Q("q_sessionize",
      (s, d) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        // cast("timestamp") tolerates both testdata generations (NTZ
        // native vs micros-converted LTZ); identical under the UTC
        // session, and unix_micros requires the zoned type
        val gapUs = unix_micros(col("ts").cast("timestamp")) -
          unix_micros(lag(col("ts"), 1).over(w).cast("timestamp"))
        Tables.events(s, d)
          .withColumn("new_s",
            when(gapUs.isNull || gapUs > 1800L * 1000000L, 1).otherwise(0))
          .withColumn("session_num",
            sum("new_s").over(w.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)))
          .groupBy("user_id", "session_num")
          .agg(ntz(min("ts")).as("session_start"),
            ntz(max("ts")).as("session_end"),
            count(lit(1)).as("n_events"))
          .orderBy("user_id", "session_num")
      },
      Some("""WITH x AS (
               SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                      THEN 1 ELSE 0 END AS new_s
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             y AS (
               SELECT user_id, ts,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_num
               FROM x)
             SELECT user_id, session_num::BIGINT AS session_num,
               min(ts) AS session_start, max(ts) AS session_end,
               count(*)::BIGINT AS n_events
             FROM y GROUP BY user_id, session_num
             ORDER BY user_id, session_num""")),

    // Deterministic train/valid/test split (80/10/10): assignment =
    // pure function of md5(doc_id), so ANY number of executors, reruns,
    // or re-partitions produce the identical split — no sampling state,
    // no coordination; the scale-correct way to split 100 TB.
    Q("q_train_split",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), (Helpers.hash16(col("doc_id")) % 10).as("hv"))
        .select(col("doc_id"),
          when(col("hv") < 8, "train")
            .when(col("hv") < 9, "valid")
            .otherwise("test").as("split"))
        .orderBy("doc_id"),
      Some(s"""WITH m AS (
               SELECT doc_id, md5(doc_id::VARCHAR) AS h FROM documents),
             p AS (SELECT doc_id, ${hex4("h")} % 10 AS hv FROM m)
             SELECT doc_id,
               CASE WHEN hv < 8 THEN 'train'
                    WHEN hv < 9 THEN 'valid' ELSE 'test' END AS split
             FROM p ORDER BY doc_id""")),

    // Per-group deterministic sampling: k=2 docs per source, chosen by
    // hash order — reservoir-sampling semantics without randomness or
    // driver coordination. Window is per-source (one shuffle), and at
    // scale WindowGroupLimit prunes each partition to k rows pre-sort.
    Q("q_sample_group",
      (s, d) => {
        val hs = md5(col("doc_id").cast("string").cast("binary"))
        val w = Window.partitionBy("source").orderBy(hs.asc, col("doc_id").asc)
        Tables.documents(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 2)
          .select("source", "doc_id")
          .orderBy("source", "doc_id")
      },
      Some("""WITH r AS (
               SELECT source, doc_id,
                 row_number() OVER (PARTITION BY source
                   ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn
               FROM documents)
             SELECT source, doc_id FROM r WHERE rn <= 2
             ORDER BY source, doc_id""")),

    // TF-IDF top-3 terms per document. Shuffles: one on (doc, term) for
    // tf, one on term for df (map-side combinable), then a broadcast of
    // the scalar N. ln() mantissas are effectively random, so plain
    // 4-decimal rounding is cross-engine safe (cosine precedent); ties
    // break on term.
    Q("q_tfidf",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val terms = docs.select(col("doc_id"),
          explode(split(col("text"), " ")).as("term"))
        val tf = terms.groupBy("doc_id", "term")
          .agg(count(lit(1)).as("tf"))
        val df_ = terms.groupBy("term")
          .agg(countDistinct("doc_id").as("dft"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy("doc_id")
          .orderBy(desc("score"), asc("term"))
        tf.join(df_, "term")
          .crossJoin(broadcast(n))
          .withColumn("score",
            r4(col("tf") * log(col("n_docs").cast("double") / col("dft"))))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("doc_id"), col("term"), col("score"), col("rn"))
          .orderBy("doc_id", "rn")
      },
      Some("""WITH terms AS (
               SELECT doc_id, unnest(string_split(text, ' ')) AS term
               FROM documents),
             tf AS (SELECT doc_id, term, count(*) AS tf
                    FROM terms GROUP BY 1, 2),
             df AS (SELECT term, count(DISTINCT doc_id) AS dft
                    FROM terms GROUP BY 1),
             n AS (SELECT count(*) AS n_docs FROM documents),
             scored AS (
               SELECT doc_id, tf.term,
                 floor(tf * ln(n_docs::DOUBLE / dft) * 10000 + 0.5::DOUBLE) / 10000 AS score
               FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
             ranked AS (
               SELECT *, row_number() OVER (PARTITION BY doc_id
                 ORDER BY score DESC, term) AS rn
               FROM scored)
             SELECT doc_id, term, score, rn::BIGINT AS rn
             FROM ranked WHERE rn <= 3 ORDER BY doc_id, rn""")),

    // BM25 ranking (Robertson-Sparck Jones, the Lucene/Elasticsearch
    // default) for a fixed 3-term query over the corpus: tf-idf's
    // production successor — tf saturation (k1 = 1.2) plus document-
    // length normalization (b = 0.75). Determinism: per-term scores
    // carry one ln (irrational mantissa → plain round, the cosine
    // precedent); the per-doc sum is a FIXED-ORDER coalesce chain over
    // the three pivoted term columns, never a float sum in shuffle
    // order; len/avgdl is spelled (len*N)/totLen with exact integer
    // numerators and ONE division, identically in both engines. Scale:
    // the term filter cuts the explode to query-term rows only; df and
    // the corpus totals are broadcast scalars; top-25 by score.
    Q("q_bm25",
      (s, d) => bm25Scores(s, d)
        .orderBy(desc("bm25"), asc("doc_id")).limit(25),
      Some(s"""WITH $bm25Cte
             SELECT doc_id, bm25
             FROM bm ORDER BY bm25 DESC, doc_id LIMIT 25""")),

    // Pivot: day x event-type count matrix with an explicit value list
    // (no extra distinct-discovery pass over the fact table). One
    // shuffle on day; per-type counts are map-side combinable.
    Q("q_pivot",
      (s, d) => Tables.events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("d"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("click", "view", "purchase", "signup", "error"))
        .orderBy("d"),
      Some("""SELECT strftime(ts, '%Y-%m-%d') AS d,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
               SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
               SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error
             FROM events GROUP BY 1 ORDER BY d""")),

    // CUBE over (returnflag, linestatus): all 4 grouping-set levels in
    // one pass (Spark expands grouping sets before the single shuffle).
    // NULLS FIRST pinned — engines disagree on default null order.
    Q("q_cube",
      // r17 (guide §2.3 "aggregate before you shuffle"):
      // PRE-AGGREGATE to (flag, status, partition) base cells in LONG
      // cent-units first — cube's Expand then multiplies the tiny cell
      // table by 4, not the corpus, and the per-row DECIMAL buffer is
      // gone (the q_agg_pricing two-level combine: per-task long sums
      // are corpus-independently bounded, the DECIMAL merge is exact,
      // and SUM/COUNT are associative so cube-over-cells is
      // value-identical to cube-over-rows — a base cell with a REAL
      // null key flows through Expand exactly like its raw rows did).
      // The r16 fan-out is dropped with it: the long-cent map-side
      // combine on the narrow scan beats a corpus fan-out exchange
      // (the q_percentile rule; measured 0.71 -> 0.32 s at sf0.1).
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"),
          spark_partition_id().as("part_id"))
        .agg(sum(floor(col("l_quantity") * 100 + 0.5).cast("long"))
          .as("qty_c"), count(lit(1)).as("cnt"))
        .cube("l_returnflag", "l_linestatus")
        .agg((sum(col("qty_c").cast("decimal(28,0)")) *
          lit(new java.math.BigDecimal("0.01"))).cast("double")
          .as("sum_qty"),
          sum("cnt").as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               count(*)::BIGINT AS n
             FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
             ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // Explicit GROUPING SETS — the general form cube/rollup specialize:
    // per-flag totals and per-status totals in ONE pass over the fact
    // table (separate queries would scan it twice). grouping_id
    // disambiguates which set each output row belongs to.
    Q("q_grouping_sets",
      // r17: same base-cell pre-aggregation (and fan-out drop) as
      // q_cube — Expand runs over (flag, status, partition) long-cent
      // cells, not the corpus (0.70 -> 0.42 s at sf0.1)
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"),
          spark_partition_id().as("part_id"))
        .agg(sum(floor(col("l_quantity") * 100 + 0.5).cast("long"))
          .as("qty_c"))
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg((sum(col("qty_c").cast("decimal(28,0)")) *
          lit(new java.math.BigDecimal("0.01"))).cast("double")
          .as("sum_qty"),
          grouping_id().as("gid"))
        .orderBy(col("gid"),
          col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid
             FROM lineitem
             GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
             ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")),

    // Sorted string aggregation per group: collect_list is
    // partition-order-nondeterministic, so array_sort pins it — the
    // cross-engine-stable way to do listagg.
    Q("q_string_agg",
      (s, d) => Tables.supplier(s, d)
        .join(Tables.nation(s, d),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(array_join(array_sort(collect_list("s_name")), ",").as("names"),
          count(lit(1)).as("n"))
        .orderBy("n_name"),
      Some("""SELECT n_name,
               string_agg(s_name, ',' ORDER BY s_name) AS names,
               count(*)::BIGINT AS n
             FROM supplier JOIN nation ON s_nationkey = n_nationkey
             GROUP BY n_name ORDER BY n_name""")),

    // Fixed-width histogram of order totals: bucket = pure row-local
    // arithmetic (identical IEEE division both engines), then one
    // combinable groupBy — the scale shape for any binning.
    Q("q_histogram",
      (s, d) => Tables.orders(s, d)
        .select(least(floor(col("o_totalprice") / 50000.0), lit(9))
          .cast("int").as("bucket"), col("o_totalprice"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice")).as("total"))
        .orderBy("bucket"),
      Some("""SELECT least(floor(o_totalprice / 50000.0), 9)::INT AS bucket,
               count(*)::BIGINT AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             FROM orders GROUP BY 1 ORDER BY bucket""")),

    // Pearson correlation via exact decimal sums: built-in corr() merges
    // partial moments in partition order (nondeterministic doubles), so
    // instead all six sums are DECIMAL-exact (order-independent) and the
    // formula runs once per group in double with identical structure on
    // both engines. Single map-side-combinable shuffle.
    Q("q_corr_sums",
      (s, d) => {
        // r17 (guide §2.3 narrower types + the q_agg_pricing two-level
        // combine): all six moment sums run in LONG integer units per
        // (group, partition) — zero BigDecimal in the per-row path —
        // and merge through exact DECIMAL. Units: qc/pc are exact cent
        // integers (<= 2-decimal inputs, the established floor(x*100
        // + 0.5) identity), so q*p == (qc*pc)/1e4 etc. The two BIG
        // squares are held as TWO-WORD accumulators (hi = v div 2^24,
        // lo = v mod 2^24 — r16 rejected a single long for syy because
        // pc² alone is ~1.1e14 and a 1 GB scan partition would
        // overflow 2^63): each word's per-partition sum stays under
        // 2^63 up to ~5e11 rows PER TASK, a corpus-independent bound,
        // and level 2 reassembles 2^24·Σhi + Σlo exactly in DECIMAL.
        // sx (<= 5e3/row), sy (<= ~1.1e7/row) and sxx (<= 2.5e7/row)
        // fit plain per-task longs with the same task-size bound.
        val qc = floor(col("l_quantity") * 100 + 0.5).cast("long")
        val pc = floor(col("l_extendedprice") * 100 + 0.5).cast("long")
        val W = 16777216L // 2^24
        // (v - v % W) is an exact multiple of W below 2^53, so the
        // double division yields the exact integer quotient
        def lo(v: Column) = v % W
        def hi(v: Column) = ((v - lo(v)) / W).cast("long")
        def dec(c: Column) = sum(c.cast("decimal(28,0)"))
        def word(h: String, l: String) = dec(col(h)) * W + dec(col(l))
        val cent2 = lit(new java.math.BigDecimal("0.0001"))
        Tables.lineitem(s, d)
          .groupBy(col("l_returnflag"), spark_partition_id().as("part_id"))
          .agg(count(lit(1)).as("cnt"),
            sum(qc).as("sx_c"), sum(pc).as("sy_c"),
            sum(hi(qc * pc)).as("sxy_h"), sum(lo(qc * pc)).as("sxy_l"),
            sum(qc * qc).as("sxx_c2"),
            sum(hi(pc * pc)).as("syy_h"), sum(lo(pc * pc)).as("syy_l"))
          .groupBy("l_returnflag")
          .agg(sum("cnt").as("n"),
            (dec(col("sx_c")) * lit(new java.math.BigDecimal("0.01")))
              .cast("double").as("sx"),
            (dec(col("sy_c")) * lit(new java.math.BigDecimal("0.01")))
              .cast("double").as("sy"),
            (word("sxy_h", "sxy_l") * cent2).cast("double").as("sxy"),
            (dec(col("sxx_c2")) * cent2).cast("double").as("sxx"),
            (word("syy_h", "syy_l") * cent2).cast("double").as("syy"))
          .select(col("l_returnflag"),
            r4((col("n") * col("sxy") - col("sx") * col("sy")) /
              sqrt((col("n") * col("sxx") - col("sx") * col("sx")) *
                (col("n") * col("syy") - col("sy") * col("sy"))))
              .as("corr_qty_price"),
            col("n"))
          .orderBy("l_returnflag")
      },
      Some("""WITH sums AS (
               SELECT l_returnflag, count(*)::BIGINT AS n,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS syy
               FROM lineitem GROUP BY 1)
             SELECT l_returnflag,
               floor((n * sxy - sx * sy) /
                 sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) * 10000 + 0.5::DOUBLE) / 10000
                 AS corr_qty_price,
               n
             FROM sums ORDER BY l_returnflag""")),

    // Range (band) join: orders classified into price bands via a
    // broadcast non-equi join — the tiny side broadcast makes this a
    // BroadcastNestedLoopJoin, the correct plan for interval lookup
    // tables at any fact-table scale.
    Q("q_band_join",
      (s, d) => {
        import s.implicits._
        val bands = Seq(
          ("budget", 0d, 100000d), ("mid", 100000d, 250000d),
          ("high", 250000d, 400000d), ("lux", 400000d, 600000d))
          .toDF("band", "lo", "hi")
        Tables.orders(s, d)
          .join(broadcast(bands),
            col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
          .groupBy("band")
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy("band")
      },
      Some("""SELECT band, count(*)::BIGINT AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             FROM orders
             JOIN (VALUES ('budget', 0, 100000), ('mid', 100000, 250000),
                          ('high', 250000, 400000), ('lux', 400000, 600000))
               AS b(band, lo, hi)
               ON o_totalprice >= lo AND o_totalprice < hi
             GROUP BY band ORDER BY band""")),

    // Intra-document repetition: fraction of word-3-gram occurrences
    // that are repeats of an earlier 3-gram in the SAME doc — the
    // standard boilerplate/spam signal (high repetition = low-quality
    // training text). Row-local arrays only, no shuffle beyond the scan.
    Q("q_repetition",
      // fanoutIfNarrow: per-doc trigram construction + array_distinct
      // is row-local CPU that ran on the one-task documents scan
      (s, d) => Helpers.fanoutIfNarrow(Tables.documents(s, d),
          col("doc_id"))
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n3", greatest(size(col("toks")) - 2, lit(0)))
        .withColumn("grams", when(col("n3") > 0, expr(
          """transform(sequence(0, size(toks) - 3),
            |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"""
            .stripMargin)).otherwise(expr("array()")))
        .select(col("doc_id"), col("n3"),
          when(col("n3") > 0,
            r4((col("n3") - size(array_distinct(col("grams")))) / col("n3")))
            .otherwise(lit(0.0)).as("rep_ratio"))
        .orderBy("doc_id"),
      Some("""WITH t AS (
               SELECT doc_id, string_split(text, ' ') AS toks,
                 greatest(len(string_split(text, ' ')) - 2, 0) AS n3
               FROM documents),
             g AS (
               SELECT doc_id, n3,
                 CASE WHEN n3 > 0 THEN
                   (SELECT list(toks[i.i] || ' ' || toks[i.i+1] || ' ' || toks[i.i+2])
                    FROM unnest(range(1, len(toks) - 1)) AS i(i))
                 ELSE [] END AS grams
               FROM t)
             SELECT doc_id, n3,
               CASE WHEN n3 > 0 THEN
                 floor((n3 - len(list_distinct(grams)))::DOUBLE / n3 * 10000 + 0.5::DOUBLE) / 10000
               ELSE 0.0 END AS rep_ratio
             FROM g ORDER BY doc_id""")),

    // Text cleaning: stopword removal — the first stage of every
    // training-data text pipeline. Row-local array ops (one pass, no
    // shuffle); n_removed audits how much was dropped.
    Q("q_text_clean",
      (s, d) => {
        val stop = Helpers.enStopwords
        Tables.documents(s, d)
          .withColumn("kept", expr(s"filter(split(text, ' '), x -> x NOT IN $stop)"))
          .select(col("doc_id"),
            array_join(col("kept"), " ").as("cleaned"),
            (size(split(col("text"), " ")) - size(col("kept"))).as("n_removed"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
               array_to_string(list_filter(string_split(text, ' '),
                 x -> x NOT IN ('the', 'a', 'of', 'to', 'in', 'and')), ' ') AS cleaned,
               (len(string_split(text, ' ')) -
                len(list_filter(string_split(text, ' '),
                  x -> x NOT IN ('the', 'a', 'of', 'to', 'in', 'and'))))::INT AS n_removed
             FROM documents ORDER BY doc_id""")),

    // End-to-end dedup materialization: drop every non-canonical member
    // of each near-dup cluster (jaccard >= 0.8 graph, component min is
    // the keeper) — the query that actually SHRINKS the corpus, composing
    // shingle join + connected components + anti-join. The victim set is
    // O(corpus x dup-rate) — corpus-proportional, NOT broadcast-safe at
    // 100 TB — so the anti-join stays an unhinted shuffle join on doc_id;
    // AQE still broadcasts it at runtime while it is genuinely small.
    Q("q_dedup_keep",
      (s, d) => {
        val edges = NorthStarQueries.scoredPairs(s, d)
          .filter(col("jaccard") >= 0.8)
          .select(col("d1"), col("d2"))
        val victims = graft.engine.Graph.connectedComponents(s, edges)
          .filter(col("vertex") =!= col("component"))
          .select(col("vertex").as("doc_id"))
        Tables.documents(s, d)
          .join(victims, Seq("doc_id"), "left_anti")
          .select("doc_id", "source")
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE ${NorthStarQueries.shingleCte},
             sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             p0 AS (
               SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
             pairs AS (
               SELECT d1, d2 FROM p0
               JOIN sizes s1 ON s1.doc_id = d1
               JOIN sizes s2 ON s2.doc_id = d2
               WHERE floor(inter::DOUBLE / (s1.n + s2.n - inter) * 10000 + 0.5::DOUBLE) / 10000 >= 0.8),
             edges AS (SELECT d1, d2 FROM pairs UNION ALL SELECT d2, d1 FROM pairs),
             reach(doc_id, lbl) AS (
               SELECT d1, d1 FROM edges
               UNION
               SELECT e.d2, r.lbl FROM reach r JOIN edges e ON e.d1 = r.doc_id),
             comp AS (SELECT doc_id, min(lbl) AS group_id FROM reach GROUP BY doc_id),
             victims AS (SELECT doc_id FROM comp WHERE doc_id <> group_id)
             SELECT d.doc_id, d.source FROM documents d
             LEFT JOIN victims v ON d.doc_id = v.doc_id
             WHERE v.doc_id IS NULL ORDER BY d.doc_id""")),

    // MinHash estimator quality: for every LSH candidate pair, the
    // signature-agreement estimate (fraction of the 8 slice-minhashes
    // that match) next to the EXACT jaccard computed only for those
    // pairs — the standard estimator-audit query: candidates are few, so
    // the expensive exact intersection runs on a broadcast-pruned subset
    // of the shingle stream, never the full self-join. Rides the
    // memoized [[minhashPairs]] table shared with q_containment.
    Q("q_minhash_est",
      (s, d) => minhashPairs(s, d)
        .select(col("d1"), col("d2"), col("est"),
          r4(col("inter") / (col("n1") + col("n2") - col("inter")))
            .as("jaccard"))
        .orderBy("d1", "d2"),
      Some(s"""WITH ${NorthStarQueries.shingleCteUncapped},
             $minhashPairCte
             SELECT d1, d2, est,
               floor(inter::DOUBLE / (n1 + n2 - inter) * 10000 + 0.5::DOUBLE) / 10000 AS jaccard
             FROM pairs ORDER BY d1, d2""")),

    // Directional containment (overlap coefficient) for the same LSH
    // candidate pairs: inter/min(|A|,|B|) — the signal Jaccard MISSES
    // when a short document is wholly quoted inside a long one (inter
    // = |A| gives overlap 1.0 while jaccard ~ |A|/|B| can be tiny).
    // The standard sub-document-duplication audit next to the
    // symmetric near-dup family; `contained_doc` names the smaller
    // side — the removal candidate under a containment policy.
    // Shares the memoized pair table with q_minhash_est (the
    // winnow/winnow_pairs precedent), so the BENCH pair costs one
    // candidate join, not two.
    Q("q_containment",
      (s, d) => minhashPairs(s, d)
        .select(col("d1"), col("d2"),
          r4(col("inter") / least(col("n1"), col("n2"))).as("overlap"),
          when(col("n1") <= col("n2"), col("d1")).otherwise(col("d2"))
            .as("contained_doc"))
        .orderBy("d1", "d2"),
      Some(s"""WITH ${NorthStarQueries.shingleCteUncapped},
             $minhashPairCte
             SELECT d1, d2,
               floor(inter::DOUBLE / least(n1, n2) * 10000 + 0.5::DOUBLE) / 10000 AS overlap,
               CASE WHEN n1 <= n2 THEN d1 ELSE d2 END AS contained_doc
             FROM pairs ORDER BY d1, d2""")),

    // Latest state per entity (SCD-1 / upsert compaction): the newest
    // event per user wins — the read-side of every changelog. One
    // shuffle on the key; WindowGroupLimit prunes to 1 row per key
    // before the sort completes. Tie-break on event_id pins duplicates.
    Q("q_latest_per_key",
      (s, d) => {
        val w = Window.partitionBy("user_id")
          .orderBy(desc("ts"), desc("event_id"))
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("user_id"), ntz(col("ts")).as("ts"),
            col("event_id"), col("event_type"))
          .orderBy("user_id")
      },
      Some("""WITH r AS (
               SELECT user_id, ts, event_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                   ORDER BY ts DESC, event_id DESC) AS rn
               FROM events)
             SELECT user_id, ts, event_id, event_type
             FROM r WHERE rn = 1 ORDER BY user_id""")),

    // Int8 scalar quantization of embeddings — the storage/bandwidth
    // path for vector corpora (4x smaller than float32, 8x than the
    // double compute form). Row-local arithmetic; floor(x*127+0.5) is
    // IEEE-identical on both engines. The vector is emitted as a csv
    // string: the driver's compare canonicalizes scalars, not arrays.
    Q("q_quantize",
      (s, d) => Tables.embeddings(s, d)
        .select(col("vec_id"),
          array_join(expr(
            """transform(cast(embedding as array<double>),
              |  x -> cast(greatest(-127, least(127, floor(x * 127 + 0.5D))) as int))"""
              .stripMargin), ",").as("q8"))
        .orderBy("vec_id"),
      Some("""SELECT vec_id,
               array_to_string(list_transform(embedding::DOUBLE[],
                 x -> greatest(-127, least(127, floor(x * 127 + 0.5)))::INT), ',') AS q8
             FROM embeddings ORDER BY vec_id""")),

    // Benchmark-contamination check: which documents contain any probe
    // n-gram (the held-out-set leak detector every training pipeline
    // runs). Probes broadcast against the shingle stream — a semi-join
    // on shingle, never a scan-per-probe; at scale the probe set is a
    // table and the same plan holds.
    Q("q_contamination",
      (s, d) => {
        import s.implicits._
        val probes = Seq("key agg row", "batch window spark", "the line sort")
          .toDF("s")
        NorthStarQueries.shingled(s, d)
          .join(broadcast(probes), "s")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_hits"))
          .orderBy("doc_id")
      },
      Some(s"""WITH ${NorthStarQueries.shingleCteUncapped}
             SELECT doc_id, count(*)::BIGINT AS n_hits
             FROM sh
             WHERE s IN ('key agg row', 'batch window spark', 'the line sort')
             GROUP BY doc_id ORDER BY doc_id""")),

    // Approximate distinct count (HyperLogLog++): THE cardinality
    // estimator for 100 TB (exact countDistinct shuffles every value;
    // HLL merges fixed-size sketches). Sketch bit-patterns are
    // engine-specific by design, so the cross-engine contract is: emit
    // the EXACT distinct count (hash-comparable) plus a boolean that
    // bounds each engine's OWN sketch against its own exact value —
    // both engines' sketches do the work, both rows hash-match.
    Q("q_approx_distinct",
      (s, d) => {
        // rsd 0.01: the default 0.05 sketch's ~1-sigma error IS 5%, so a
        // 5% bound on it flips with the data (it did at sf0.1); a 1% rsd
        // sketch keeps the bound safe at any scale factor.
        // Shape: pre-aggregate per user first — mixing countDistinct with
        // other aggregates plans an Expand that multiplies the raw scan,
        // while groupBy(user) is ONE map-side-combined shuffle and leaves
        // the exact count, event total, and HLL sketch (duplicate-
        // insensitive, same estimate) a 1500-row final agg
        val exact = count(lit(1)).cast("double")
        // NO fan-out here (r16, measured 0.67 -> 1.20 s with one): a
        // user_id-keyed fan-out co-clusters with the groupBy, which
        // moves the whole aggregation AFTER the exchange — raw rows
        // ship instead of the map-side-combined 1.5k per-user rows
        Tables.events(s, d)
          .groupBy("user_id").agg(count(lit(1)).as("cnt"))
          .agg(
            count(lit(1)).as("n_exact"),
            sum("cnt").as("n_events"),
            (abs(approx_count_distinct(col("user_id"), 0.01).cast("double") -
              exact) / exact <= lit(0.05)).as("within_5pct"))
      },
      Some("""SELECT count(DISTINCT user_id) AS n_exact,
               count(*) AS n_events,
               (abs(approx_count_distinct(user_id)::DOUBLE
                    - count(DISTINCT user_id)::DOUBLE)
                  / count(DISTINCT user_id)::DOUBLE) <= 0.05 AS within_5pct
             FROM events""")),

    // Approximate percentiles (GK sketch in Spark, t-digest in DuckDB):
    // fixed-size mergeable summary vs exact percentile's full sort —
    // the 100 TB quantile path. Same contract as q_approx_distinct:
    // exact p50/p95/p99 as r4-rounded scalars (interpolated rationals —
    // the floor-round rule) hash-match across engines, and each engine
    // bounds its own sketch within 1% of its own exact value.
    Q("q_approx_percentile",
      (s, d) => {
        // Exact side from the (value, count) histogram via
        // ExactPercentile.fromCounts — the last raw-value exact
        // `percentile` buffer in the registry is gone (near-continuous
        // decimal -> O(distinct) executor heap in one buffer; the
        // histogram form keeps that mass a distributed aggregate,
        // bit-identical interpolation, same oracle). ONE GK sketch for
        // all three quantiles (array form). NOTE: overHistogram's `n`
        // is the NON-NULL count of o_totalprice (a histogram never
        // sees nulls), so the oracle mirrors it as
        // count(o_totalprice), not count(*) — on a nullable column
        // the two diverge.
        def ex(n: String): Column = col(n)
        def ap(i: Int): Column = element_at(col("apa"), i).cast("double")
        def within(i: Int, n: String): Column =
          abs(ap(i) - ex(n)) / ex(n) <= lit(0.01)
        val exact = ExactPercentile.overHistogram(
          Tables.orders(s, d), Seq.empty, "o_totalprice",
          Seq(("ep50", 0.5), ("ep95", 0.95), ("ep99", 0.99)))
        val approx = Tables.orders(s, d).agg(
          percentile_approx(col("o_totalprice"),
            array(lit(0.5), lit(0.95), lit(0.99)), lit(10000)).as("apa"))
        exact.crossJoin(approx) // 1 row x 1 row
          .select(
            r4(ex("ep50")).as("p50"), r4(ex("ep95")).as("p95"),
            r4(ex("ep99")).as("p99"),
            col("n"),
            within(1, "ep50").as("p50_within_1pct"),
            within(2, "ep95").as("p95_within_1pct"),
            within(3, "ep99").as("p99_within_1pct"))
      },
      Some("""SELECT
               floor(quantile_cont(o_totalprice, 0.5) * 10000 + 0.5::DOUBLE) / 10000 AS p50,
               floor(quantile_cont(o_totalprice, 0.95) * 10000 + 0.5::DOUBLE) / 10000 AS p95,
               floor(quantile_cont(o_totalprice, 0.99) * 10000 + 0.5::DOUBLE) / 10000 AS p99,
               count(o_totalprice) AS n,
               abs(approx_quantile(o_totalprice, 0.5) - quantile_cont(o_totalprice, 0.5))
                 / quantile_cont(o_totalprice, 0.5) <= 0.01 AS p50_within_1pct,
               abs(approx_quantile(o_totalprice, 0.95) - quantile_cont(o_totalprice, 0.95))
                 / quantile_cont(o_totalprice, 0.95) <= 0.01 AS p95_within_1pct,
               abs(approx_quantile(o_totalprice, 0.99) - quantile_cont(o_totalprice, 0.99))
                 / quantile_cont(o_totalprice, 0.99) <= 0.01 AS p99_within_1pct
             FROM orders""")),

    // Heavy hitters: exact top-10 corpus tokens (hash-checked) plus the
    // engine-side guarantee of a ONE-PASS, O(k)-state Misra-Gries
    // sketch (functions/Sketches.scala — the repo's custom typed
    // Aggregator, map-side-combined like any built-in): every token
    // with frequency > n/(k+1) must appear among the k=20 candidates,
    // a theorem independent of row order and merge tree, so the
    // boolean is deterministically true in any partitioning. DuckDB
    // 1.0 ships no top-k sketch, so the oracle emits the literal —
    // the sketch-family precedent where only one engine has the
    // sketch (exact columns stay fully hash-compared). The collected
    // candidate map is <= k entries — the bounded-driver-materialization
    // pattern (KMeans centroids precedent).
    Q("q_heavy_hitters",
      (s, d) => {
        import s.implicits._
        val MgK = 20
        val toks = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("w")).as[String]
        val cand = toks
          .select(new graft.functions.MisraGries(MgK).toColumn)
          .head().keySet.toSeq
        val counts = toks.toDF("w").groupBy("w")
          .agg(count(lit(1)).as("cnt"))
        counts.crossJoin(broadcast(counts.agg(sum("cnt").as("n"))))
          .withColumn("sketch_ok",
            !(col("cnt") > col("n") / (MgK + 1.0)) ||
              (if (cand.isEmpty) lit(false) else col("w").isin(cand: _*)))
          .select("w", "cnt", "sketch_ok")
          .orderBy(desc("cnt"), col("w")).limit(10)
      },
      Some("""WITH t AS (SELECT unnest(str_split(text, ' ')) AS w FROM documents),
             c AS (SELECT w, count(*) AS cnt FROM t GROUP BY 1)
             SELECT w, cnt, true AS sketch_ok FROM c
             ORDER BY cnt DESC, w LIMIT 10""")),

    // Weighted sampling without replacement (Efraimidis-Spirakis A-Res,
    // engine/Sampling.scala): sample 20 docs with probability ~ doc
    // length — the importance-weighted corpus-sampling primitive of a
    // training-mix builder. The A-Res key ln(u)/w is ROW-LOCAL
    // (deterministic 16-bit md5 u, exactly representable over 2^16, so
    // DuckDB replays the identical ln) and selection is top-k:
    // TakeOrderedAndProject, zero corpus shuffles at any size
    // (plan-pinned). Keys are TINY NEGATIVE doubles (top keys at
    // sf0.01 sit at -1e-6..-1e-4) that round to ZERO — exactly the
    // signed-zero divergence: DuckDB's C round(-1.7e-5, 4) emits -0.0
    // while Spark's BigDecimal round emits +0.0 (CORRECTNESS_r09 hash
    // fail). So the key is r4-FLOORED on both engines — floor output
    // is an integer-valued double, never -0.0 (x*1e4+0.5 = -0.0 is
    // impossible: -0.5 + 0.5 = +0.0 in IEEE round-to-nearest).
    Q("q_weighted_sample",
      (s, d) => graft.engine.Sampling.weightedTopK(
          Tables.documents(s, d).select(col("doc_id"), col("source"),
            greatest(col("n_chars"), lit(1)).as("wt")),
          col("doc_id"), col("wt"), 20)
        .select(col("doc_id"), col("source"), col("wt"),
          r4(col("es_key")).as("es_key")),
      Some(s"""WITH t AS (SELECT doc_id, source,
               greatest(n_chars, 1) AS wt,
               ln((${hex4("md5(doc_id::VARCHAR)")} + 1)::DOUBLE
                   / 65536.0::DOUBLE)
                 / greatest(n_chars, 1)::DOUBLE AS k
             FROM documents)
             SELECT doc_id, source, wt,
               floor(k * 10000 + 0.5::DOUBLE) / 10000 AS es_key
             FROM t ORDER BY k DESC, doc_id LIMIT 20""")),

    // Stratified weighted sampling: 5 docs PER SOURCE by the same A-Res
    // key — per-domain weighted quotas, the training-mix builder's
    // per-source counterpart of q_weighted_sample (q_sample_group is
    // its unweighted ancestor). One shuffle on source; WindowGroupLimit
    // prunes each partition to k rows pre-sort, so per-source state is
    // O(k) at any corpus size. Same r4-floor signed-zero rule as
    // q_weighted_sample (tiny negative keys round to -0.0 in DuckDB).
    Q("q_weighted_strata",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            greatest(col("n_chars"), lit(1)).as("wt"))
          .withColumn("es_key",
            graft.engine.Sampling.esKey(col("doc_id"), col("wt")))
        val w = Window.partitionBy("source")
          .orderBy(col("es_key").desc, col("doc_id").asc)
        base.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("source"), col("doc_id"), col("wt"),
            r4(col("es_key")).as("es_key"))
          .orderBy("source", "doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, source,
               greatest(n_chars, 1) AS wt,
               ln((${hex4("md5(doc_id::VARCHAR)")} + 1)::DOUBLE
                   / 65536.0::DOUBLE)
                 / greatest(n_chars, 1)::DOUBLE AS k
             FROM documents),
             r AS (SELECT source, doc_id, wt, k,
               row_number() OVER (PARTITION BY source
                 ORDER BY k DESC, doc_id) AS rn FROM t)
             SELECT source, doc_id, wt,
               floor(k * 10000 + 0.5::DOUBLE) / 10000 AS es_key
             FROM r WHERE rn <= 5 ORDER BY source, doc_id""")),

    // Count-Min sketch audit (engine/Cms.scala, Cormode-Muthukrishnan):
    // build the 4x256 sketch from the word-count aggregate (CMS is
    // linear, so folding counts in equals streaming every token — the
    // corpus is scanned ONCE and only the vocab fans out x depth), then
    // audit the top-20 tokens: estimate = min over rows of the hashed
    // bucket's count, overcount = est - true (>= 0 ALWAYS - collisions
    // only add; the e^-depth error bound is property-tested in
    // CmsSpec). md5-derived buckets replay exactly in DuckDB, so
    // estimates hash-match. The sketch is 1024 rows at ANY corpus size
    // (broadcast), the probe side 20 rows.
    Q("q_cms_err",
      (s, d) => {
        val counts = wordCounts(s, d)
        val sketch = graft.engine.Cms.build(counts, "w", "true_n")
        val top = counts.orderBy(col("true_n").desc, col("w").asc).limit(20)
        graft.engine.Cms.estimate(sketch, top, "w")
          .select(col("w"), col("true_n"), col("est_n"),
            (col("est_n") - col("true_n")).as("overcount"))
          .orderBy(col("true_n").desc, col("w").asc)
      },
      Some(s"""WITH t AS (SELECT unnest(string_split(text, ' ')) AS w
               FROM documents),
             c AS MATERIALIZED (SELECT w, count(*)::BIGINT AS true_n
               FROM t WHERE w <> '' GROUP BY w),
             cms AS MATERIALIZED (
               SELECT r, ${hex4("md5(r::VARCHAR || ':' || w)")} % 256 AS b,
                 sum(true_n)::BIGINT AS cnt
               FROM c, LATERAL unnest(range(0, 4)) AS u(r)
               GROUP BY 1, 2),
             tp AS MATERIALIZED (SELECT w, true_n FROM c
               ORDER BY true_n DESC, w LIMIT 20),
             p AS (SELECT w, true_n, r,
                 ${hex4("md5(r::VARCHAR || ':' || w)")} % 256 AS b
               FROM tp, LATERAL unnest(range(0, 4)) AS u(r))
             SELECT p.w AS w, p.true_n AS true_n,
               min(cms.cnt)::BIGINT AS est_n,
               (min(cms.cnt) - p.true_n)::BIGINT AS overcount
             FROM p JOIN cms USING (r, b)
             GROUP BY p.w, p.true_n
             ORDER BY true_n DESC, w"""))
  )
}
