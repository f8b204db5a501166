package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Fifth query wave: corpus-curation policy operators — the decision
  * layer a training-data pipeline runs on top of the measurement
  * operators (quality/dedup/ANN families). Each one turns per-document
  * or per-source statistics into a keep/weight/remove decision:
  *
  *  - q_gopher: the Gopher rule-based document filter (Rae et al. 2021,
  *    public) — row-local flags, zero shuffles.
  *  - q_mix_weights: temperature-based source mixing (the GPT-3/Pile
  *    alpha-sampling shape) — weights from per-source token mass.
  *  - q_dsir: hashed n-gram importance-resampling score (Xie et al.
  *    2023, public) — log-likelihood ratio of a target slice vs the raw
  *    corpus over hashed unigram buckets.
  *  - q_mad_outlier: robust (median/MAD) outlier screening on the event
  *    stream — the numeric-field analogue of the text quality filters.
  *  - q_semdedup: SemDeDup (Abbas et al. 2023, public) — within-cluster
  *    semantic dedup keeping the centroid-nearest representative, on the
  *    shared trained-IVF assignment.
  *
  * Same determinism contract as every other group (Helpers.scala + the
  * BASELINE.md audits): total ORDER BY, rational scores through r4
  * floor-rounding, order-independent sums through DECIMAL, deterministic
  * tie-breaks.
  *
  * Scale notes inline; the common shape is row-local work + one or two
  * shuffles on a natural bounded key (source, bucket, event_type, IVF
  * cell). The only pair-generating path (q_semdedup) is blocked on the
  * trained cell key — SemDeDup's own design: cluster count grows with
  * the corpus, cell size stays bounded.
  */
object CurationQueries {

  private def r4(c: Column): Column = Helpers.r4(c)

  /** Gopher-rule thresholds (document-level heuristics; the published
    * rules use 50..100k words, mean word length 3..10, >=80% words with
    * an alphabetic char, >=2 stopwords — the word floor is lowered to 30
    * so both outcomes occur on the synthetic corpus). */
  private val GopherMinWords = 30
  private val GopherMaxWords = 100000
  private val GopherMinMwl = 3.0
  private val GopherMaxMwl = 10.0
  private val GopherMinAlpha = 0.8
  private val GopherMinStop = 2

  /** Screen-B (q_kappa) thresholds — the second, independent quality
    * lens: a word floor, a stopword-density floor (n_stop/n_words >=
    * 1/[[KappaBStopDen]], spelled as an integer cross-multiplication),
    * and a mean-word-length ceiling of [[KappaBMwl10]]/10 (again
    * cross-multiplied — never a 0.1-step double literal). */
  private val KappaBMinWords = 20
  private val KappaBStopDen = 20
  private val KappaBMwl10 = 85

  /** Per-document Gopher feature columns (doc_id, n_words, sum_len,
    * n_alpha, n_stop, mean_word_len, alpha_frac) — the shared input of
    * q_gopher and q_kappa; [[gopherCte]] is its oracle mirror ending in
    * the CTE `g` with the same columns. Row-local array ops over the
    * split text (no explode), zero shuffles at any corpus size; the
    * rational ratios go through r4 so both engines screen on identical
    * values. */
  private def gopherFeatures(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame =
    // fanoutIfNarrow (r16): the feature lambdas (aggregate/filter/rlike
    // over the word array) are row-local CPU that ran on the one-task
    // single-row-group scan; fan out to core width (no-op on wide
    // scans). Both consumers (q_gopher, q_kappa) inherit it.
    Helpers.fanoutIfNarrow(Tables.documents(s, d), col("doc_id"))
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_words", size(col("ws")).cast("long"))
      .withColumn("sum_len",
        aggregate(col("ws"), lit(0L), (acc, w) => acc + length(w)))
      .withColumn("n_alpha",
        size(filter(col("ws"), w => w.rlike("[a-z]"))).cast("long"))
      .withColumn("n_stop",
        size(filter(col("ws"),
          w => w.isin("the", "a", "of", "to", "in", "and"))).cast("long"))
      .withColumn("mean_word_len",
        r4(col("sum_len").cast("double") / col("n_words")))
      .withColumn("alpha_frac",
        r4(col("n_alpha").cast("double") / col("n_words")))

  /** The combined Gopher keep decision over [[gopherFeatures]] columns;
    * [[gopherKeepSql]] is the same predicate in the oracle dialect. */
  private def gopherKeep: Column =
    col("n_words") >= GopherMinWords &&
      col("n_words") <= GopherMaxWords &&
      col("mean_word_len") >= GopherMinMwl &&
      col("mean_word_len") <= GopherMaxMwl &&
      col("alpha_frac") >= GopherMinAlpha &&
      col("n_stop") >= GopherMinStop

  private val gopherKeepSql: String =
    s"""n_words >= $GopherMinWords AND n_words <= $GopherMaxWords
                AND mean_word_len >= $GopherMinMwl AND mean_word_len <= $GopherMaxMwl
                AND alpha_frac >= $GopherMinAlpha AND n_stop >= $GopherMinStop"""

  private val gopherCte: String =
    """w AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents),
             f AS (SELECT doc_id,
                     CAST(len(ws) AS BIGINT) AS n_words,
                     CAST(list_sum(list_transform(ws, x -> len(x))) AS BIGINT) AS sum_len,
                     CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
                     CAST(len(list_filter(ws, x -> list_contains(['the','a','of','to','in','and'], x))) AS BIGINT) AS n_stop
                   FROM w),
             g AS (SELECT doc_id, n_words, sum_len, n_stop,
                     floor(sum_len::DOUBLE / n_words * 10000 + 0.5::DOUBLE) / 10000 AS mean_word_len,
                     floor(n_alpha::DOUBLE / n_words * 10000 + 0.5::DOUBLE) / 10000 AS alpha_frac
                   FROM f)"""

  /** DSIR hashed-feature bucket count (importance features are hashed
    * unigrams; 256 buckets keep the model table broadcast-trivial at any
    * corpus size — the model is O(buckets), never O(vocab)). */
  private val DsirBuckets = 256

  /** SemDeDup cosine threshold: pairs at or above it inside one cell are
    * semantic duplicates; the member farther from the cell centroid is
    * removed (tie -> higher vec_id removed). */
  private val SemDedupTau = 0.35

  val all: Seq[Q] = Seq(

    // Gopher rule-based quality filter: per-document flags from the
    // published heuristic set — word count in range, mean word length in
    // range, fraction of words containing an alphabetic char, stopword
    // floor — and the combined keep decision. Entirely ROW-LOCAL (array
    // ops over the split text, no explode), so it scales with zero
    // shuffles at any corpus size; comparisons run on the r4-rounded
    // rationals so both engines decide flags on identical values.
    Q("q_gopher",
      (s, d) => gopherFeatures(s, d)
        .withColumn("keep", gopherKeep)
        .select("doc_id", "n_words", "mean_word_len", "alpha_frac",
          "n_stop", "keep")
        .orderBy("doc_id"),
      Some(s"""WITH $gopherCte
             SELECT doc_id, n_words, mean_word_len, alpha_frac, n_stop,
               ($gopherKeepSql) AS keep
             FROM g ORDER BY doc_id""")),

    // Screen-agreement audit (Cohen's kappa) between two INDEPENDENT
    // quality lenses — the Gopher rule set (screen A) and a
    // stopword-density/word-length prose screen (screen B, integer
    // cross-multiplications only). Running two cheap filters and
    // checking their chance-corrected agreement is how a pipeline
    // decides whether a second screen adds signal or just noise: kappa
    // ~1 means redundant, ~0 means uncorrelated, negative means
    // systematic disagreement. Determinism: both screens decide on
    // integers or r4-rounded rationals (the q_gopher contract); the
    // 2x2 contingency counts are exact longs; po/kappa are single
    // divisions of exact integer numerators, r4-floored (kappa can be
    // negative — floor(x*1e4+0.5) rounds identically in both engines
    // and cannot emit -0.0). Scale: row-local flags then one global
    // 5-field count aggregation — map-side combined, one row out.
    Q("q_kappa",
      (s, d) => {
        val flagged = gopherFeatures(s, d)
          .withColumn("a", gopherKeep.cast("int").cast("long"))
          .withColumn("b",
            (col("n_words") >= KappaBMinWords &&
              col("n_stop") * KappaBStopDen >= col("n_words") &&
              col("sum_len") * 10 <= col("n_words") * KappaBMwl10)
              .cast("int").cast("long"))
        flagged.agg(
            count(lit(1)).as("n"),
            sum(col("a") * col("b")).as("n11"),
            sum(col("a") * (lit(1L) - col("b"))).as("n10"),
            sum((lit(1L) - col("a")) * col("b")).as("n01"),
            sum((lit(1L) - col("a")) * (lit(1L) - col("b"))).as("n00"))
          .withColumn("agree", col("n11") + col("n00"))
          .withColumn("pe_num",
            (col("n11") + col("n10")) * (col("n11") + col("n01")) +
              (col("n01") + col("n00")) * (col("n10") + col("n00")))
          .withColumn("po", r4(col("agree").cast("double") / col("n")))
          .withColumn("kappa",
            when(col("n") * col("n") === col("pe_num"), lit(0.0))
              .otherwise(r4(
                (col("n") * col("agree") - col("pe_num")).cast("double") /
                  (col("n") * col("n") - col("pe_num")).cast("double"))))
          .select("n", "n11", "n10", "n01", "n00", "po", "kappa")
      },
      Some(s"""WITH $gopherCte,
             s AS (SELECT
                 CASE WHEN $gopherKeepSql THEN 1 ELSE 0 END AS a,
                 CASE WHEN n_words >= $KappaBMinWords
                   AND n_stop * $KappaBStopDen >= n_words
                   AND sum_len * 10 <= n_words * $KappaBMwl10
                   THEN 1 ELSE 0 END AS b
               FROM g),
             c AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(a * b) AS BIGINT) AS n11,
                 CAST(sum(a * (1 - b)) AS BIGINT) AS n10,
                 CAST(sum((1 - a) * b) AS BIGINT) AS n01,
                 CAST(sum((1 - a) * (1 - b)) AS BIGINT) AS n00
               FROM s),
             e AS (SELECT *, n11 + n00 AS agree,
                 (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00) AS pe_num
               FROM c)
             SELECT n, n11, n10, n01, n00,
               floor(agree::DOUBLE / n * 10000 + 0.5::DOUBLE) / 10000 AS po,
               CASE WHEN n * n = pe_num THEN 0.0::DOUBLE
                 ELSE floor((n * agree - pe_num)::DOUBLE
                   / (n * n - pe_num)::DOUBLE * 10000 + 0.5::DOUBLE) / 10000
                 END AS kappa
             FROM e""")),

    // Temperature-based source mixing weights: per-source sampling share
    // proportional to (token mass)^0.5 — the alpha-sampling scheme used
    // for multi-source/multi-lingual training mixes (downweights huge
    // sources, upweights small ones), plus the implied epochs-per-source
    // at a one-total-token-budget. Token counting is row-local; ONE
    // map-side-combinable shuffle on source; the weight normalization
    // runs on the ~|sources| aggregate (a global window over the tiny
    // aggregate table, never over rows — the q_ntile precedent). sqrt's
    // irrational output is floor-rounded at 1e-6 into DECIMAL so the
    // normalizing sum is order-independent on both engines.
    Q("q_mix_weights",
      (s, d) => {
        val bySrc = Tables.documents(s, d)
          .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
          .withColumn("w6",
            (floor(sqrt(col("n_tokens").cast("double")) * 1000000 + 0.5) / 1000000)
              .cast("decimal(18,6)"))
        // normalizer as a global window over the ~|sources| AGGREGATE
        // (the q_ntile pattern: the single-partition exchange sits above
        // an aggregate, never over rows) — one corpus scan total, where a
        // one-row-aggregate cross join would duplicate the subtree and
        // scan the corpus twice
        val all = Window.partitionBy()
        bySrc
          .withColumn("sw", sum(col("w6")).over(all).cast("double"))
          .withColumn("tt", sum(col("n_tokens")).over(all))
          .withColumn("share", r4(col("w6").cast("double") / col("sw")))
          .withColumn("epochs",
            r4(col("share") * col("tt") / col("n_tokens")))
          .select("source", "n_docs", "n_tokens", "share", "epochs")
          .orderBy("source")
      },
      Some("""WITH t AS (SELECT source, count(*) AS n_docs,
               CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS n_tokens
               FROM documents GROUP BY 1),
             w AS (SELECT *,
               CAST(floor(sqrt(n_tokens::DOUBLE) * 1000000 + 0.5::DOUBLE) / 1000000
                 AS DECIMAL(18,6)) AS w6 FROM t),
             g AS (SELECT CAST(SUM(w6) AS DOUBLE) AS sw,
                          CAST(SUM(n_tokens) AS BIGINT) AS tt FROM w),
             sh AS (SELECT source, n_docs, n_tokens,
               floor(CAST(w6 AS DOUBLE) / sw * 10000 + 0.5::DOUBLE) / 10000 AS share, tt
               FROM w CROSS JOIN g)
             SELECT source, n_docs, n_tokens, share,
               floor(share * tt / n_tokens * 10000 + 0.5::DOUBLE) / 10000 AS epochs
             FROM sh ORDER BY source""")),

    // DSIR importance-resampling score: rank raw documents by how much
    // they look like a target slice (lang='en' here) under a hashed
    // unigram bag-of-words model — per-bucket log-likelihood ratio
    // ln(p_target/p_raw) with add-one smoothing, summed per document
    // weighted by the document's bucket counts, normalized by length.
    // The model is O(buckets)=256 rows regardless of corpus size (AQE
    // broadcasts it); doc-side work is one shuffle on (doc_id, bucket)
    // and one on doc_id. Per-bucket LLRs are floor-rounded at 1e-6 into
    // DECIMAL so the per-doc weighted sum is order-independent.
    Q("q_dsir",
      (s, d) => {
        // fanoutIfNarrow: the explode + per-token md5 otherwise runs on
        // the one-task scan (r16)
        val toks = Helpers.fanoutIfNarrow(Tables.documents(s, d),
            col("doc_id"))
          .select(col("doc_id"), col("lang"),
            explode(split(col("text"), " ")).as("w"))
          .withColumn("b", Helpers.hash16(col("w")) % DsirBuckets)
        // ONE pass over the token stream (r16): group by (doc, lang, b)
        // — lang is functionally dependent on doc_id, so db's groups are
        // unchanged — and derive rb/tb by RE-AGGREGATING this table.
        // The old form re-exploded (and re-md5'ed) the corpus three
        // times. Eager localCheckpoint (the GraphMetrics.pagerank
        // materialization pattern, per query invocation — nothing
        // persists across runs) is what makes the sharing REAL: the
        // three consumers prune different columns, so their exchange
        // subtrees canonicalize differently and AQE's exchange reuse
        // never fires on them (measured: 3x the explode+agg CPU).
        // Checkpoint partitioning (hash(doc_id) from the fan-out, which
        // subset-satisfies this grouping) is preserved, so nd's
        // doc-keyed re-aggregation still plans no exchange.
        val dlb = toks.groupBy("doc_id", "lang", "b")
          .agg(count(lit(1)).as("c"))
          .localCheckpoint(true)
        val db = dlb.select("doc_id", "b", "c")
        val nd = db.groupBy("doc_id").agg(sum("c").as("n_tok"))
        val rb = dlb.groupBy("b").agg(sum("c").as("cr"))
        val tb = dlb.filter(col("lang") === "en")
          .groupBy("b").agg(sum("c").as("ct"))
        // corpus totals as a global window over the 256-row MODEL table
        // (single-partition exchange above an aggregate, the q_ntile
        // pattern) — a one-row-aggregate cross join would duplicate the
        // whole token-scan subtree and read the corpus twice
        val all = Window.partitionBy()
        val model = rb.join(tb, Seq("b"), "left")
          .withColumn("ct", coalesce(col("ct"), lit(0L)))
          .withColumn("rt", sum(col("cr")).over(all))
          .withColumn("tt", sum(col("ct")).over(all))
          // LONG micro-units instead of DECIMAL(18,6) — the floored LLR
          // is an exact integer and per-doc |sum| < 2^53, so
          // sum_long.cast(double)/1e6 reproduces the decimal-sum cast
          // bit-for-bit without BigDecimal adds (the q_lm_score r16
          // treatment)
          .withColumn("llr",
            floor(log(((col("ct") + 1).cast("double") * (col("rt") + DsirBuckets).cast("double")) /
              ((col("cr") + 1).cast("double") * (col("tt") + DsirBuckets).cast("double"))) * 1000000 + 0.5)
              .cast("long"))
          .select("b", "llr")
        db.join(model, "b")
          .groupBy("doc_id")
          .agg((sum(col("llr") * col("c")).cast("double") / 1000000.0).as("sc"))
          .join(nd, "doc_id")
          .withColumn("dsir_score", r4(col("sc") / col("n_tok")))
          .select("doc_id", "n_tok", "dsir_score")
          .orderBy(desc("dsir_score"), asc("doc_id"))
          .limit(25)
      },
      Some(s"""WITH toks AS (SELECT doc_id, lang, unnest(str_split(text, ' ')) AS w
               FROM documents),
             tb0 AS (SELECT doc_id, lang, ${Helpers.hex4("md5(w)")} % $DsirBuckets AS b
               FROM toks),
             db AS (SELECT doc_id, b, count(*) AS c FROM tb0 GROUP BY 1, 2),
             nd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok FROM db GROUP BY 1),
             rb AS (SELECT b, count(*) AS cr FROM tb0 GROUP BY 1),
             tcb AS (SELECT b, count(*) AS ct FROM tb0 WHERE lang = 'en' GROUP BY 1),
             j AS (SELECT rb.b, cr, coalesce(ct, 0) AS ct
                   FROM rb LEFT JOIN tcb ON rb.b = tcb.b),
             g AS (SELECT CAST(sum(cr) AS BIGINT) AS rt,
                          CAST(sum(ct) AS BIGINT) AS tt FROM j),
             l AS (SELECT b,
               CAST(floor(ln(((ct + 1)::DOUBLE * (rt + $DsirBuckets)::DOUBLE) /
                 ((cr + 1)::DOUBLE * (tt + $DsirBuckets)::DOUBLE)) * 1000000 + 0.5::DOUBLE) / 1000000
                 AS DECIMAL(18,6)) AS llr
               FROM j CROSS JOIN g),
             sc AS (SELECT db.doc_id, CAST(sum(llr * c) AS DOUBLE) AS s
                    FROM db JOIN l ON db.b = l.b GROUP BY 1)
             SELECT sc.doc_id, n_tok,
               floor(s / n_tok * 10000 + 0.5::DOUBLE) / 10000 AS dsir_score
             FROM sc JOIN nd ON sc.doc_id = nd.doc_id
             ORDER BY dsir_score DESC, sc.doc_id LIMIT 25""")),

    // Robust outlier screening on the event stream: per event type,
    // median and MAD (median absolute deviation), then the count of
    // events whose robust z-score 0.6745*(v-med)/mad exceeds 3.5 — the
    // standard Iglewicz-Hoaglin rule, immune to the outliers it hunts
    // (unlike the q_zscore mean/stddev screen). BOTH medians come from
    // value HISTOGRAMS via ExactPercentile (the adev histogram derives
    // from the value histogram arithmetically — same doubles, counts
    // re-keyed on the folded |v-med| value), so no per-group
    // value→count aggregation buffer exists anywhere: on a continuous
    // domain at 100 TB with ~5 event types, that buffer — not the
    // shuffle — was the scale hazard. The raw stream is touched only by
    // the final row-local screen against the broadcastable per-type
    // stats. Comparisons run on full-precision medians (identical
    // interpolation inputs on both engines), outputs r4-rounded.
    Q("q_mad_outlier",
      (s, d) => {
        val e = Tables.events(s, d).select("event_type", "value")
        // r17 (guide §2.4/§8 "decide with small rows"): ONE corpus
        // aggregation builds the (type, value, cnt) histogram —
        // INCLUDING the null-value group, which only the total count
        // consumes — and every later phase (median, deviation
        // histogram, MAD, the outlier screen itself) runs over the
        // histogram, never the raw stream. The old form re-scanned the
        // corpus for the final screen and broadcast-joined stats onto
        // every raw row; robz depends only on (value, med, mad), so
        // weighting each distinct value's screen by cnt reproduces the
        // per-row sums and maxes EXACTLY (null values: robz is null,
        // dropped by max and counted 0 by the outlier predicate — same
        // as before). localCheckpoint because the three consumers prune
        // different columns, so AQE exchange reuse never fires on them
        // (the q_dsir r16 finding) and the corpus scan+agg would run
        // three times; freed by the ContextCleaner when the plan is GC'd.
        val histAll = e.groupBy("event_type", "value")
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint(true)
        // median/MAD ranks exclude NULL values (percentile/
        // quantile_cont semantics — a null row must not shift the ranks)
        val hist = histAll.filter(col("value").isNotNull)
        val med = ExactPercentile.fromCounts(hist, Seq("event_type"),
            "value", "cnt", Seq(("med", 0.5)))
          .select("event_type", "med")
        val devHist = hist.join(med, "event_type")
          .withColumn("adev", abs(col("value") - col("med")))
          .groupBy("event_type", "adev").agg(sum("cnt").as("cnt"))
        val mad = ExactPercentile.fromCounts(devHist, Seq("event_type"),
            "adev", "cnt", Seq(("mad", 0.5)))
          .select("event_type", "mad")
        // the screen runs over histAll (null group INCLUDED) so n =
        // sum(cnt) counts every row of the type like the old raw-stream
        // count(lit(1)) did; a null value's robz is null — skipped by
        // max and counted 0 by the outlier predicate, exactly as before
        histAll.join(broadcast(med), "event_type")
          .join(broadcast(mad), "event_type")
          .withColumn("robz",
            lit(0.6745) * (col("value") - col("med")) / col("mad"))
          .groupBy("event_type")
          .agg(sum(col("cnt")).as("n"),
            max(col("med")).as("m"), max(col("mad")).as("md"),
            sum(when(abs(col("robz")) > 3.5, col("cnt")).otherwise(0L))
              .as("n_outliers"),
            max(col("robz")).as("mz"))
          .select(col("event_type"), col("n"), r4(col("m")).as("med"),
            r4(col("md")).as("mad"), col("n_outliers"),
            r4(col("mz")).as("max_robz"))
          .orderBy("event_type")
      },
      Some("""WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
               FROM events GROUP BY 1),
             dev AS (SELECT e.event_type, e.value, med.med,
                       abs(e.value - med.med) AS adev
                     FROM events e JOIN med ON e.event_type = med.event_type),
             st AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
                    FROM dev GROUP BY 1),
             z AS (SELECT dev.event_type, dev.med, st.mad,
                     0.6745 * (dev.value - dev.med) / st.mad AS robz
                   FROM dev JOIN st ON dev.event_type = st.event_type)
             SELECT event_type, count(*) AS n,
               floor(max(med) * 10000 + 0.5::DOUBLE) / 10000 AS med,
               floor(max(mad) * 10000 + 0.5::DOUBLE) / 10000 AS mad,
               CAST(sum(CASE WHEN abs(robz) > 3.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
               floor(max(robz) * 10000 + 0.5::DOUBLE) / 10000 AS max_robz
             FROM z GROUP BY event_type ORDER BY event_type""")),

    // SemDeDup: semantic dedup within each trained IVF cell — pairs at
    // cosine >= tau are semantic duplicates and the member FARTHER from
    // the cell centroid is removed (tie -> higher vec_id), keeping the
    // most prototypical representative. Reports per-cell corpus size,
    // removals, and keep rate. Rides the SHARED trained-IVF assignment
    // (memoized with the rest of the ANN family); the pair join is
    // blocked on the cell key — SemDeDup's own scaling argument: cluster
    // count grows with the corpus, per-cell membership stays bounded, so
    // the quadratic term never sees N.
    Q("q_semdedup",
      (s, d) => {
        val cents = NorthStarQueries.trainedCentroids(s, d)
          .select(col("cell"), col("c_emb"), col("c_nrm"))
        val a = NorthStarQueries.ivfAssigned(s, d)
          .join(broadcast(cents), "cell")
          .withColumn("csim",
            round(expr("graft_dot(emb, c_emb)") / (col("nrm") * col("c_nrm")), 4))
          .select("vec_id", "emb", "nrm", "cell", "csim")
        val l = a.select(col("cell"), col("vec_id").as("d1"),
          col("emb").as("e1"), col("nrm").as("n1"), col("csim").as("c1"))
        val r = a.select(col("cell"), col("vec_id").as("d2"),
          col("emb").as("e2"), col("nrm").as("n2"), col("csim").as("c2"))
        val removed = l.join(r, Seq("cell"))
          .filter(col("d1") < col("d2"))
          .withColumn("sim",
            round(expr("graft_dot(e1, e2)") / (col("n1") * col("n2")), 4))
          .filter(col("sim") >= SemDedupTau)
          .select(col("cell"),
            when(col("c1") < col("c2"), col("d1"))
              .when(col("c1") > col("c2"), col("d2"))
              .otherwise(greatest(col("d1"), col("d2"))).as("rm"))
          .distinct()
          .groupBy("cell").agg(count(lit(1)).as("n_removed"))
        a.groupBy("cell").agg(count(lit(1)).as("n_vectors"))
          .join(removed, Seq("cell"), "left")
          .withColumn("n_removed", coalesce(col("n_removed"), lit(0L)))
          .withColumn("keep_rate",
            r4((col("n_vectors") - col("n_removed")).cast("double") / col("n_vectors")))
          .select("cell", "n_vectors", "n_removed", "keep_rate")
          .orderBy("cell")
      },
      Some(s"""WITH ${NorthStarQueries.embCte},
             ${NorthStarQueries.kmeansCte},
             scored AS (
               SELECT n.vec_id, n.e, n.nrm, c.cell,
                 round(list_dot_product(n.e, ce) / (n.nrm * cn), 4) AS csim
               FROM n CROSS JOIN c),
             asn AS (
               SELECT vec_id, e, nrm, cell, csim FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY csim DESC, cell) AS rn FROM scored)
               WHERE rn = 1),
             rm0 AS (
               SELECT a.cell,
                 CASE WHEN a.csim < b.csim THEN a.vec_id
                      WHEN a.csim > b.csim THEN b.vec_id
                      ELSE greatest(a.vec_id, b.vec_id) END AS rm
               FROM asn a JOIN asn b ON a.cell = b.cell AND a.vec_id < b.vec_id
               WHERE round(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 4) >= $SemDedupTau),
             rmc AS (SELECT cell, count(*) AS n_removed
                     FROM (SELECT DISTINCT cell, rm FROM rm0) GROUP BY cell),
             nv AS (SELECT cell, count(*) AS n_vectors FROM asn GROUP BY cell)
             SELECT nv.cell, n_vectors,
               CAST(coalesce(n_removed, 0) AS BIGINT) AS n_removed,
               floor((n_vectors - coalesce(n_removed, 0))::DOUBLE / n_vectors
                 * 10000 + 0.5::DOUBLE) / 10000 AS keep_rate
             FROM nv LEFT JOIN rmc ON nv.cell = rmc.cell ORDER BY nv.cell""")),

    // PII / pattern scrub audit (engine/PiiScrub.scala): per-source
    // match counts for each PII class (emails, credential-shaped keys,
    // phones, IPv4s), documents flagged, and the post-redaction
    // character mass. Row-local regexp_count/regexp_replace — one map
    // pass, zero shuffles before the final keyed aggregate. The
    // synthetic corpus legitimately contains ZERO matches: all-zero
    // counts with clean_chars == original mass is the CORRECT,
    // hash-checked answer here (the positive-match behavior is pinned
    // by PiiScrubSpec's self-injected fixtures — the MultimodalSpec
    // pattern). Patterns are Java-and-RE2 compatible and the redaction
    // chain applies in the same fixed order on both engines.
    Q("q_pii_scrub",
      (s, d) => {
        import graft.engine.PiiScrub
        // fanoutIfNarrow: the regex battery is row-local CPU on the
        // one-task scan; integer sums keep the result invariant
        PiiScrub.annotate(
          Helpers.fanoutIfNarrow(Tables.documents(s, d), col("doc_id")),
          "text")
          .groupBy("source").agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_email").cast("long")).as("emails"),
            sum(col("n_key").cast("long")).as("keys"),
            sum(col("n_phone").cast("long")).as("phones"),
            sum(col("n_ip").cast("long")).as("ips"),
            sum(when(col("pii_total") > 0, 1L).otherwise(0L))
              .as("docs_flagged"),
            sum(length(col("text_clean")).cast("long")).as("clean_chars"))
          .orderBy("source")
      },
      Some(s"""WITH ann AS (
               SELECT source,
                 len(regexp_extract_all(text, '${graft.engine.PiiScrub.Email}'))
                   AS n_email,
                 len(regexp_extract_all(text, '${graft.engine.PiiScrub.SecretKey}'))
                   AS n_key,
                 len(regexp_extract_all(text, '${graft.engine.PiiScrub.Phone}'))
                   AS n_phone,
                 len(regexp_extract_all(text, '${graft.engine.PiiScrub.Ipv4}'))
                   AS n_ip,
                 regexp_replace(regexp_replace(regexp_replace(regexp_replace(
                   text,
                   '${graft.engine.PiiScrub.Email}', '[EMAIL]', 'g'),
                   '${graft.engine.PiiScrub.SecretKey}', '[KEY]', 'g'),
                   '${graft.engine.PiiScrub.Phone}', '[PHONE]', 'g'),
                   '${graft.engine.PiiScrub.Ipv4}', '[IP]', 'g') AS clean
               FROM documents)
             SELECT source, count(*) AS n_docs,
               CAST(sum(n_email) AS BIGINT) AS emails,
               CAST(sum(n_key) AS BIGINT) AS keys,
               CAST(sum(n_phone) AS BIGINT) AS phones,
               CAST(sum(n_ip) AS BIGINT) AS ips,
               CAST(sum(CASE WHEN n_email + n_key + n_phone + n_ip > 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS docs_flagged,
               CAST(sum(length(clean)) AS BIGINT) AS clean_chars
             FROM ann GROUP BY source ORDER BY source""")),

    // Token-budget waterfilling: realize a document-weighted mixture
    // under per-source SUPPLY CAPS — the allocation step between
    // q_mix_weights (what the mix should be) and q_corpus_build (the
    // materialization): give each source tokens proportional to its
    // document share, but a source cannot supply more than it has;
    // freed budget redistributes to the unsaturated sources (classic
    // waterfilling). Closed form, no iteration: sort sources by
    // tokens-per-doc ascending; the saturated set is a PREFIX of that
    // order, found by the cross-multiplied integer check
    // t_i·(W−prefD) ≤ (B−prefT)·d_i with a running-AND (min over the
    // prefix) enforcing the monotone-saturation lemma exactly.
    // EXACT BIGINT arithmetic throughout — the only double is the sort
    // ratio, whose quotients of small ints are separated far above ulp
    // (ties break on source). Unsaturated allocations use integer DIV;
    // the ≤|sources| leftover tokens from flooring stay unallocated
    // (deterministic). All windows run over the |sources|-row
    // aggregate, never corpus rows.
    Q("q_budget_fill",
      (s, d) => {
        val per = Tables.documents(s, d)
          .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
          .groupBy("source")
          .agg(count(lit(1)).as("d"), sum("n_tok").as("t"))
        val j = graft.engine.BudgetFill.waterfill(per)
        j.select(col("source"), col("d").as("n_docs"),
            col("t").as("n_tokens"), col("saturated"), col("alloc"))
          .orderBy("source")
      },
      Some("""WITH per AS (
               SELECT source, CAST(count(*) AS BIGINT) AS d,
                 CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS t
               FROM documents GROUP BY 1),
             tot AS (SELECT CAST(sum(d) AS BIGINT) AS W,
               CAST(sum(t) AS BIGINT) AS TT FROM per),
             o AS (SELECT per.*, tot.W, tot.TT // 2 AS B,
                 t::DOUBLE / d::DOUBLE AS ratio,
                 sum(t) OVER wo AS prefT, sum(d) OVER wo AS prefD
               FROM per CROSS JOIN tot
               WINDOW wo AS (ORDER BY t::DOUBLE / d::DOUBLE, source
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             c AS (SELECT *, CASE WHEN t * (W - (prefD - d)) <=
                   (B - (prefT - t)) * d THEN 1 ELSE 0 END AS chk
               FROM o),
             sflag AS (SELECT *, (min(chk) OVER (ORDER BY ratio, source
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) = 1
                 AS sat
               FROM c),
             g AS (SELECT *,
                 coalesce(sum(CASE WHEN sat THEN t END) OVER (), 0) AS satT,
                 coalesce(sum(CASE WHEN sat THEN d END) OVER (), 0) AS satD
               FROM sflag)
             SELECT source, d AS n_docs, t AS n_tokens, sat AS saturated,
               CAST(CASE WHEN sat THEN t
                 ELSE ((B - satT) * d) // (W - satD) END AS BIGINT) AS alloc
             FROM g ORDER BY source"""))
  )
}
