package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Sixth query wave: corpus-statistics operators — the measurement layer
  * a tokenizer/data team runs before committing to a training mix. Where
  * the curation wave (CurationQueries) DECIDES keep/weight/remove, this
  * wave CHARACTERIZES the corpus:
  *
  *  - q_ttr: per-document type-token ratio (lexical diversity) — the
  *    cheapest repetition screen, fully row-local.
  *  - q_oov_rate: per-document out-of-vocabulary rate against the
  *    corpus top-K vocabulary — the tokenizer-coverage audit run before
  *    freezing a vocab.
  *  - q_zipf: per-source Zipf slope (least-squares fit of ln freq vs
  *    ln rank) — corpora that deviate far from ~-1 are boilerplate-heavy
  *    or templated; the classic distributional health check.
  *  - q_source_overlap: pairwise vocabulary Jaccard between sources —
  *    finds mirror/syndicated sources before mixing weights are set.
  *
  * Same determinism contract as every other group (Helpers.scala + the
  * BASELINE.md audits): total ORDER BY, rational scores through r4
  * floor-rounding, ln through 1e-6 floor into DECIMAL before any sum
  * (the q_dsir precedent), deterministic rank tie-breaks.
  *
  * Scale notes inline. The common shape: token-keyed map-side-combinable
  * shuffles; every post-aggregate window runs over a vocab- or
  * source-bounded table, never over corpus rows; the one pair-generating
  * path (q_source_overlap) is keyed on the token with per-token fan-out
  * bounded by |sources|² — sources are a bounded dimension (20 here,
  * O(100s) in production), not corpus-proportional.
  */
object CorpusStatsQueries {

  private def r4(c: Column): Column = Helpers.r4(c)

  /** Vocabulary size for the OOV audit: top-K corpus tokens by frequency
    * (tie -> lexicographically first). Fixed K keeps the vocab side a
    * constant-size broadcast at any corpus scale. */
  private val OovVocabK = 30

  val all: Seq[Q] = Seq(

    // Type-token ratio: distinct-token count over token count per
    // document — the cheapest lexical-diversity / repetition screen
    // (templated text scores low). Entirely ROW-LOCAL array ops (split,
    // array_distinct), zero shuffles at any corpus size; the ratio is
    // rational so it goes through r4 floor-rounding.
    Q("q_ttr",
      // fanoutIfNarrow (r16): split + array_distinct per doc is
      // row-local CPU that ran on the one-task single-row-group scan;
      // fan out to core width (no-op on wide scans)
      (s, d) => Helpers.fanoutIfNarrow(Tables.documents(s, d),
          col("doc_id"))
        .withColumn("ws", split(col("text"), " "))
        .withColumn("n_tok", size(col("ws")).cast("long"))
        .withColumn("n_types", size(array_distinct(col("ws"))).cast("long"))
        .withColumn("ttr", r4(col("n_types").cast("double") / col("n_tok")))
        .select("doc_id", "n_tok", "n_types", "ttr")
        .orderBy("doc_id"),
      Some("""WITH w AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents)
             SELECT doc_id,
               CAST(len(ws) AS BIGINT) AS n_tok,
               CAST(len(list_distinct(ws)) AS BIGINT) AS n_types,
               floor(len(list_distinct(ws))::DOUBLE / len(ws)
                 * 10000 + 0.5::DOUBLE) / 10000 AS ttr
             FROM w ORDER BY doc_id""")),

    // Out-of-vocabulary rate: fraction of each document's tokens not in
    // the corpus top-K vocabulary — the tokenizer-coverage audit run
    // before freezing a vocab (high-OOV docs either get transliteration
    // fixes or drag fertility down). One (doc_id, token) keyed shuffle
    // builds per-doc counts ONCE; the vocab is re-aggregated from that
    // table (map-side combinable, token-keyed) and truncated to a FIXED
    // K, so the join side is a constant-size broadcast at any corpus
    // scale — the q_topk_semi pattern, never a corpus-proportional hint.
    Q("q_oov_rate",
      (s, d) => {
        val db = Tables.documents(s, d)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        val vocab = db.groupBy("w").agg(sum("c").as("cw"))
          .orderBy(desc("cw"), asc("w")).limit(OovVocabK)
          .select(col("w"), lit(true).as("in_vocab"))
        db.join(broadcast(vocab), Seq("w"), "left")
          .groupBy("doc_id")
          .agg(sum("c").as("n_tok"),
            sum(when(col("in_vocab").isNull, col("c")).otherwise(0L))
              .as("n_oov"))
          .withColumn("oov_rate",
            r4(col("n_oov").cast("double") / col("n_tok")))
          .select("doc_id", "n_tok", "n_oov", "oov_rate")
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, unnest(str_split(text, ' ')) AS w
               FROM documents),
             db AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY 1, 2),
             vocab AS (SELECT w FROM (
               SELECT w, CAST(sum(c) AS BIGINT) AS cw FROM db GROUP BY 1
               ORDER BY cw DESC, w LIMIT $OovVocabK)),
             j AS (SELECT db.doc_id, db.c,
                     (vocab.w IS NOT NULL) AS in_vocab
                   FROM db LEFT JOIN vocab ON db.w = vocab.w)
             SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
               CAST(sum(CASE WHEN in_vocab THEN 0 ELSE c END) AS BIGINT) AS n_oov,
               floor(sum(CASE WHEN in_vocab THEN 0 ELSE c END)::DOUBLE
                 / sum(c) * 10000 + 0.5::DOUBLE) / 10000 AS oov_rate
             FROM j GROUP BY doc_id ORDER BY doc_id""")),

    // Zipf slope per source: least-squares slope of ln(freq) on ln(rank)
    // over the source's token-frequency table — healthy natural text sits
    // near -1; templated/boilerplate corpora flatten toward 0. Token
    // counting is ONE (source, token) keyed map-side-combinable shuffle;
    // the rank window and the fit both run over the per-source VOCAB
    // table (sub-linear in corpus size, the q_ntile
    // window-over-aggregate pattern), never over corpus rows. Both ln
    // terms are 1e-6-floored into DECIMAL before any product or sum (the
    // q_dsir/k-means precedent) so Σx, Σy, Σxy, Σx² are exact and
    // order-independent; the slope ratio of those exact sums is rational
    // and goes through r4.
    Q("q_zipf",
      (s, d) => {
        def f6(c: Column): Column =
          (floor(c * 1000000 + 0.5) / 1000000).cast("decimal(18,6)")
        val freq = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("w"))
          .groupBy("source", "w").agg(count(lit(1)).as("c"))
        val ranked = freq
          .withColumn("rnk", row_number().over(
            Window.partitionBy("source").orderBy(desc("c"), asc("w"))))
          .withColumn("x", f6(log(col("rnk").cast("double"))))
          .withColumn("y", f6(log(col("c").cast("double"))))
        ranked.groupBy("source")
          .agg(count(lit(1)).as("n_types"),
            sum(col("x")).cast("double").as("sx"),
            sum(col("y")).cast("double").as("sy"),
            sum(col("x") * col("y")).cast("double").as("sxy"),
            sum(col("x") * col("x")).cast("double").as("sxx"))
          .withColumn("slope",
            r4((col("n_types") * col("sxy") - col("sx") * col("sy")) /
              (col("n_types") * col("sxx") - col("sx") * col("sx"))))
          .select("source", "n_types", "slope")
          .orderBy("source")
      },
      Some("""WITH toks AS (SELECT source, unnest(str_split(text, ' ')) AS w
               FROM documents),
             freq AS (SELECT source, w, count(*) AS c FROM toks GROUP BY 1, 2),
             rk AS (SELECT source, c,
                      row_number() OVER (PARTITION BY source
                        ORDER BY c DESC, w) AS rnk
                    FROM freq),
             xy AS (SELECT source,
                      CAST(floor(ln(rnk::DOUBLE) * 1000000 + 0.5::DOUBLE) / 1000000
                        AS DECIMAL(18,6)) AS x,
                      CAST(floor(ln(c::DOUBLE) * 1000000 + 0.5::DOUBLE) / 1000000
                        AS DECIMAL(18,6)) AS y
                    FROM rk),
             ag AS (SELECT source, count(*) AS n_types,
                      CAST(sum(x) AS DOUBLE) AS sx,
                      CAST(sum(y) AS DOUBLE) AS sy,
                      CAST(sum(x * y) AS DOUBLE) AS sxy,
                      CAST(sum(x * x) AS DOUBLE) AS sxx
                    FROM xy GROUP BY source)
             SELECT source, CAST(n_types AS BIGINT) AS n_types,
               floor((n_types * sxy - sx * sy) / (n_types * sxx - sx * sx)
                 * 10000 + 0.5::DOUBLE) / 10000 AS slope
             FROM ag ORDER BY source""")),

    // Percentile length trim: keep documents inside the per-language
    // [p05, p95] character-length band — the length-outlier screen run
    // per language because length distributions differ by script (a CJK
    // p95 is not a Latin p95). Exact interpolated percentiles from the
    // (lang, n_chars, count) histogram via ExactPercentile (no
    // per-group value→count aggregation buffer at any scale); the
    // per-language stats table is |langs|-sized, broadcast at any
    // corpus scale; comparisons run on identical interpolation inputs
    // in both engines.
    Q("q_len_trim",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val bands = ExactPercentile.overHistogram(docs, Seq("lang"),
            "n_chars", Seq(("p05", 0.05), ("p95", 0.95)))
          .select("lang", "p05", "p95")
        docs.join(broadcast(bands), "lang")
          .withColumn("keep",
            col("n_chars") >= col("p05") && col("n_chars") <= col("p95"))
          .select(col("doc_id"), col("lang"), col("n_chars"),
            r4(col("p05")).as("p05"), r4(col("p95")).as("p95"), col("keep"))
          .orderBy("doc_id")
      },
      Some("""WITH bands AS (
               SELECT lang, quantile_cont(n_chars, 0.05) AS p05,
                 quantile_cont(n_chars, 0.95) AS p95
               FROM documents GROUP BY lang)
             SELECT doc_id, d.lang, n_chars,
               floor(p05 * 10000 + 0.5::DOUBLE) / 10000 AS p05,
               floor(p95 * 10000 + 0.5::DOUBLE) / 10000 AS p95,
               (n_chars >= p05 AND n_chars <= p95) AS keep
             FROM documents d JOIN bands ON d.lang = bands.lang
             ORDER BY doc_id""")),

    // Tokenizer fertility by language: characters per whitespace token —
    // the readout a tokenizer team tracks per language (a language whose
    // fertility drifts high is paying more compute per unit text).
    // Row-local token counting + ONE map-side-combinable shuffle on
    // lang; ratios of exact long sums -> r4.
    Q("q_fertility",
      (s, d) => Tables.documents(s, d)
        .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tok").as("n_tokens"),
          sum(length(col("text")).cast("long")).as("n_chars"))
        .withColumn("chars_per_token",
          r4(col("n_chars").cast("double") / col("n_tokens")))
        .withColumn("tokens_per_doc",
          r4(col("n_tokens").cast("double") / col("n_docs")))
        .select("lang", "n_docs", "n_tokens", "n_chars",
          "chars_per_token", "tokens_per_doc")
        .orderBy("lang"),
      Some("""SELECT lang, count(*) AS n_docs,
               CAST(sum(len(str_split(text, ' '))) AS BIGINT) AS n_tokens,
               CAST(sum(len(text)) AS BIGINT) AS n_chars,
               floor(sum(len(text))::DOUBLE / sum(len(str_split(text, ' ')))
                 * 10000 + 0.5::DOUBLE) / 10000 AS chars_per_token,
               floor(sum(len(str_split(text, ' ')))::DOUBLE / count(*)
                 * 10000 + 0.5::DOUBLE) / 10000 AS tokens_per_doc
             FROM documents GROUP BY lang ORDER BY lang""")),

    // The corpus-build composite: quality filter → exact dedup →
    // contamination-safe split → sequence packing, reported as per-split
    // publish stats — the END-TO-END curated-corpus readout as ONE
    // oracle-checked query (TrainingPipelineSpec asserts the same
    // pipeline's invariants through the transactional sink; this puts
    // the numbers under the DuckDB gate). Shapes: row-local quality
    // flags, one fingerprint-keyed shuffle for dedup, the split hash
    // keys on the CONTENT fingerprint (a residual duplicate pair can
    // never straddle the split), packing's running sum windows each
    // split's kept docs (two bounded partitions).
    Q("q_corpus_build",
      (s, d) => {
        val quality = Tables.documents(s, d)
          .withColumn("ws", split(col("text"), " "))
          .withColumn("n_tok", size(col("ws")).cast("long"))
          .withColumn("ttr", r4(size(array_distinct(col("ws")))
            .cast("double") / col("n_tok")))
          .filter(col("n_tok") >= 10 && col("ttr") >= 0.05)
          .withColumn("fp", md5(col("text").cast("binary")))
        val keep = quality.groupBy("fp").agg(min("doc_id").as("doc_id"))
        val curated = quality.join(keep, Seq("doc_id", "fp"), "left_semi")
          .withColumn("split",
            // fp is ALREADY an md5 hex digest: parse its first 4 hex
            // chars directly (Helpers.hash16 would md5 it AGAIN and
            // diverge from the oracle's hex4-on-fp)
            when(conv(substring(col("fp"), 1, 4), 16, 10).cast("int")
              % 10 < 8, "train").otherwise("val"))
        val w = Window.partitionBy("split").orderBy("doc_id")
        curated
          .withColumn("seq_id",
            floor((sum("n_tok").over(w) - 1) / 128))
          .groupBy("split")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tok").as("n_tokens"),
            countDistinct("seq_id").as("n_seqs"))
          .orderBy("split")
      },
      Some(s"""WITH q AS (
               SELECT doc_id, text,
                 CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tok,
                 floor(len(list_distinct(str_split(text, ' ')))::DOUBLE /
                   len(str_split(text, ' ')) * 10000 + 0.5::DOUBLE) / 10000 AS ttr
               FROM documents),
             qk AS (SELECT doc_id, md5(text) AS fp, n_tok FROM q
                    WHERE n_tok >= 10 AND ttr >= 0.05),
             keep AS (SELECT fp, min(doc_id) AS doc_id FROM qk GROUP BY fp),
             cur AS (
               SELECT qk.doc_id, qk.n_tok,
                 CASE WHEN ${Helpers.hex4("qk.fp")} % 10 < 8
                   THEN 'train' ELSE 'val' END AS split
               FROM qk JOIN keep ON qk.doc_id = keep.doc_id AND qk.fp = keep.fp),
             packed AS (
               SELECT split, n_tok,
                 CAST(floor((sum(n_tok) OVER (PARTITION BY split
                   ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - 1) / 128)
                   AS BIGINT) AS seq_id
               FROM cur)
             SELECT split, count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               CAST(count(DISTINCT seq_id) AS BIGINT) AS n_seqs
             FROM packed GROUP BY split ORDER BY split""")),

    // Pairwise vocabulary Jaccard between sources: |vocab(a) ∩ vocab(b)|
    // over |vocab(a) ∪ vocab(b)| — mirror/syndicated-source detection
    // run before source-mixing weights are set (two sources sharing
    // ~all vocabulary are one source for sampling purposes). The pair
    // join is keyed on the TOKEN: per-token fan-out is C(|sources with
    // that token|, 2) ≤ |sources|², and sources are a bounded dimension
    // (not corpus-proportional), so total pair volume is vocab-bounded —
    // never an all-docs cross join. Jaccard is rational -> r4.
    Q("q_source_overlap",
      (s, d) => {
        val sv = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("w"))
          .distinct()
        val l = sv.select(col("source").as("s1"), col("w"))
        val r = sv.select(col("source").as("s2"), col("w"))
        val inter = l.join(r, "w").filter(col("s1") < col("s2"))
          .groupBy("s1", "s2").agg(count(lit(1)).as("n_inter"))
        val vs = sv.groupBy("source").agg(count(lit(1)).as("nv"))
        inter
          .join(vs.select(col("source").as("s1"), col("nv").as("v1")), "s1")
          .join(vs.select(col("source").as("s2"), col("nv").as("v2")), "s2")
          .withColumn("jaccard", r4(col("n_inter").cast("double") /
            (col("v1") + col("v2") - col("n_inter"))))
          .select("s1", "s2", "v1", "v2", "n_inter", "jaccard")
          .orderBy("s1", "s2")
      },
      Some("""WITH sv AS (SELECT DISTINCT source, w FROM (
               SELECT source, unnest(str_split(text, ' ')) AS w FROM documents)),
             inter AS (SELECT a.source AS s1, b.source AS s2, count(*) AS n_inter
                       FROM sv a JOIN sv b ON a.w = b.w AND a.source < b.source
                       GROUP BY 1, 2),
             vs AS (SELECT source, count(*) AS nv FROM sv GROUP BY 1)
             SELECT s1, s2,
               CAST(va.nv AS BIGINT) AS v1, CAST(vb.nv AS BIGINT) AS v2,
               CAST(n_inter AS BIGINT) AS n_inter,
               floor(n_inter::DOUBLE / (va.nv + vb.nv - n_inter)
                 * 10000 + 0.5::DOUBLE) / 10000 AS jaccard
             FROM inter JOIN vs va ON s1 = va.source
                        JOIN vs vb ON s2 = vb.source
             ORDER BY s1, s2""")),

    // Bigram conditional entropy per language: H(w2|w1) =
    // -Σ p(w1,w2) ln p(w2|w1) — the sequence-level predictability
    // readout (templated/repetitive corpora score LOW because the next
    // word is predictable; healthy natural text sits high). Three
    // map-side-combinable shuffles, each keyed finer->coarser
    // ((lang,w1,w2) -> (lang,w1) -> lang), all bounded by the corpus
    // bigram count — one linear pass at any scale. Determinism: each
    // ln term is 1e-6-floored into DECIMAL and multiplied by the exact
    // INTEGER bigram count before the sum (exact, order-independent —
    // the q_zipf precedent); the final normalize-and-negate is one
    // rational op on the exact sum -> r4. Identical operation trees in
    // both engines.
    Q("q_bigram_entropy",
      (s, d) => {
        def f6(c: Column): Column =
          (floor(c * 1000000 + 0.5) / 1000000).cast("decimal(18,6)")
        // zip_with bigram generation (the q_bigram idiom — per-row
        // constant references to ws; the one-longer zip pads with null
        // and the filter drops it)
        val bg = Tables.documents(s, d)
          .withColumn("ws", split(col("text"), " "))
          .withColumn("bg", expr(
            "filter(zip_with(ws, slice(ws, 2, size(ws)), " +
              "(x, y) -> struct(x AS w1, y AS w2)), e -> e.w2 IS NOT NULL)"))
          .select(col("lang"), explode(col("bg")).as("b"))
          .select(col("lang"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        val c12 = bg.groupBy("lang", "w1", "w2").agg(count(lit(1)).as("c12"))
        val c1 = c12.groupBy("lang", "w1").agg(sum("c12").as("c1"))
        c12.join(c1, Seq("lang", "w1"))
          .withColumn("term",
            col("c12") * f6(log(col("c12").cast("double") / col("c1"))))
          .groupBy("lang")
          .agg(sum("c12").as("n_bigrams"),
            sum("term").as("t"))
          .withColumn("cond_entropy",
            r4(-col("t").cast("double") / col("n_bigrams")))
          .select("lang", "n_bigrams", "cond_entropy")
          .orderBy("lang")
      },
      Some("""WITH ws AS (SELECT lang, str_split(text, ' ') AS w,
               len(str_split(text, ' ')) AS nw FROM documents),
             bg AS (SELECT lang, w[t.i] AS w1, w[t.i + 1] AS w2
                    FROM ws CROSS JOIN range(1, 4096) t(i)
                    WHERE t.i <= nw - 1),
             c12 AS (SELECT lang, w1, w2, count(*) AS c12
                     FROM bg GROUP BY 1, 2, 3),
             c1 AS (SELECT lang, w1, sum(c12) AS c1 FROM c12 GROUP BY 1, 2),
             t AS (SELECT c12.lang, c12.c12,
                     c12.c12 * CAST(floor(ln(c12.c12::DOUBLE / c1.c1)
                       * 1000000 + 0.5::DOUBLE) / 1000000
                       AS DECIMAL(18,6)) AS term
                   FROM c12 JOIN c1
                     ON c12.lang = c1.lang AND c12.w1 = c1.w1)
             SELECT lang, CAST(sum(c12) AS BIGINT) AS n_bigrams,
               floor(-CAST(sum(term) AS DOUBLE) / sum(c12)
                 * 10000 + 0.5::DOUBLE) / 10000 AS cond_entropy
             FROM t GROUP BY lang ORDER BY lang""")),

    // Per-source KL divergence from the corpus unigram distribution:
    // KL(P_src || P_corpus) = Σ p_s(w) ln(p_s(w)/q(w)) — the
    // distribution-shift readout behind mixing decisions (a source far
    // from the corpus center is either valuable diversity or junk; the
    // number says WHICH sources to inspect). No smoothing needed:
    // every source token exists in the corpus by construction. Shapes:
    // (source,w) and (w) counts are map-side-combinable token-keyed
    // shuffles; the join is keyed on the token; totals are
    // |sources|-/1-row broadcasts. Same exact-sum determinism as
    // q_bigram_entropy: integer count x 1e-6-floored DECIMAL ln term.
    Q("q_kl_source",
      (s, d) => {
        def f6(c: Column): Column =
          (floor(c * 1000000 + 0.5) / 1000000).cast("decimal(18,6)")
        val toks = Tables.documents(s, d)
          .select(col("source"), explode(split(col("text"), " ")).as("w"))
        val sw = toks.groupBy("source", "w").agg(count(lit(1)).as("csw"))
        val cw = sw.groupBy("w").agg(sum("csw").as("cw"))
        val ns = sw.groupBy("source").agg(sum("csw").as("ns"))
        val n = cw.agg(sum("cw").as("n"))
        sw.join(cw, "w")
          .join(broadcast(ns), "source")
          .crossJoin(broadcast(n))
          .withColumn("term", col("csw") * f6(log(
            (col("csw").cast("double") * col("n")) /
              (col("ns").cast("double") * col("cw")))))
          .groupBy("source")
          .agg(max(col("ns")).as("n_tokens"), sum("term").as("t"))
          .withColumn("kl",
            r4(col("t").cast("double") / col("n_tokens")))
          .select("source", "n_tokens", "kl")
          .orderBy("source")
      },
      Some("""WITH toks AS (SELECT source, unnest(str_split(text, ' ')) AS w
               FROM documents),
             sw AS (SELECT source, w, count(*) AS csw FROM toks GROUP BY 1, 2),
             cw AS (SELECT w, sum(csw) AS cw FROM sw GROUP BY 1),
             ns AS (SELECT source, sum(csw) AS ns FROM sw GROUP BY 1),
             n AS (SELECT sum(cw) AS n FROM cw),
             t AS (SELECT sw.source, ns.ns,
                     sw.csw * CAST(floor(ln((sw.csw::DOUBLE * n.n) /
                         (ns.ns::DOUBLE * cw.cw))
                       * 1000000 + 0.5::DOUBLE) / 1000000
                       AS DECIMAL(18,6)) AS term
                   FROM sw JOIN cw ON sw.w = cw.w
                           JOIN ns ON sw.source = ns.source, n)
             SELECT source, CAST(max(ns) AS BIGINT) AS n_tokens,
               floor(CAST(sum(term) AS DOUBLE) / max(ns)
                 * 10000 + 0.5::DOUBLE) / 10000 AS kl
             FROM t GROUP BY source ORDER BY source""")),

    // Word burstiness (Church & Gale): variance-to-mean ratio of a
    // word's per-document counts across the WHOLE corpus (zeros
    // included via N = total docs). Function words sit near Poisson
    // (VMR ~ 1); topical words burst (VMR >> 1) — the readout that
    // separates the two before stopword-list or tf-idf decisions. Run
    // over the FIXED top-K corpus words, so the output is K rows and
    // the per-word sums ride the same token-keyed shuffle as the vocab
    // build. All sums are exact integers; VMR is computed from them in
    // ONE identical rational expression tree in both engines -> r4.
    Q("q_burstiness",
      (s, d) => {
        val docsDf = Tables.documents(s, d)
        val nDocs = docsDf.count() // driver-side scalar: one count, exact
        val dw = docsDf
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        val top = dw.groupBy("w").agg(sum("c").as("cw"))
          .orderBy(desc("cw"), asc("w")).limit(OovVocabK)
        dw.join(broadcast(top.select("w")), "w")
          .groupBy("w")
          .agg(count(lit(1)).as("n_docs_with"),
            sum("c").as("sc"),
            sum(col("c") * col("c")).as("sc2"))
          .withColumn("vmr", r4(
            (col("sc2").cast("double") / nDocs -
              (col("sc").cast("double") / nDocs) *
                (col("sc").cast("double") / nDocs)) /
              (col("sc").cast("double") / nDocs)))
          .select("w", "n_docs_with", "sc", "vmr")
          .orderBy("w")
      },
      Some(s"""WITH dw AS (SELECT doc_id, w, count(*) AS c FROM (
               SELECT doc_id, unnest(str_split(text, ' ')) AS w
               FROM documents) GROUP BY 1, 2),
             top AS (SELECT w FROM (
               SELECT w, sum(c) AS cw FROM dw GROUP BY 1
               ORDER BY cw DESC, w LIMIT $OovVocabK)),
             nd AS (SELECT count(*)::DOUBLE AS n FROM documents),
             ag AS (SELECT dw.w, count(*) AS n_docs_with,
                      sum(c) AS sc, sum(c * c) AS sc2
                    FROM dw JOIN top ON dw.w = top.w GROUP BY 1)
             SELECT w, CAST(n_docs_with AS BIGINT) AS n_docs_with,
               CAST(sc AS BIGINT) AS sc,
               floor((sc2::DOUBLE / n - (sc::DOUBLE / n) * (sc::DOUBLE / n))
                   / (sc::DOUBLE / n)
                 * 10000 + 0.5::DOUBLE) / 10000 AS vmr
             FROM ag, nd ORDER BY w""")),

    // Distribution-drift audit: EXACT two-sample Kolmogorov-Smirnov
    // distance between each source's document-length distribution and
    // the corpus-wide one — the drift readout run between crawl
    // snapshots (a source whose length CDF walks away from the corpus
    // baseline changed its extraction or its content mix; KL (q_kl)
    // sees token drift, this sees structural drift). The sup over
    // |F_s - F| is evaluated on the GLOBAL length grid (both step
    // functions only jump there): per-source cumulative counts are
    // fill-forwarded onto the grid with a running max, and the KS
    // numerator |cumS*N - cumG*nS| stays an exact DECIMAL(38,0)
    // integer (scale-safe to ~1e19-doc corpora) — the ratio goes
    // rational -> r4 floor only at the end. Tie on the sup point
    // breaks to the smallest length.
    //
    // Scale: everything after the (source, n_chars) rollup is
    // histogram-sized (|sources| x |distinct lengths|); the grid x
    // sources expansion is a broadcast of a bounded dimension table.
    Q("q_ks_drift",
      (s, d) => {
        // ONE corpus scan: the global length histogram derives from the
        // per-source one (sum over sources), so the plan's four
        // consumers (grid, totals, srcCum, srcTot) all sit on the same
        // (source, n_chars) aggregate exchange and ReuseExchange
        // collapses the scan — r11's bench drift on this query was
        // traced to the second documents scan the old grid0 carried.
        // The explicit isNotNull matches the predicate the left join
        // below infers on srcCum's branch; without it the two
        // subtrees' scan filters differ and ReuseExchange cannot unify
        // them (source is a required field, so no row is dropped —
        // the oracle carries the same WHERE).
        val srcHist = Tables.documents(s, d)
          .filter(col("source").isNotNull)
          .groupBy("source", "n_chars")
          .agg(count(lit(1)).as("c"))
        val grid0 = srcHist.groupBy("n_chars").agg(sum("c").as("g"))
        val wAll = Window.orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val grid = grid0.withColumn("cumG", sum("g").over(wAll))
        val totals = grid0.agg(sum("g").as("N"))
        val wSrc = Window.partitionBy("source").orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val srcCum = srcHist.withColumn("cumS", sum("c").over(wSrc))
          .select("source", "n_chars", "cumS")
        val srcTot = srcHist.groupBy("source").agg(sum("c").as("nS"))
        val full = grid.select("n_chars", "cumG")
          .crossJoin(broadcast(srcTot))
          .join(srcCum, Seq("source", "n_chars"), "left")
          .withColumn("cumSf", coalesce(
            max(col("cumS")).over(Window.partitionBy("source")
              .orderBy("n_chars")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)),
            lit(0L)))
          .crossJoin(broadcast(totals))
          .withColumn("num", abs(
            col("cumSf").cast("decimal(38,0)") *
              col("N").cast("decimal(38,0)") -
            col("cumG").cast("decimal(38,0)") *
              col("nS").cast("decimal(38,0)")))
        val wS = Window.partitionBy("source")
        full.withColumn("mnum", max(col("num")).over(wS))
          .filter(col("num") === col("mnum"))
          .groupBy(col("source"), col("nS").as("n_docs"),
            col("mnum"), col("N"))
          .agg(min(col("n_chars")).as("at_len"))
          .withColumn("ks", r4(col("mnum").cast("double") /
            (col("n_docs").cast("double") * col("N").cast("double"))))
          .select("source", "n_docs", "ks", "at_len")
          .orderBy("source")
      },
      Some("""WITH sh AS (SELECT source, n_chars, count(*) AS c
               FROM documents WHERE source IS NOT NULL GROUP BY 1, 2),
             g AS (SELECT n_chars, CAST(sum(c) AS BIGINT) AS g
               FROM sh GROUP BY 1),
             grid AS (SELECT n_chars, sum(g) OVER (ORDER BY n_chars
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumG
               FROM g),
             tot AS (SELECT CAST(sum(g) AS BIGINT) AS N FROM g),
             st AS (SELECT source, CAST(sum(c) AS BIGINT) AS nS
               FROM sh GROUP BY 1),
             sc AS (SELECT source, n_chars, sum(c) OVER (
                 PARTITION BY source ORDER BY n_chars
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumS
               FROM sh),
             filled AS (SELECT st.source, grid.n_chars, grid.cumG,
                 st.nS, tot.N,
                 coalesce(max(sc.cumS) OVER (PARTITION BY st.source
                   ORDER BY grid.n_chars
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   0) AS cumSf
               FROM grid CROSS JOIN st CROSS JOIN tot
               LEFT JOIN sc ON sc.source = st.source
                 AND sc.n_chars = grid.n_chars),
             scored AS (SELECT source, n_chars, nS, N,
                 abs(CAST(cumSf AS DECIMAL(38,0)) * CAST(N AS DECIMAL(38,0))
                   - CAST(cumG AS DECIMAL(38,0)) * CAST(nS AS DECIMAL(38,0)))
                   AS num
               FROM filled),
             mx AS (SELECT source, nS, N, max(num) AS mnum
               FROM scored GROUP BY 1, 2, 3)
             SELECT m.source, m.nS AS n_docs,
               floor(m.mnum::DOUBLE / (m.nS::DOUBLE * m.N::DOUBLE)
                 * 10000 + 0.5::DOUBLE) / 10000 AS ks,
               CAST(min(s.n_chars) AS BIGINT) AS at_len
             FROM mx m JOIN scored s ON s.source = m.source
               AND s.num = m.mnum
             GROUP BY 1, 2, m.mnum, m.N ORDER BY m.source"""))
  )
}
