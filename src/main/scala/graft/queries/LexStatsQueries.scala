package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Round-8 lexical-statistics wave: the vocabulary-planning readouts a
  * tokenizer team runs between corpus characterization (CorpusStats)
  * and vocab freeze:
  *
  *  - q_vocab_coverage: per-language minimal vocabulary size covering
  *    90% of token mass — the number that sizes a tokenizer's vocab
  *    budget per language before training it.
  *  - q_pmi: top bigram collocations by pointwise mutual information
  *    (min-count-screened) — the association mining that feeds
  *    multi-word-token candidates and boilerplate phrase lists.
  *  - q_dim_energy: per-label mean energy retained by an embedding
  *    prefix (Matryoshka-style truncation audit) — decides whether
  *    downstream ANN can run on truncated vectors.
  *
  * Determinism: coverage thresholds compare INTEGERS (10·cum vs
  * 9·total — never a 0.9 double); PMI's single ln runs on an
  * identically-structured double ratio in both engines with plain
  * round (irrational-mantissa rule); per-vector energy ratios are
  * 1e-6-floored into DECIMAL before the group sum (the q_dsir ln-term
  * precedent), so sums are order-independent.
  *
  * Scale: token/bigram counting is map-side-combinable keyed shuffles;
  * windows run over per-language VOCAB tables (sub-linear in corpus
  * rows); corpus-wide totals are 1-row aggregates (scale-invariant
  * joins, no hints); the embedding pass is row-local per vector. */
object LexStatsQueries {

  private def r4(c: Column): Column = Helpers.r4(c)

  /** PMI min-count screen: collocations below this count are noise
    * (classic Church-Hanks practice). */
  private val PmiMinCount = 5

  val all: Seq[Q] = Seq(

    // Vocabulary coverage: the smallest per-language vocabulary (tokens
    // ranked by frequency, ties lexicographic) whose cumulative mass
    // reaches 90% of the language's tokens. ONE (lang, token) keyed
    // map-side-combinable shuffle builds the freq table; the running-sum
    // window and the threshold count run over the per-language VOCAB
    // (sub-linear in corpus rows — the q_zipf window-over-aggregate
    // shape). The 90% threshold compares 10*cum < 9*total in BIGINTs:
    // exact on both engines, no 0.9 double anywhere.
    Q("q_vocab_coverage",
      (s, d) => {
        val freq = Tables.documents(s, d)
          .select(col("lang"), explode(split(col("text"), " ")).as("w"))
          .groupBy("lang", "w").agg(count(lit(1)).as("c"))
        val win = Window.partitionBy("lang").orderBy(desc("c"), asc("w"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        freq.withColumn("cum", sum("c").over(win))
          .withColumn("tot", sum("c").over(Window.partitionBy("lang")))
          .groupBy("lang")
          .agg(sum("c").as("n_tok"), count(lit(1)).as("n_types"),
            sum(when(lit(10) * (col("cum") - col("c")) < lit(9) * col("tot"),
              1L).otherwise(0L)).as("v90"))
          .orderBy("lang")
      },
      Some("""WITH toks AS (SELECT lang, unnest(str_split(text, ' ')) AS w
               FROM documents),
             freq AS (SELECT lang, w, count(*) AS c FROM toks GROUP BY 1, 2),
             cum AS (SELECT lang, c,
                       sum(c) OVER (PARTITION BY lang ORDER BY c DESC, w
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                         AS cum,
                       sum(c) OVER (PARTITION BY lang) AS tot
                     FROM freq)
             SELECT lang, CAST(sum(c) AS BIGINT) AS n_tok,
               CAST(count(*) AS BIGINT) AS n_types,
               CAST(sum(CASE WHEN 10 * (cum - c) < 9 * tot
                 THEN 1 ELSE 0 END) AS BIGINT) AS v90
             FROM cum GROUP BY lang ORDER BY lang""")),

    // Collocation mining: top bigrams by pointwise mutual information
    // ln(p(ab) / (p(a)p(b))), min-count screened (Church & Hanks'
    // association measure). Bigram generation is the row-local q_bigram
    // zip_with idiom; unigram/bigram counting are token-keyed
    // map-side-combinable shuffles; corpus totals N (tokens) and B
    // (bigrams) are 1-row aggregates, and the two unigram joins are
    // token-keyed — the PMI table is vocab-sized, never corpus-sized.
    // The ln ratio is assembled with an IDENTICAL double operation tree
    // in both engines and plain-rounded (irrational-mantissa rule).
    Q("q_pmi",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .withColumn("ws", split(col("text"), " "))
        val uni = toks.select(explode(col("ws")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("cu"))
        val nTok = uni.agg(sum("cu").as("n")) // 1 row
        val bg = toks
          .withColumn("bg",
            expr("filter(zip_with(ws, slice(ws, 2, size(ws)), " +
              "(x, y) -> concat(x, ' ', y)), e -> e IS NOT NULL)"))
          .select(explode(col("bg")).as("bigram"))
          .groupBy("bigram").agg(count(lit(1)).as("cb"))
        val nBg = bg.agg(sum("cb").as("b")) // 1 row (pre-screen total)
        bg.filter(col("cb") >= PmiMinCount)
          .withColumn("w1", split(col("bigram"), " ").getItem(0))
          .withColumn("w2", split(col("bigram"), " ").getItem(1))
          .join(uni.select(col("w").as("w1"), col("cu").as("c1")), "w1")
          .join(uni.select(col("w").as("w2"), col("cu").as("c2")), "w2")
          .crossJoin(nTok).crossJoin(nBg)
          .withColumn("pmi", round(log(
            (col("cb").cast("double") * col("n").cast("double") *
              col("n").cast("double")) /
              (col("b").cast("double") * col("c1").cast("double") *
                col("c2").cast("double"))), 4))
          .select("bigram", "cb", "pmi")
          .orderBy(desc("pmi"), asc("bigram"))
          .limit(20)
      },
      Some(s"""WITH w AS (SELECT doc_id, str_split(text, ' ') AS ws,
               len(str_split(text, ' ')) AS nw FROM documents),
             uni AS (SELECT unnest(ws) AS w FROM w),
             cu AS (SELECT w, count(*) AS cu FROM uni GROUP BY 1),
             n AS (SELECT CAST(sum(cu) AS BIGINT) AS n FROM cu),
             bgl AS (SELECT ws[t.i] || ' ' || ws[t.i + 1] AS bigram
                     FROM w CROSS JOIN range(1, 4096) t(i)
                     WHERE t.i <= nw - 1),
             cb AS (SELECT bigram, count(*) AS cb FROM bgl GROUP BY 1),
             b AS (SELECT CAST(sum(cb) AS BIGINT) AS b FROM cb),
             j AS (SELECT cb.bigram, cb.cb,
                     c1.cu AS c1, c2.cu AS c2, n.n, b.b
                   FROM cb, n, b
                   JOIN cu c1 ON c1.w = str_split(cb.bigram, ' ')[1]
                   JOIN cu c2 ON c2.w = str_split(cb.bigram, ' ')[2]
                   WHERE cb.cb >= $PmiMinCount)
             SELECT bigram, cb,
               round(ln((cb::DOUBLE * n::DOUBLE * n::DOUBLE) /
                 (b::DOUBLE * c1::DOUBLE * c2::DOUBLE)), 4) + 0.0 AS pmi
             FROM j ORDER BY pmi DESC, bigram LIMIT 20""")),

    // In-document stutter collapse: drop every word equal to its
    // immediate predecessor ("batch batch batch" -> "batch") — the
    // cheapest in-doc boilerplate repair, run before token counting so
    // stutters don't inflate budgets. Entirely ROW-LOCAL through the
    // codegen'd `graft_destutter` Expression (the higher-order-lambda
    // spelling is interpreted per element — measured ~2.3 s at sf0.1
    // vs staying inside whole-stage codegen); zero shuffles at any
    // corpus size; outputs are pure integers plus the repaired text's
    // md5 so the oracle pins the exact reconstruction.
    Q("q_destutter",
      (s, d) => {
        graft.GraftExtensions.ensureRegistered(s)
        Tables.documents(s, d)
          .withColumn("clean", expr("graft_destutter(text)"))
          .filter(col("clean") =!= col("text")) // only docs that stuttered
          .withColumn("n_tok", size(split(col("text"), " ")).cast("long"))
          .withColumn("n_kept",
            size(split(col("clean"), " ")).cast("long"))
          .withColumn("clean_md5", md5(col("clean")))
          .select("doc_id", "n_tok", "n_kept", "clean_md5")
          .orderBy("doc_id")
      },
      // DuckDB lambdas are 1-indexed where Spark's are 0-indexed; both
      // spell "keep unless equal to predecessor"
      Some("""WITH w AS (SELECT doc_id, str_split(text, ' ') AS ws
               FROM documents),
             k AS (SELECT doc_id, ws,
                     list_filter(ws, (x, i) -> i = 1 OR ws[i - 1] <> x)
                       AS kept
                   FROM w)
             SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tok,
               CAST(len(kept) AS BIGINT) AS n_kept,
               md5(array_to_string(kept, ' ')) AS clean_md5
             FROM k WHERE len(kept) < len(ws) ORDER BY doc_id""")),

    // Naive-Bayes language-ID evaluation: train multinomial word
    // profiles on the EVEN doc_ids, classify the ODD ones, emit the
    // confusion matrix — the complete train/classify/evaluate loop as
    // one relational plan (the eval primitive behind every heuristic
    // filter's precision check). Laplace-smoothed log-likelihoods:
    // every term is cd * f6(ln((cw+1)/(tl+V))) — an exact DECIMAL in
    // BOTH engines, so per-(doc, lang) sums are order-independent and
    // the argmax is bit-determined; ONLY integer counts are emitted.
    // Scale: profiles are (|langs| x vocab) aggregates; scoring joins
    // test-doc words to profiles ON THE WORD (keyed, linear) and fans
    // out only by |langs| (bounded dimension); the argmax window is
    // |langs| rows per doc.
    Q("q_nb_langid",
      (s, d) => {
        def f6(c: Column): Column =
          (floor(c * 1000000 + 0.5) / 1000000).cast("decimal(18,6)")
        val docs = Tables.documents(s, d)
        val tw = docs.filter(col("doc_id") % 2 === 0)
          .select(col("lang"), explode(split(col("text"), " ")).as("w"))
        // r17: the q_lm_score materialize+size-aware-broadcast
        // treatment was TRIED here and reverted — the checkpoint+count
        // jobs cost more than the saved (already tiny, AQE-broadcast)
        // probe shuffle (bench protocol A/B: 0.87 -> 0.96 s at sf0.1)
        val prof = tw.groupBy("lang", "w").agg(count(lit(1)).as("cw"))
        val totals = prof.groupBy("lang").agg(sum("cw").as("tl"))
        val vsz = prof.agg(countDistinct("w").as("v")) // 1 row
        val dw = docs.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("lang").as("true_lang"),
            explode(split(col("text"), " ")).as("w"))
          .groupBy("doc_id", "true_lang", "w")
          .agg(count(lit(1)).as("cd"))
        val scored = dw
          .crossJoin(totals) // |langs| rows: scale-invariant fan-out
          .join(prof, Seq("lang", "w"), "left")
          .crossJoin(vsz)
          // LONG micro-units: score only RANKS (never emitted), and the
          // long sum Σ cd·l_mic orders identically to the old
          // decimal(scale 12) sum while keeping the aggregation buffer
          // a compact long (the q_lm_score r16 treatment)
          .withColumn("term", col("cd") *
            floor(log((coalesce(col("cw"), lit(0L)) + lit(1)).cast("double") /
              (col("tl") + col("v")).cast("double")) * 1000000 + 0.5)
              .cast("long"))
          .groupBy("doc_id", "true_lang", "lang")
          .agg(sum(col("term")).as("score"))
        val pred = scored
          .withColumn("rn", row_number().over(
            Window.partitionBy("doc_id")
              .orderBy(desc("score"), asc("lang"))))
          .filter(col("rn") === 1)
          .select(col("true_lang"), col("lang").as("pred_lang"))
        pred.groupBy("true_lang", "pred_lang")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("true_lang", "pred_lang")
      },
      Some("""WITH tw AS (SELECT lang, unnest(str_split(text, ' ')) AS w
               FROM documents WHERE doc_id % 2 = 0),
             prof AS (SELECT lang, w, count(*) AS cw FROM tw GROUP BY 1, 2),
             totals AS (SELECT lang, sum(cw) AS tl FROM prof GROUP BY 1),
             vsz AS (SELECT count(DISTINCT w) AS v FROM prof),
             dw AS (SELECT doc_id, lang AS true_lang,
                      unnest(str_split(text, ' ')) AS w
                    FROM documents WHERE doc_id % 2 = 1),
             dwc AS (SELECT doc_id, true_lang, w, count(*) AS cd
                     FROM dw GROUP BY 1, 2, 3),
             scored AS (
               SELECT dwc.doc_id, dwc.true_lang, totals.lang,
                 sum(cd::DECIMAL(18,6) *
                   CAST(floor(ln((coalesce(prof.cw, 0) + 1)::DOUBLE /
                     (totals.tl + vsz.v)::DOUBLE) * 1000000 + 0.5::DOUBLE)
                     / 1000000 AS DECIMAL(18,6))) AS score
               FROM dwc CROSS JOIN totals CROSS JOIN vsz
               LEFT JOIN prof ON prof.lang = totals.lang AND prof.w = dwc.w
               GROUP BY 1, 2, 3),
             pred AS (
               SELECT true_lang, lang AS pred_lang FROM (
                 SELECT true_lang, lang,
                   row_number() OVER (PARTITION BY doc_id
                     ORDER BY score DESC, lang) AS rn
                 FROM scored) WHERE rn = 1)
             SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
             FROM pred GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Matryoshka truncation audit: per label, the mean fraction of a
    // vector's energy (squared norm) retained by its first 16 dims —
    // the readout that decides whether coarse ANN stages can run on
    // truncated vectors. Entirely ROW-LOCAL per vector (two graft_dot
    // calls on the codegen'd expression), one label-keyed aggregate;
    // per-vector ratios are 1e-6-floored into DECIMAL(18,6) before the
    // sum so the group total is exact and order-independent, then ONE
    // double division at the end (r4 floor-rounding, rational inputs).
    Q("q_dim_energy",
      (s, d) => {
        val e = NorthStarQueries.emb(s, d)
          .withColumn("head", expr("slice(emb, 1, 16)"))
          .withColumn("ratio",
            (floor(expr("graft_dot(head, head)") /
              expr("graft_dot(emb, emb)") * 1000000 + 0.5) / 1000000)
              .cast("decimal(18,6)"))
        e.groupBy("label")
          .agg(count(lit(1)).as("n_vec"),
            r4(sum(col("ratio")).cast("double") / count(lit(1)))
              .as("energy16"))
          .orderBy("label")
      },
      Some(s"""WITH ${NorthStarQueries.embCte},
             r AS (SELECT label,
                     CAST(floor(list_dot_product(e[1:16], e[1:16]) /
                       list_dot_product(e, e) * 1000000 + 0.5::DOUBLE)
                       / 1000000 AS DECIMAL(18,6)) AS ratio
                   FROM n)
             SELECT label, CAST(count(*) AS BIGINT) AS n_vec,
               floor(CAST(sum(ratio) AS DOUBLE) / count(*)
                 * 10000 + 0.5::DOUBLE) / 10000 AS energy16
             FROM r GROUP BY label ORDER BY label"""))
  )
}
