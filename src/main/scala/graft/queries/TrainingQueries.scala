package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Fourth query wave: the remaining text/stream preparation steps an
  * LLM-training corpus pipeline runs between ingestion and tokenization —
  * context-window chunking, corpus n-gram statistics, co-occurrence
  * mining, per-user outlier screening, length-decile profiling, and
  * hopping-window stream aggregation (see SURVEY.md §2.8 N49+).
  *
  * Same determinism contract as the other groups (Helpers.scala + the
  * BASELINE.md audits): total ORDER BY everywhere, double sums through
  * DECIMAL, plain round() only for irrational-mantissa values, NTZ
  * timestamps, deterministic tie-breaks on every top-k.
  *
  * Scale notes inline. The common shape: everything row-local until ONE
  * shuffle on the natural key (bigram, pair, user, window), with map-side
  * partial aggregation; q_ntile computes exact deciles from the length
  * HISTOGRAM so even it never globally sorts the corpus.
  */
object TrainingQueries {

  private def ntz(c: Column): Column = Helpers.ntz(c)
  private def dsum(c: Column): Column = Helpers.dsum(c)
  private def r4(c: Column): Column = Helpers.r4(c)

  /** Chunk geometry: 50-word windows every 25 words (50% overlap) — the
    * classic context-window split for training corpora. */
  private val ChunkSize = 50
  private val ChunkStride = 25

  /** (doc_id, bigram, c) distinct-bigram-per-doc counts over the whole
    * corpus, memoized+cached per (session, dir) — the shingleCache
    * pattern. q_lm_score consumes this SAME subtree three times (probe
    * stream + bigram model + unigram model) and q_sbo_score derives its
    * train/eval splits from it by doc_id filter; without the cache each
    * consumer re-evaluates split+zip_with+explode over the full text
    * column, which the r11 bench measured as essentially the whole cost
    * of q_lm_score (2.0 s vs ~1.4 s r10-era). The cached form is the
    * per-doc bigram AGGREGATE — smaller than the raw occurrence stream
    * by the intra-doc repetition factor, and cache() is
    * MEMORY_AND_DISK so eviction spills instead of recomputing. At
    * 100 TB the uncached path remains linear (one scan per consumer);
    * the cache is a cross-query reuse optimization, not a correctness
    * dependency. */
  private val docBgCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private[queries] def docBigramCounts(s: SparkSession, d: String): DataFrame =
    NorthStarQueries.memoize(docBgCache, s, d) {
      Tables.documents(s, d)
        .withColumn("ws", split(col("text"), " "))
        .withColumn("bg",
          expr("filter(zip_with(ws, slice(ws, 2, size(ws)), " +
            "(x, y) -> concat(x, ' ', y)), e -> e IS NOT NULL)"))
        .select(col("doc_id"), explode(col("bg")).as("bigram"))
        .groupBy("doc_id", "bigram").agg(count(lit(1)).as("c"))
    }

  /** Size-aware model-join branch (r17, VERDICT r16 #3): the LM model
    * tables (bigram/unigram counts) are vocab-bounded but grow with
    * corpus breadth, so their probe joins carry no STATIC broadcast
    * hint — yet the hint-free sort-merge plan pays a full probe-side
    * shuffle before AQE can downgrade to broadcast (measured r16:
    * q_lm_score's model join 1.7 s hint-free vs 0.5 s broadcast at
    * sf0.1; the blanket autoBroadcastJoinThreshold=64m experiment made
    * the FULL bench worse, 62.6 -> 69.2 s, so the decision must be
    * per-table). The branch measures the MATERIALIZED model table: at
    * or under this row count it broadcasts (2M rows of short n-gram
    * strings + a long ≈ low hundreds of MB framed — well inside the
    * 8 GB / 512M-row broadcast cap and a trivial executor-memory
    * footprint), above it the scale-correct shuffle plan is kept.
    * Measured cardinalities: 931 distinct bigrams at sf0.1, ~116k on
    * the 125-replica 100x probe corpus (both genuinely broadcastable);
    * a real web-scale corpus has 1e9+ distinct bigrams and shuffles. */
  private val ModelBroadcastMaxRows = 2000000L

  val all: Seq[Q] = Seq(

    // Context-window chunking: split each document into overlapping
    // word windows — the step that turns documents into training
    // sequences. Entirely ROW-LOCAL (split + sequence + explode), so it
    // scales with zero shuffles; output size is input x (1/overlap).
    // Oracle note: the DuckDB side can't lateral-join generate_series on
    // a column, so it cross-joins a CONSTANT range(0,512) (>= 12.8k words
    // per doc; testdata max is 100) and filters — the Spark side has no
    // such cap.
    Q("q_chunk",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .withColumn("ws", split(col("text"), " "))
          .withColumn("nw", size(col("ws")))
        docs
          .withColumn("st",
            explode(sequence(lit(0), greatest(col("nw") - 1, lit(0)),
              lit(ChunkStride))))
          .withColumn("chunk",
            array_join(slice(col("ws"), col("st") + 1, lit(ChunkSize)), " "))
          .withColumn("n_words",
            size(slice(col("ws"), col("st") + 1, lit(ChunkSize))))
          .select(col("doc_id"), (col("st") / ChunkStride).cast("long").as("chunk_id"),
            col("chunk"), col("n_words").cast("long").as("n_words"))
          .orderBy("doc_id", "chunk_id")
      },
      Some(s"""WITH w AS (SELECT doc_id, str_split(text, ' ') AS ws,
             len(str_split(text, ' ')) AS nw FROM documents),
             ch AS (
               SELECT doc_id, t.i AS chunk_id,
                 array_to_string(list_slice(ws, t.i * $ChunkStride + 1,
                   least(t.i * $ChunkStride + $ChunkSize, nw)), ' ') AS chunk,
                 least(t.i * $ChunkStride + $ChunkSize, nw) - t.i * $ChunkStride AS n_words
               FROM w CROSS JOIN range(0, 512) t(i)
               WHERE t.i * $ChunkStride < nw)
             SELECT doc_id, chunk_id, chunk, n_words FROM ch
             ORDER BY doc_id, chunk_id""")),

    // Corpus bigram frequencies, top 25: the first corpus statistic an
    // LM data pipeline computes (boilerplate screens, LM smoothing
    // tables). Bigram generation is row-local (indexed transform over
    // the word array); ONE shuffle on bigram with map-side partial
    // counts; top-k is TakeOrderedAndProject, never a global sort.
    Q("q_bigram",
      (s, d) => {
        // zip_with (ws, tail-slice) instead of element_at inside a
        // transform lambda: per-ELEMENT references to ws would re-evaluate
        // the inlined split() per element — O(words^2) string splits per
        // doc, measured 10.4s vs 0.6s at sf0.1. zip_with references ws a
        // constant number of times per ROW; its one-longer zip pads the
        // final element's partner with null, and concat(null) = null
        // drops it in the filter (also covering one-word docs).
        Tables.documents(s, d)
          .withColumn("ws", split(col("text"), " "))
          .withColumn("bg",
            expr("filter(zip_with(ws, slice(ws, 2, size(ws)), " +
              "(x, y) -> concat(x, ' ', y)), e -> e IS NOT NULL)"))
          .select(explode(col("bg")).as("bigram"))
          .groupBy("bigram")
          .agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), asc("bigram"))
          .limit(25)
      },
      // Oracle note: same constant-range workaround as q_chunk (DuckDB
      // can't lateral-join range() on a column) — the 4096 bound caps
      // ORACLE bigrams at 4096 words/doc (testdata max is 100; Spark
      // side is uncapped).
      Some("""WITH w AS (SELECT doc_id, str_split(text, ' ') AS ws,
             len(str_split(text, ' ')) AS nw FROM documents),
             b AS (SELECT ws[t.i] || ' ' || ws[t.i + 1] AS bigram
                   FROM w CROSS JOIN range(1, 4096) t(i) WHERE t.i <= nw - 1)
             SELECT bigram, count(*) AS n FROM b GROUP BY 1
             ORDER BY n DESC, bigram LIMIT 25""")),

    // Word co-occurrence mining, top 25 pairs by document frequency
    // (the count table behind PMI / embedding co-occurrence stats).
    // Pair generation is ROW-LOCAL — an indexed transform over each
    // doc's sorted-distinct word array (never a self-join); cost is
    // bounded by per-doc distinct vocabulary squared, not corpus size.
    // One shuffle on pair, top-k pruned.
    Q("q_cooccur",
      (s, d) => {
        // Two-step explode with a Generate BETWEEN computing dw and the
        // pair transform: posexplode makes dw a bound attribute for the
        // downstream projection, so slice(dw, ...) reads the computed
        // array instead of re-evaluating the inlined
        // sort(distinct(split())) once per OUTER element (nested-lambda
        // references collapse into the projection — measured 3.6s vs
        // 0.5s at sf0.1).
        val dw = Tables.documents(s, d)
          .select(array_sort(array_distinct(split(col("text"), " "))).as("dw"))
        dw.select(col("dw"), posexplode(col("dw")).as(Seq("i", "x")))
          .select(col("x"), explode(expr("slice(dw, i + 2, size(dw))")).as("y"))
          // group on the (x, y) columns and render the pair string only
          // for the ~vocab^2 aggregated rows, not per exploded pair
          .groupBy("x", "y")
          .agg(count(lit(1)).as("n_docs"))
          .select(concat(col("x"), lit("|"), col("y")).as("pair"), col("n_docs"))
          .orderBy(desc("n_docs"), asc("pair"))
          .limit(25)
      },
      Some("""WITH d AS (SELECT doc_id,
             list_distinct(str_split(text, ' ')) AS ws FROM documents),
             a AS (SELECT doc_id, unnest(ws) AS w1 FROM d),
             b AS (SELECT doc_id, unnest(ws) AS w2 FROM d),
             p AS (SELECT a.w1 || '|' || b.w2 AS pair
                   FROM a JOIN b ON a.doc_id = b.doc_id AND a.w1 < b.w2)
             SELECT pair, count(*) AS n_docs FROM p GROUP BY 1
             ORDER BY n_docs DESC, pair LIMIT 25""")),

    // Funnel analysis: users progressing view -> click -> purchase in
    // strict time order — the canonical product-analytics staged
    // conversion count. Each stage is one filtered pass joined on
    // user_id against the previous stage's first-completion time (equi
    // key + a residual ts predicate), so the whole funnel is three
    // keyed shuffles over pre-filtered slices — never a per-user event
    // list collection. The stage joins go through Skew.adaptiveJoin:
    // on uniform data the plan is the untouched equi-join, but a viral
    // user owning >20% of a stage's events (the classic funnel skew)
    // fans out over salted sub-keys instead of pinning one task.
    Q("q_funnel",
      (s, d) => {
        val e = Tables.events(s, d)
        def firstAfter(stage: String, prev: DataFrame, prevT: String,
            out: String): DataFrame =
          graft.engine.Skew.adaptiveJoin(
              e.filter(col("event_type") === stage), prev, "user_id")
            .filter(col("ts") > col(prevT))
            .groupBy("user_id").agg(min("ts").as(out))
        // r17: checkpoint the lean per-stage (user_id, t) tables — each
        // feeds BOTH the next stage's join and its own count branch, so
        // the lazy union re-ran s1's subtree three times and s2's twice
        // (15 sequential jobs at sf0.1, most of the query's wall); the
        // blocks are freed by the ContextCleaner when the plan is GC'd
        val s1 = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("ts").as("t1"))
          .localCheckpoint(true)
        val s2 = firstAfter("click", s1, "t1", "t2").localCheckpoint(true)
        val s3 = firstAfter("purchase", s2, "t2", "t3")
        def stageCount(df: DataFrame, name: String): DataFrame =
          df.agg(count(lit(1)).as("n_users"))
            .select(lit(name).as("stage"), col("n_users"))
        stageCount(s1, "stage1_view")
          .unionByName(stageCount(s2, "stage2_click"))
          .unionByName(stageCount(s3, "stage3_purchase"))
          .orderBy("stage")
      },
      Some("""WITH s1 AS (
               SELECT user_id, min(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY 1),
             s2 AS (
               SELECT e.user_id, min(ts) AS t2 FROM events e
               JOIN s1 ON e.user_id = s1.user_id
               WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
             s3 AS (
               SELECT e.user_id, min(ts) AS t3 FROM events e
               JOIN s2 ON e.user_id = s2.user_id
               WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
             SELECT 'stage1_view' AS stage, count(*) AS n_users FROM s1
             UNION ALL SELECT 'stage2_click', count(*) FROM s2
             UNION ALL SELECT 'stage3_purchase', count(*) FROM s3
             ORDER BY stage""")),

    // Weekly cohort retention: users bucketed by their FIRST activity
    // week, counted in every later week they return — the standard
    // retention triangle. Two shuffles (first-activity agg + the
    // (cohort, week) count over the distinct user-week pairs), join
    // keyed on user_id. Both engines truncate weeks to ISO Monday and
    // difference exact epoch seconds, so week indexes are integral.
    Q("q_retention",
      (s, d) => {
        val e = Tables.events(s, d)
        val first = e.groupBy("user_id")
          .agg(date_trunc("week", min("ts")).as("w0"))
        val active = e
          .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
          .distinct()
        first.join(active, Seq("user_id"))
          .select(date_format(col("w0"), "yyyy-MM-dd").as("cohort"),
            ((unix_seconds(col("w").cast("timestamp")) -
              unix_seconds(col("w0").cast("timestamp"))) / 604800L)
              .cast("long").as("week_k"))
          .groupBy("cohort", "week_k")
          .agg(count(lit(1)).as("n_users"))
          .orderBy("cohort", "week_k")
      },
      Some("""WITH f AS (
               SELECT user_id, date_trunc('week', min(ts)) AS w0
               FROM events GROUP BY 1),
             a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events),
             r AS (SELECT f.user_id, strftime(f.w0, '%Y-%m-%d') AS cohort,
                     CAST((epoch(a.w) - epoch(f.w0)) / 604800 AS BIGINT) AS week_k
                   FROM f JOIN a ON f.user_id = a.user_id)
             SELECT cohort, week_k, count(*) AS n_users FROM r
             GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Per-user outlier screen: z-score of each event value against the
    // user's own distribution — the anomaly/spam filter shape. ONE
    // shuffle on user_id; all three moments (n, sum, sum-of-squares)
    // share that window partition. Moments go through DECIMAL so they
    // are order-independent (values carry 2 decimals; squares are
    // floor-rounded to 4 before the cast — floor/mult/add are
    // bit-identical IEEE ops in both engines); z itself has an
    // irrational mantissa (sqrt), so plain round(4) per the repo
    // convention. Users with <10 events or zero variance are skipped
    // identically on both sides.
    Q("q_zscore",
      (s, d) => {
        val wu = Window.partitionBy("user_id")
        val sq = floor(col("value") * col("value") * 10000 + 0.5) / 10000
        val withMoments = Tables.events(s, d)
          .withColumn("n", count(lit(1)).over(wu))
          .withColumn("s1", sum(col("value").cast("decimal(18,2)")).over(wu)
            .cast("double"))
          .withColumn("s2", sum(sq.cast("decimal(18,4)")).over(wu)
            .cast("double"))
        val mean = col("s1") / col("n")
        val variance = col("s2") / col("n") - mean * mean
        withMoments
          .filter(col("n") >= 10 && variance > 0)
          .withColumn("z", round((col("value") - mean) / sqrt(variance), 4))
          .filter(abs(col("z")) > 2.5)
          .select("event_id", "user_id", "value", "z")
          .orderBy("event_id")
      },
      Some("""WITH s AS (
               SELECT event_id, user_id, value,
                 count(*) OVER (PARTITION BY user_id) AS n,
                 CAST(SUM(CAST(value AS DECIMAL(18,2)))
                   OVER (PARTITION BY user_id) AS DOUBLE) AS s1,
                 CAST(SUM(CAST(floor(value * value * 10000 + 0.5::DOUBLE) / 10000
                   AS DECIMAL(18,4))) OVER (PARTITION BY user_id) AS DOUBLE) AS s2
               FROM events),
             z AS (
               SELECT event_id, user_id, value,
                 round((value - s1 / n) / sqrt(s2 / n - (s1 / n) * (s1 / n)), 4) AS z
               FROM s WHERE n >= 10 AND s2 / n - (s1 / n) * (s1 / n) > 0)
             SELECT event_id, user_id, value, z FROM z WHERE abs(z) > 2.5
             ORDER BY event_id""")),

    // Language-distribution rebalancing: downsample every language to
    // the smallest language's volume by ACCEPTANCE RATE, not by quota —
    // keep a doc iff hash(doc_id)/2^16 < n_min/n_lang. Rates come from
    // one tiny aggregate (|langs| rows, broadcast); acceptance is then
    // pure per-row hashing — no per-group sort, no window, no state, so
    // the same filter runs identically in a backfill and a streaming
    // micro-batch (the property quota sampling loses). Rate is a
    // rational, so it floor-rounds via r4 on both engines; hv/65536 is
    // a dyadic rational — the comparison is exact IEEE on both sides.
    Q("q_rebalance",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val counts = docs.groupBy("lang").agg(count(lit(1)).as("n_lang"))
        val rates = counts
          .crossJoin(broadcast(counts.agg(min("n_lang").as("n_min"))))
          .withColumn("rate", r4(col("n_min") / col("n_lang")))
          .select("lang", "rate")
        docs.join(broadcast(rates), Seq("lang"))
          .withColumn("hv", Helpers.hash16(col("doc_id")))
          .filter(col("hv") / 65536.0 < col("rate"))
          .select("doc_id", "lang")
          .orderBy("doc_id")
      },
      Some(s"""WITH c AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY 1),
             mn AS (SELECT min(n_lang) AS n_min FROM c),
             r AS (SELECT lang, floor(n_min::DOUBLE / n_lang * 10000 + 0.5::DOUBLE) / 10000 AS rate
                   FROM c CROSS JOIN mn),
             h AS (SELECT doc_id, lang, ${Helpers.hex4("md5(doc_id::VARCHAR)")} AS hv
                   FROM documents)
             SELECT h.doc_id, h.lang FROM h JOIN r ON h.lang = r.lang
             WHERE hv::DOUBLE / 65536.0 < rate ORDER BY doc_id""")),

    // Length-decile profile: exact ntile(10) over (n_chars, doc_id) —
    // the corpus length histogram quality teams read before choosing
    // truncation budgets — WITHOUT ever sorting the corpus. The
    // per-bucket aggregate (count, min, max of n_chars) is fully
    // determined by the (n_chars, count) histogram: rows sharing
    // n_chars are CONTIGUOUS under the ntile order, so the doc_id
    // tie-break decides which doc lands where but never changes the
    // aggregate. Plan: one hash shuffle (groupBy n_chars, cardinality =
    // distinct lengths — tiny vs the corpus), a cumulative count over
    // that histogram (the only ordered window, histogram-sized), then
    // each decile's rank range [blo, bhi] intersected with each
    // length-run's rank range [cum-cnt+1, cum] arithmetically. ntile
    // rank math mirrors the SQL standard: base = N div 10, first
    // N % 10 buckets take one extra row. At 100 TB the corpus is never
    // globally sorted; PlanAuditSpec pins that every single-partition
    // exchange sits above an aggregate.
    Q("q_ntile",
      (s, d) => {
        val hist = Tables.documents(s, d)
          .groupBy("n_chars").agg(count(lit(1)).as("cnt"))
        val w = Window.orderBy("n_chars")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val runs = hist
          .withColumn("cum", sum("cnt").over(w))
          .crossJoin(broadcast(hist.agg(sum("cnt").as("n_total"))))
        val buckets = s.range(1, 11).toDF("b")
        runs.crossJoin(broadcast(buckets))
          .withColumn("base", expr("n_total DIV 10"))
          .withColumn("rem", expr("n_total % 10"))
          .withColumn("blo", expr("(b - 1) * base + least(b - 1, rem) + 1"))
          .withColumn("bhi", expr("b * base + least(b, rem)"))
          .withColumn("overlap",
            expr("least(bhi, cum) - greatest(blo, cum - cnt + 1) + 1"))
          .filter(col("overlap") > 0)
          .groupBy(col("b").cast("int").as("bucket"))
          .agg(sum("overlap").cast("long").as("n_docs"),
            min("n_chars").as("lo"), max("n_chars").as("hi"))
          .orderBy("bucket")
      },
      Some("""WITH t AS (SELECT doc_id, n_chars,
             ntile(10) OVER (ORDER BY n_chars, doc_id) AS bucket FROM documents)
             SELECT bucket, count(*) AS n_docs, min(n_chars) AS lo,
             max(n_chars) AS hi FROM t GROUP BY bucket ORDER BY bucket""")),

    // Sequence packing: assign documents to fixed-capacity (512-word)
    // training bins by CONTIGUOUS FILL — running word count within each
    // language, bin = cumulative-before / capacity (the concat-and-split
    // packing a tokenizer pipeline runs before batching; greedy best-fit
    // isn't order-deterministic, contiguous fill is). Packing is
    // per-LANGUAGE (window partitioned by lang = one shuffle, no global
    // window): at 100 TB bins are shard-local by design — a global
    // running sum would serialize the corpus.
    Q("q_pack",
      (s, d) => {
        val w = Window.partitionBy("lang").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.documents(s, d)
          .withColumn("nw", size(split(col("text"), " ")))
          .withColumn("cum", sum("nw").over(w))
          .withColumn("bin",
            floor((col("cum") - col("nw")) / 512.0).cast("long"))
          .groupBy("lang", "bin")
          .agg(count(lit(1)).as("n_docs"), sum("nw").cast("long").as("total_words"))
          .orderBy("lang", "bin")
      },
      Some("""WITH w AS (SELECT doc_id, lang, len(str_split(text, ' ')) AS nw
             FROM documents),
             c AS (SELECT doc_id, lang, nw,
                     SUM(nw) OVER (PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                   FROM w),
             b AS (SELECT lang, CAST(floor((cum - nw) / 512.0) AS BIGINT) AS bin, nw FROM c)
             SELECT lang, bin, count(*) AS n_docs, SUM(nw)::BIGINT AS total_words
             FROM b GROUP BY lang, bin ORDER BY lang, bin""")),

    // Text canonicalization fingerprint: Unicode NFC + lowercase before
    // hashing — the step that keeps composed/decomposed forms of the
    // same text from defeating every downstream dedup/contamination
    // hash. graft_nfc is the repo's second custom codegen'd Expression
    // (Spark has no built-in normalizer; a UDF would leave whole-stage
    // codegen); DuckDB's nfc_normalize is the oracle mirror. Row-local,
    // zero shuffles.
    Q("q_normalize",
      (s, d) => {
        graft.GraftExtensions.ensureRegistered(s)
        Tables.documents(s, d)
          .select(col("doc_id"),
            md5(expr("graft_nfc(lower(text))").cast("binary")).as("h"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, md5(nfc_normalize(lower(text))) AS h
             FROM documents ORDER BY doc_id""")),

    // Statistical LM quality filter (the CCNet-shape perplexity screen):
    // score every document by the mean log-probability of its bigrams
    // under the corpus bigram model, ln P(w2|w1) = ln(c(w1 w2)/c(w1 ·));
    // the lowest-scoring docs are the spam/boilerplate candidates. The
    // count model tables are groupBys keyed on bigram/unigram (the
    // unigram table derives from the bigram counts — one pass over the
    // bigram stream builds the model, one more probes it); per-doc
    // means go through 1e-6-floor-rounded DECIMAL terms so the sum is
    // order-independent (ln parity at 4-6 decimals is the q_tfidf
    // precedent). Bottom-25 by score with doc_id tie-break. The model
    // tables are vocab-bounded but still grow with corpus breadth, so
    // the probe joins carry no broadcast hint: they shuffle on the
    // model key (bigram / w1) and AQE broadcasts while the model is
    // genuinely under threshold.
    Q("q_lm_score",
      (s, d) => {
        // Pre-aggregated probe stream (doc_id, bigram, c) — memoized+
        // cached (docBigramCounts): both model joins carry distinct
        // bigrams per doc, not raw occurrences, and all three consumers
        // of the bigram stream (probe + bc + uc) read ONE cached build.
        // The per-doc mean over occurrences is recovered exactly as
        // sum(l*c)/sum(c) (l is DECIMAL, c integral, so the weighted
        // sum equals the occurrence sum term-for-term).
        val docBg = docBigramCounts(s, d)
        // r17: materialize the bigram model once (its row count drives
        // the size-aware broadcast branch, and the unigram model
        // re-aggregates it instead of re-running the corpus aggregate —
        // AQE exchange reuse never fired across the differently-pruned
        // consumers); freed by the ContextCleaner when the plan is GC'd
        val bc = docBg.groupBy("bigram").agg(sum("c").as("cb"))
          .localCheckpoint(true)
        val modelSmall = bc.count() <= ModelBroadcastMaxRows
        def sized(t: DataFrame): DataFrame =
          if (modelSmall) broadcast(t) else t
        val uc = bc
          .withColumn("w1", expr("split(bigram, ' ')[0]"))
          .groupBy("w1").agg(sum("cb").as("cu"))
        // r16: the 1e-6-floored log is summed in LONG micro-units
        // instead of DECIMAL(18,6) — floor output is an exact integer,
        // per-doc |sum| < 2^53 (|ln p| <= ~25 -> |l_mic| <= 2.5e7, sum c
        // per doc <= tokens), so sum_long.cast(double)/1e6 is the SAME
        // correctly-rounded double the decimal-sum cast produced, while
        // the aggregation buffer stays a compact long (the old
        // decimal(38,6) buffer paid a BigDecimal add per row — 11.7 s
        // of the query's 12.6 s aggregate time at sf0.1).
        docBg
          .join(sized(bc), Seq("bigram"))
          .withColumn("w1", expr("split(bigram, ' ')[0]"))
          .join(sized(uc), Seq("w1"))
          .withColumn("lmic",
            floor(log(col("cb") / col("cu")) * 1000000 + 0.5).cast("long"))
          .groupBy("doc_id")
          .agg(r4(sum(col("lmic") * col("c")).cast("double") / 1000000.0 /
              sum("c"))
            .as("lm_score"))
          .orderBy("lm_score", "doc_id")
          .limit(25)
      },
      Some("""WITH w AS (SELECT doc_id, str_split(text, ' ') AS ws,
             len(str_split(text, ' ')) AS nw FROM documents),
             bg AS (SELECT doc_id, ws[t.i] AS w1, ws[t.i] || ' ' || ws[t.i + 1] AS bigram
                    FROM w CROSS JOIN range(1, 4096) t(i) WHERE t.i <= nw - 1),
             bc AS (SELECT bigram, count(*) AS cb FROM bg GROUP BY 1),
             uc AS (SELECT w1, count(*) AS cu FROM bg GROUP BY 1),
             lp AS (
               SELECT g.doc_id,
                 CAST(floor(ln(bc.cb::DOUBLE / uc.cu) * 1000000 + 0.5::DOUBLE) / 1000000 AS DECIMAL(18,6)) AS l
               FROM bg g JOIN bc ON g.bigram = bc.bigram JOIN uc ON g.w1 = uc.w1),
             sc AS (SELECT doc_id,
                      floor(CAST(SUM(l) AS DOUBLE) / count(*) * 10000 + 0.5::DOUBLE) / 10000 AS lm_score
                    FROM lp GROUP BY doc_id)
             SELECT doc_id, lm_score FROM sc ORDER BY lm_score, doc_id LIMIT 25""")),

    // Stupid Backoff LM scoring on a HELD-OUT split (Brants et al.
    // 2007 — the web-scale LM: no discounting to normalize, just
    // relative frequencies with a 0.4 backoff): train bigram/unigram
    // tables on doc_id % 10 != 0, score the held-out 10%'s bigrams as
    //   S = cb/cu          when the bigram was seen in training,
    //   S = 0.4*(c2+1)/(N+1)  otherwise (add-one floors unseen words),
    // so the BACKOFF path actually fires (q_lm_score scores in-corpus,
    // where every bigram is known by construction). Each ln(S) is ONE
    // ln over the identical operation tree in both engines, 1e-6-
    // floored into DECIMAL before the sum (the q_dsir/q_lm_score
    // rule); per-doc mean over occurrences recovered as sum(l*c)/
    // sum(c) from the (doc, bigram, c) aggregate. Every join is
    // bigram-/word-keyed over pre-aggregated (distinct-key) inputs;
    // N is a 1-row broadcast scalar. Bottom-25 = the most-surprising
    // held-out docs, the quality-filter readout.
    Q("q_sbo_score",
      (s, d) => {
        // Train/eval bigram streams both derive from the ONE memoized
        // (doc_id, bigram, c) aggregate (docBigramCounts) by doc_id
        // filter — train bigram counts are sum(c) over the train split
        // (identical to counting raw occurrences), and the eval probe
        // stream is the already-aggregated eval rows.
        val docBg = docBigramCounts(s, d)
        val train = Tables.documents(s, d).filter(col("doc_id") % 10 =!= 0)
        // r17: the q_lm_score materialize+size-aware-broadcast
        // treatment was TRIED on tb/tu/tw and reverted — with THREE
        // model tables the extra checkpoint+count jobs outweigh the
        // saved probe shuffles, which AQE already downgrades cheaply
        // at this scale (bench protocol A/B: 0.70 -> 0.95 s at sf0.1)
        val tb = docBg.filter(col("doc_id") % 10 =!= 0)
          .groupBy("bigram").agg(sum("c").as("cb"))
        val tu = tb.withColumn("w1", expr("split(bigram, ' ')[0]"))
          .groupBy("w1").agg(sum("cb").as("cu"))
        // unigram counts over ALL train tokens (not just bigram heads:
        // the last token of each doc counts too)
        val tw = train
          .select(explode(split(col("text"), " ")).as("w2"))
          .filter(col("w2") =!= "")
          .groupBy("w2").agg(count(lit(1)).as("c2"))
        val n1 = tw.agg((sum("c2") + 1).cast("double").as("n1"))
        val evalBg = docBg.filter(col("doc_id") % 10 === 0)
          .withColumn("w1", expr("split(bigram, ' ')[0]"))
          .withColumn("w2", expr("split(bigram, ' ')[1]"))
        evalBg
          .join(tb, Seq("bigram"), "left")
          .join(tu, Seq("w1"), "left")
          .join(tw, Seq("w2"), "left")
          .crossJoin(broadcast(n1))
          .withColumn("sv",
            when(col("cb").isNotNull,
              col("cb").cast("double") / col("cu"))
              .otherwise(lit(0.4) *
                (coalesce(col("c2"), lit(0L)) + 1).cast("double") / col("n1")))
          // LONG micro-units instead of DECIMAL(18,6) — same exactness
          // argument as q_lm_score above (r16)
          .withColumn("lmic",
            floor(log(col("sv")) * 1000000 + 0.5).cast("long"))
          .groupBy("doc_id")
          .agg(r4(sum(col("lmic") * col("c")).cast("double") / 1000000.0 /
              sum("c"))
            .as("sbo_score"))
          .orderBy("sbo_score", "doc_id")
          .limit(25)
      },
      Some("""WITH w AS (SELECT doc_id, str_split(text, ' ') AS ws,
             len(str_split(text, ' ')) AS nw FROM documents),
             tbg AS (SELECT ws[t.i] || ' ' || ws[t.i + 1] AS bigram
                     FROM w CROSS JOIN range(1, 4096) t(i)
                     WHERE doc_id % 10 <> 0 AND t.i <= nw - 1),
             tb AS (SELECT bigram, count(*) AS cb FROM tbg GROUP BY 1),
             tu AS (SELECT str_split(bigram, ' ')[1] AS w1,
                      CAST(sum(cb) AS BIGINT) AS cu FROM tb GROUP BY 1),
             tw AS (SELECT w2, count(*) AS c2 FROM (
                      SELECT unnest(str_split(text, ' ')) AS w2
                      FROM documents WHERE doc_id % 10 <> 0)
                    WHERE w2 <> '' GROUP BY 1),
             n1 AS (SELECT (CAST(sum(c2) AS BIGINT) + 1)::DOUBLE AS n1 FROM tw),
             ebg AS (SELECT doc_id,
                       ws[t.i] || ' ' || ws[t.i + 1] AS bigram,
                       count(*) AS c
                     FROM w CROSS JOIN range(1, 4096) t(i)
                     WHERE doc_id % 10 = 0 AND t.i <= nw - 1
                     GROUP BY 1, 2),
             lp AS (
               SELECT e.doc_id, e.c,
                 CAST(floor(ln(
                   CASE WHEN tb.cb IS NOT NULL
                        THEN tb.cb::DOUBLE / tu.cu
                        ELSE 0.4::DOUBLE *
                          (coalesce(tw.c2, 0) + 1)::DOUBLE / n1.n1 END)
                   * 1000000 + 0.5::DOUBLE) / 1000000 AS DECIMAL(18,6)) AS l
               FROM ebg e
               LEFT JOIN tb ON e.bigram = tb.bigram
               LEFT JOIN tu ON str_split(e.bigram, ' ')[1] = tu.w1
               LEFT JOIN tw ON str_split(e.bigram, ' ')[2] = tw.w2
               CROSS JOIN n1),
             sc AS (SELECT doc_id,
                      floor(CAST(SUM(l * c) AS DOUBLE) / CAST(sum(c) AS BIGINT)
                        * 10000 + 0.5::DOUBLE) / 10000 AS sbo_score
                    FROM lp GROUP BY doc_id)
             SELECT doc_id, sbo_score FROM sc
             ORDER BY sbo_score, doc_id LIMIT 25""")),

    // Per-group exact median (linear-interpolated, the SQL
    // percentile_cont contract): corpus length profile per language.
    // Computed from the (lang, n_chars, count) HISTOGRAM via
    // ExactPercentile — no per-group value→count aggregation buffer
    // (the 100 TB hazard of the exact `percentile` aggregate); the
    // distinct-value mass stays a distributed map-side-combinable
    // table. Interpolated midpoints of integer lengths are dyadic
    // rationals (x.0 / x.5), exact in IEEE on both engines.
    Q("q_median_group",
      (s, d) => ExactPercentile.overHistogram(
          Tables.documents(s, d), Seq("lang"), "n_chars",
          Seq(("median_chars", 0.5)))
        .select(col("lang"), col("n").as("n_docs"), col("median_chars"))
        .orderBy("lang"),
      Some("""SELECT lang, count(n_chars) AS n_docs,
             quantile_cont(n_chars, 0.5) AS median_chars
             FROM documents GROUP BY lang ORDER BY lang""")),

    // Hopping-window aggregation: 60-minute windows sliding every 30 —
    // the batch mirror of the streaming windowed stats (each event lands
    // in exactly 2 windows). Spark's built-in window() generates the
    // window structs row-locally; ONE shuffle on window start with
    // map-side partial counts/sums. Oracle mirrors the epoch-grid
    // window-start arithmetic explicitly (unnest of the two containing
    // starts), so both engines bucket on the same epoch-aligned grid.
    Q("q_hopping",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(window(col("ts"), "60 minutes", "30 minutes").as("w"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
          .select(ntz(col("w.start")).as("w_start"), col("n"), col("total"))
          .orderBy("w_start")
      },
      Some("""WITH e AS (
               SELECT value, to_timestamp(CAST(floor(epoch(ts) / 1800) * 1800
                 AS BIGINT))::TIMESTAMP AS tb
               FROM events),
             x AS (SELECT value, unnest([tb, tb - INTERVAL 30 MINUTE]) AS w_start FROM e)
             SELECT w_start, count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
             FROM x GROUP BY 1 ORDER BY 1""")),

    // Corpus-novelty scoring: the fraction of each document's distinct
    // 3-gram shingles that occur in NO other document — the complement
    // of the dedup signals (q_repetition is INTRA-doc repetition; this
    // is INTER-doc originality: boilerplate and templated text score
    // near 0, genuinely novel text near 1 — a standard keep/downweight
    // signal when curating training mixes). Shares the cached shingle
    // stream with the dedup family; the df table is one map-side-
    // combinable groupBy on the content-derived shingle key and joins
    // back on the same key — two keyed shuffles, linear at any scale
    // (never a pair join: novelty needs only each shingle's document
    // frequency, not who shares it).
    Q("q_novelty",
      (s, d) => {
        val sh = NorthStarQueries.hashedShingles(s, d).select("doc_id", "s")
        val freq = sh.groupBy("s").agg(count(lit(1)).as("df"))
        sh.join(freq, Seq("s"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_unique"))
          .withColumn("novelty",
            r4(col("n_unique").cast("double") / col("n_shingles")))
          .select("doc_id", "n_shingles", "n_unique", "novelty")
          .orderBy("doc_id")
      },
      Some(s"""WITH ${NorthStarQueries.shingleCteUncapped},
             freq AS (SELECT s, count(*) AS df FROM sh GROUP BY s)
             SELECT sh.doc_id, count(*) AS n_shingles,
               CAST(sum(CASE WHEN freq.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
               floor(sum(CASE WHEN freq.df = 1 THEN 1 ELSE 0 END)::DOUBLE
                 / count(*) * 10000 + 0.5::DOUBLE) / 10000 AS novelty
             FROM sh JOIN freq ON sh.s = freq.s
             GROUP BY sh.doc_id ORDER BY doc_id""")),

    // Per-document nearest near-duplicate: each doc's best candidate
    // match by jaccard (ties -> lowest neighbor id) — the triage report
    // a dedup reviewer reads ("what is this doc's closest sibling?").
    // Rides the SAME df-capped candidate pair table as the dedup
    // family (cached; O(candidates), never all-pairs); the per-doc
    // argmax is a WindowGroupLimit top-1 over the symmetrized pair
    // stream — one shuffle on doc_id.
    Q("q_nearest_dup",
      (s, d) => {
        val p = NorthStarQueries.scoredPairs(s, d)
        val sym = p.select(col("d1").as("doc_id"), col("d2").as("nbr"),
            col("jaccard"))
          .unionByName(p.select(col("d2").as("doc_id"),
            col("d1").as("nbr"), col("jaccard")))
        val w = Window.partitionBy("doc_id")
          .orderBy(desc("jaccard"), asc("nbr"))
        sym.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("doc_id", "nbr", "jaccard")
          .orderBy("doc_id")
      },
      Some(s"""WITH ${NorthStarQueries.shingleCte},
             sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
             pairs AS (
               SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
               FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
               GROUP BY 1, 2),
             scored AS (
               SELECT d1, d2,
                 floor(inter::DOUBLE / (s1.n + s2.n - inter) * 10000 + 0.5::DOUBLE) / 10000 AS jaccard
               FROM pairs
               JOIN sizes s1 ON s1.doc_id = d1
               JOIN sizes s2 ON s2.doc_id = d2),
             sym AS (
               SELECT d1 AS doc_id, d2 AS nbr, jaccard FROM scored
               UNION ALL
               SELECT d2 AS doc_id, d1 AS nbr, jaccard FROM scored),
             best AS (
               SELECT doc_id, nbr, jaccard,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY jaccard DESC, nbr) AS rn
               FROM sym)
             SELECT doc_id, nbr, jaccard FROM best WHERE rn = 1
             ORDER BY doc_id""")),

    // IVF recall audit: per query vector, recall@5 of the multi-probe
    // IVF search (probes=2, q_ivf_probe2's configuration) against the
    // brute-force exact top-5 — the index-quality readout an ANN
    // operator tracks to tune nprobe/k (recall drops => retrain or
    // probe deeper). The exact side runs only for the FIXED query set
    // (broadcast of |Q| rows vs the corpus — the audit's honest cost,
    // linear in N); the approx side reads probes/k of the corpus via
    // the cell-keyed join. Recall is a small-rational ratio -> r4
    // floor-rounding on both engines.
    Q("q_ivf_recall",
      (s, d) => {
        val assigned = NorthStarQueries.ivfAssigned(s, d)
        val qFilter = col("vec_id") >= 100 && col("vec_id") < 105
        val approx = graft.engine.Ivf.search(s, assigned,
            NorthStarQueries.trainedCentroids(s, d), qFilter,
            probes = 2, k = 5)
          .select(col("q_id"), col("vec_id"), lit(1).as("hit"))
        val e = NorthStarQueries.emb(s, d)
        val q = e.filter(qFilter).select(col("vec_id").as("q_id"),
          col("emb").as("q_emb"), col("nrm").as("q_nrm"))
        val w = Window.partitionBy("q_id").orderBy(desc("sim"), asc("vec_id"))
        val exact = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
          .withColumn("sim",
            round(expr("graft_dot(q_emb, emb)") / (col("q_nrm") * col("nrm")), 4))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select("q_id", "vec_id")
        exact.join(approx, Seq("q_id", "vec_id"), "left")
          .groupBy("q_id")
          .agg(count(lit(1)).as("k"), count(col("hit")).as("n_hit"))
          .withColumn("recall",
            r4(col("n_hit").cast("double") / col("k")))
          .select("q_id", "n_hit", "recall")
          .orderBy("q_id")
      },
      Some(s"""WITH ${NorthStarQueries.embCte},
             ${NorthStarQueries.kmeansCte},
             scored AS (
               SELECT n.vec_id, n.e, n.nrm, c.cell,
                 round(list_dot_product(n.e, ce) / (n.nrm * cn), 4) AS csim
               FROM n CROSS JOIN c),
             assigned AS (
               SELECT vec_id, e, nrm, cell FROM (
                 SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cell) AS rn
                 FROM scored) WHERE rn = 1),
             q AS (SELECT vec_id AS q_id, e AS qe, nrm AS qn
                   FROM assigned WHERE vec_id >= 100 AND vec_id < 105),
             probe AS (
               SELECT q_id, qe, qn, cell FROM (
                 SELECT q.q_id, q.qe, q.qn, c.cell,
                   row_number() OVER (PARTITION BY q.q_id ORDER BY
                     round(list_dot_product(qe, ce) / (qn * cn), 4) DESC, c.cell) AS pr
                 FROM q CROSS JOIN c) WHERE pr <= 2),
             cand AS (
               SELECT q_id, a.vec_id,
                 round(list_dot_product(qe, a.e) / (qn * a.nrm), 4) AS sim
               FROM probe p JOIN assigned a ON p.cell = a.cell AND a.vec_id <> p.q_id),
             approx AS (
               SELECT q_id, vec_id FROM (
                 SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
                 FROM cand) WHERE rn <= 5),
             ex AS (
               SELECT q.q_id, n.vec_id,
                 round(list_dot_product(qe, n.e) / (qn * n.nrm), 4) AS sim
               FROM q JOIN n ON n.vec_id <> q.q_id),
             exact AS (
               SELECT q_id, vec_id FROM (
                 SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rn
                 FROM ex) WHERE rn <= 5)
             SELECT e.q_id, CAST(count(a.vec_id) AS BIGINT) AS n_hit,
               floor(count(a.vec_id)::DOUBLE / count(*) * 10000 + 0.5::DOUBLE) / 10000 AS recall
             FROM exact e LEFT JOIN approx a
               ON e.q_id = a.q_id AND e.vec_id = a.vec_id
             GROUP BY e.q_id ORDER BY e.q_id"""))
  )
}
