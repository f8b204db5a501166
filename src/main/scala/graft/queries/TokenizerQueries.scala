package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Bpe, Tables}

/** Round-9 fourth wave: BPE tokenizer training over the corpus — the
  * "learn the subword vocabulary" stage of an LLM data pipeline
  * (Sennrich et al. 2016), the one training-prep primitive the query
  * surface still lacked (q_token_count counts tokens with a fixed
  * regex; these queries LEARN the tokenizer). Engine layer:
  * engine/Bpe.scala (corpus scanned once into a word-frequency table;
  * every merge round runs on the vocab only — see its scale notes).
  *
  * The DuckDB oracle replays training EXACTLY: the unrolled
  * merge-round chain (v0 -> m1 -> v1 -> ... -> mR -> vR) with the
  * IDENTICAL greedy fold (`list_reduce` there, `aggregate` HOF here),
  * all-integer pair counts and lexicographic (n DESC, l, r) argmax
  * tie-breaks, so the learned merge tables hash-match byte for byte.
  * Multiply-read CTEs are AS MATERIALIZED (the PageRank-oracle lesson:
  * DuckDB re-inlines referenced CTEs, and each v_t is read by both
  * p_{t+1} and v_{t+1}, so an unhinted chain re-evaluates the corpus
  * scan 2^R times).
  *
  * Learning runs once per (session, dir) and is shared by all three
  * queries (the scoredPairs memoization discipline); the merge list
  * itself is driver-side by construction (one collected row per round).
  */
object TokenizerQueries {

  /** Merge rounds to learn. Fixed so the oracle can unroll; deep
    * enough that the merge table shows real multi-char subwords on the
    * corpus, shallow enough that the unrolled oracle stays cheap. */
  private val Rounds = 8

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), (Seq[Bpe.Merge], DataFrame)]()

  /** Drops every memoized training run — ScaleProbe calls this before
    * timing a BPE query so the probe measures TRAINING cost (the
    * vocab-proportional part that grows with the corpus), not a warm
    * cache read. */
  private[graft] def invalidate(): Unit = {
    import scala.jdk.CollectionConverters._
    cache.values.asScala.foreach { v =>
      try v._2.unpersist() catch { case _: Exception => () }
    }
    cache.clear()
  }

  /** Memoized learn() per (session, dir) — same hygiene as
    * NorthStarQueries.memoize: drop stopped sessions, keep one dir. */
  private[queries] def learned(s: SparkSession, d: String): (Seq[Bpe.Merge], DataFrame) = {
    cache.keySet.removeIf(k => k._1.sparkContext.isStopped)
    import scala.jdk.CollectionConverters._
    cache.entrySet.asScala
      .filter(e => e.getKey._1 == s && e.getKey._2 != d).toSeq
      .foreach { e =>
        try e.getValue._2.unpersist() catch { case _: Exception => () }
        cache.remove(e.getKey)
      }
    cache.computeIfAbsent((s, d),
      _ => Bpe.learn(Bpe.vocabOf(Tables.documents(s, d)), Rounds))
  }

  private def r4(c: org.apache.spark.sql.Column) = Helpers.r4(c)

  // ---- oracle: the unrolled training chain ------------------------------

  private val vocabCte =
    """w0 AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
      |v0 AS MATERIALIZED (
      |  SELECT w, count(*) AS cnt,
      |         array_to_string(string_split(w, ''), chr(1)) AS syms
      |  FROM w0 WHERE w <> '' GROUP BY w)""".stripMargin

  /** CTE chain for rounds 1..R: pair counts, argmax, merged vocab. */
  private def roundCtes(r: Int): String =
    (1 to r).map { t =>
      s"""p$t AS (
         |  SELECT a[i] AS l, a[i + 1] AS r, CAST(sum(cnt) AS BIGINT) AS n
         |  FROM (SELECT string_split(syms, chr(1)) AS a, cnt FROM v${t - 1}),
         |       LATERAL unnest(range(1, len(a))) AS u$t(i)
         |  GROUP BY 1, 2),
         |m$t AS MATERIALIZED (
         |  SELECT l, r, n FROM p$t ORDER BY n DESC, l, r LIMIT 1),
         |v$t AS MATERIALIZED (
         |  SELECT w, cnt,
         |    list_reduce(string_split(syms, chr(1)), (acc, x) ->
         |      CASE WHEN x = m.r AND
         |                (acc = m.l OR ends_with(acc, chr(1) || m.l))
         |           THEN acc || x ELSE acc || chr(1) || x END) AS syms
         |  FROM v${t - 1}, m$t AS m)""".stripMargin
    }.mkString(",\n")

  private def chain(r: Int): String =
    s"WITH $vocabCte,\n${roundCtes(r)}"

  // -----------------------------------------------------------------------

  val all: Seq[Q] = Seq(

    // the learned merge table — the tokenizer's model artifact
    Q("q_bpe_merges",
      (s, d) => {
        import s.implicits._
        learned(s, d)._1
          .toDF("step", "lhs", "rhs", "pair_n")
          .orderBy("step")
      },
      Some(s"""${chain(Rounds)}
        SELECT step, lhs, rhs, pair_n FROM (
          ${(1 to Rounds).map(t =>
             s"SELECT $t AS step, l AS lhs, r AS rhs, n AS pair_n FROM m$t")
             .mkString("\n UNION ALL ")})
        ORDER BY step""")),

    // the learned subword inventory with corpus usage: token instances
    // served and distinct words touched, per symbol
    Q("q_bpe_vocab",
      (s, d) => learned(s, d)._2
        .select(col("word"), col("cnt"), explode(col("syms")).as("sym"))
        .groupBy("sym")
        .agg(sum("cnt").as("n_tok"), countDistinct("word").as("n_words"))
        .orderBy(col("n_tok").desc, col("sym").asc),
      Some(s"""${chain(Rounds)}
        SELECT sym, CAST(sum(cnt) AS BIGINT) AS n_tok,
               count(DISTINCT w) AS n_words
        FROM (SELECT w, cnt, unnest(string_split(syms, chr(1))) AS sym
              FROM v$Rounds)
        GROUP BY sym ORDER BY n_tok DESC, sym""")),

    // APPLY the learned tokenizer to the corpus, per source: BPE
    // segmentation is word-level, so application is one corpus explode
    // + a word-keyed join against the trained vocab's segment counts
    // (every corpus word is in the vocab by construction) — the honest
    // 100 TB apply path: the corpus streams once through a keyed join
    // (AQE broadcasts the vocab side while it fits), per-source
    // fertility under the LEARNED subwords (q_fertility's fixed-regex
    // counterpart). Inner join drops the empty-token rows the vocab
    // never held.
    Q("q_bpe_apply",
      (s, d) => {
        val vocab = learned(s, d)._2
          .select(col("word"), size(col("syms")).as("n_sub"))
        Tables.documents(s, d)
          .select(col("source"),
            explode(split(col("text"), " ")).as("word"))
          .join(vocab, "word")
          .groupBy("source")
          .agg(count(lit(1)).as("n_words"),
            sum("n_sub").as("n_tokens"))
          .select(col("source"), col("n_words"), col("n_tokens"),
            r4(col("n_tokens").cast("double") / col("n_words"))
              .as("fertility"))
          .orderBy("source")
      },
      Some(s"""${chain(Rounds)},
        nw AS (SELECT source, unnest(string_split(text, ' ')) AS w
               FROM documents),
        j AS (SELECT source, len(string_split(v.syms, chr(1))) AS n_sub
              FROM nw JOIN v$Rounds v ON nw.w = v.w)
        SELECT source, count(*) AS n_words,
               CAST(sum(n_sub) AS BIGINT) AS n_tokens,
               floor(sum(n_sub)::DOUBLE / count(*)
                 * 10000 + 0.5::DOUBLE) / 10000 AS fertility
        FROM j GROUP BY source ORDER BY source""")),

    // compression audit: corpus token count before (chars) and after
    // the learned merges — the number a tokenizer budget planner reads
    Q("q_bpe_compress",
      (s, d) => learned(s, d)._2
        .agg(sum("cnt").as("n_words"),
          sum(col("cnt") * length(col("word"))).as("n_chars"),
          sum(col("cnt") * size(col("syms"))).as("n_tokens"))
        .select(col("n_words"), col("n_chars"), col("n_tokens"),
          r4(col("n_tokens").cast("double") / col("n_chars")).as("ratio")),
      Some(s"""${chain(Rounds)}
        SELECT CAST(sum(cnt) AS BIGINT) AS n_words,
               CAST(sum(cnt * len(w)) AS BIGINT) AS n_chars,
               CAST(sum(cnt * len(string_split(syms, chr(1)))) AS BIGINT)
                 AS n_tokens,
               floor(sum(cnt * len(string_split(syms, chr(1))))::DOUBLE /
                     sum(cnt * len(w)) * 10000 + 0.5::DOUBLE) / 10000 AS ratio
        FROM v$Rounds"""))
  )
}
