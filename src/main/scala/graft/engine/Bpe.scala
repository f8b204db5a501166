package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) tokenizer training — the
  * Sennrich et al. 2016 merge-learning loop re-expressed on the
  * word-frequency table, the missing "train the tokenizer" stage of an
  * LLM data pipeline (the reference stores raw text only,
  * collector.py:96-111; a training pipeline over the same corpus has to
  * learn its subword vocabulary somewhere).
  *
  * Scale shape — why this survives 100 TB:
  *  - The corpus is touched exactly ONCE: `vocabOf` is a word-frequency
  *    groupBy (map-side partial aggregation, one keyed shuffle, linear).
  *    Everything after runs on the vocab table, whose size is the number
  *    of DISTINCT words — millions of rows at web scale, never
  *    corpus-proportional. This is the classic trick that makes BPE
  *    training tractable (learn on type frequencies, not token streams).
  *  - Each merge round is (a) one row-local pair explode + keyed
  *    groupBy(l, r) over the vocab — bounded by total symbols-per-word,
  *    (b) a 1-row TakeOrdered argmax (`limit(1)` — the only collect, one
  *    row per round, the KMeans-centroid precedent), and (c) one
  *    row-local fold applying the merge. No join ever touches the
  *    corpus; no all-pairs anything.
  *  - Rounds are MATERIALIZED with an eager localCheckpoint: the
  *    apply-merge step reads the vocab once but the NEXT round's pair
  *    count reads it again, so a lazily-chained loop hands Catalyst a
  *    2^rounds logical tree (the PageRank lesson, GraphMetrics.scala —
  *    measured 80 s of pure analysis at 5 rounds). Checkpointing keeps
  *    per-round cost flat; on a cluster swap localCheckpoint for
  *    reliable checkpoint() if executor loss must not restart the job.
  *
  * Merge application is a single left-to-right fold over the symbol
  * array (`aggregate` HOF, codegen-friendly, zero UDFs): symbols are
  * re-joined on a separator char and the fold either appends
  * `sep + sym` or — when the accumulator's LAST symbol is exactly the
  * merge's lhs and the incoming symbol is the rhs — appends the bare
  * sym, gluing the pair. The separator guard (`acc == lhs or acc ends
  * with sep+lhs`) makes the last-token test exact (symbols never
  * contain the separator), and greedy leftmost non-overlap falls out:
  * a just-merged token is the string lhs+rhs, which can never equal
  * lhs again (rhs is non-empty), so it cannot chain-merge within the
  * round — byte-for-byte the reference semantics of Sennrich's
  * `re.sub('(?<!\S)' + lhs + ' ' + rhs + '(?!\S)')` pass. The DuckDB
  * oracle runs the IDENTICAL fold via `list_reduce`, so the engines
  * agree exactly (all-integer counts, lexicographic tie-breaks — not a
  * single float anywhere in training).
  *
  * Precondition: the separator (default U+0001) must not occur in the
  * corpus text; callers over untrusted bytes should pick an unused
  * char or pre-filter.
  */
object Bpe {

  val Sep = "\u0001"

  /** One learned merge: `step` (1-based), the glued pair, and the
    * pair's corpus frequency at the time it was chosen. */
  final case class Merge(step: Int, lhs: String, rhs: String, pairN: Long)

  /** Word-frequency table of a text column: (word, cnt), empty tokens
    * dropped. The ONLY corpus-proportional scan in BPE training. */
  def vocabOf(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Initial segmentation: every word split into single characters. */
  private def charSyms(word: Column): Column =
    filter(split(word, ""), x => x =!= "")

  /** The greedy leftmost-non-overlap merge fold (see object doc). */
  private[graft] def applyMerge(syms: Column, lhs: String, rhs: String): Column =
    split(
      aggregate(syms, lit(""), (acc, x) =>
        when(acc === "", x)
          .when(x === lit(rhs) &&
            (acc === lit(lhs) || acc.endsWith(Sep + lhs)), concat(acc, x))
          .otherwise(concat(acc, lit(Sep), x))),
      Sep)

  /** Adjacent symbol pairs of each vocab row, weighted by word count:
    * (l, r, cnt) — row-local zip of the array with its own tail. */
  private def pairsOf(vocab: DataFrame): DataFrame =
    vocab
      .select(col("cnt"),
        explode(arrays_zip(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1))).as("p"))
      .select(col("p.0").as("l"), col("p.1").as("r"), col("cnt"))

  /** Learn `rounds` merges over a (word, cnt) vocab table.
    *
    * Returns the ordered merge list (driver-side, bounded by `rounds` —
    * one row collected per round) and the final segmented vocab
    * (word, cnt, syms: Array[String]), materialized via localCheckpoint.
    * Stops early if the vocab runs out of adjacent pairs. */
  def learn(vocab: DataFrame, rounds: Int): (Seq[Merge], DataFrame) = {
    var v = vocab
      .select(col("word"), col("cnt").cast("long").as("cnt"),
        charSyms(col("word")).as("syms"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= rounds && !exhausted) {
      // argmax pair: count desc, then (l, r) asc — the deterministic
      // tie-break every engine-vs-oracle top-1 in this repo carries
      val top = pairsOf(v)
        .groupBy("l", "r")
        .agg(sum("cnt").as("n"))
        .orderBy(col("n").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect() // bounded: exactly one row per round
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, n) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(step, l, r, n)
        val next = v
          .withColumn("syms", applyMerge(col("syms"), l, r))
          .localCheckpoint(true) // truncate lineage per round (PageRank lesson)
        v.unpersist()
        v = next
        step += 1
      }
    }
    (merges.result(), v)
  }
}
