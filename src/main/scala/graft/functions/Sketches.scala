package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed Spark [[Aggregator]] —
  * the repo's custom-AGGREGATE surface (alongside its custom codegen'd
  * scalar Expressions): a k-counter summary whose partial buffers
  * merge associatively, so Spark runs it map-side-combined like any
  * built-in aggregate.
  *
  * Guarantee (the classic theorem, and what q_heavy_hitters asserts
  * engine-side): every item with true frequency > n/(k+1) is among the
  * final candidates, REGARDLESS of row order, partitioning, or merge
  * tree — each shrink subtracts the same amount from all surviving
  * counters and at most n/(k+1) total error accumulates per item. The
  * merge is the mergeable-summaries form (Agarwal et al., PODS'12):
  * pairwise-sum, then subtract the (k+1)-th largest count and drop
  * non-positives.
  *
  * Candidate counts are lower bounds on true frequency; exact counts
  * come from a normal groupBy — the sketch's job is candidate
  * generation in one pass with O(k) state, the 100 TB shape for "what
  * are the hot keys" over an unbounded-cardinality column.
  */
final class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"k must be >= 1, got $k")

  def zero: Map[String, Long] = Map.empty

  def reduce(m: Map[String, Long], x: String): Map[String, Long] = {
    val m2 = m.updated(x, m.getOrElse(x, 0L) + 1L)
    if (m2.size <= k) m2 else shrink(m2)
  }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val s = b.foldLeft(a) { case (acc, (w, c)) =>
      acc.updated(w, acc.getOrElse(w, 0L) + c)
    }
    if (s.size <= k) s else shrink(s)
  }

  /** Subtract the (k+1)-th largest count from every counter, drop the
    * non-positive — leaves at most k entries. */
  private def shrink(m: Map[String, Long]): Map[String, Long] = {
    val cut = m.values.toSeq.sorted(Ordering[Long].reverse)
      .drop(k).headOption.getOrElse(0L)
    m.collect { case (w, c) if c > cut => w -> (c - cut) }
  }

  def finish(r: Map[String, Long]): Map[String, Long] = r
  def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo
  def outputEncoder: Encoder[Map[String, Long]] = Encoders.kryo
}
