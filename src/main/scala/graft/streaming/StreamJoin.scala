package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream equi-join with an event-time interval bound — the
  * streaming counterpart of the batch as-of join (engine/AsOf.scala):
  * enrich each left-side event with right-side events for the same key
  * that happened within `lookback` BEFORE it.
  *
  * Both sides carry watermarks and the join condition bounds the
  * event-time distance, so the state store only holds `lookback`+watermark
  * worth of rows per side — the requirement for an unbounded run. Without
  * the time bound Spark would (correctly) refuse to plan an append-mode
  * stream-stream join, because matches could arrive forever.
  *
  * Shuffle topology: both streams hash-partition on `key` — the same
  * single-exchange-per-side shape as a batch join, held open over time.
  */
object StreamJoin {

  /** Inner-join `left` to `right` rows of the same `key` whose `rightTs`
    * falls in [leftTs - lookback, leftTs]. Column names must be disjoint
    * except `key` (the right key column is dropped from the output). */
  def joinWithin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, lookback: String = "1 hour"): DataFrame = {
    val l = left.withWatermark(leftTs, lookback).alias("l")
    val r = right.withWatermark(rightTs, lookback).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL $lookback"),
      "inner")
      .drop(col(s"r.$key"))
  }
}
