package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Data-quality counters via Spark's Observation API — metrics ride the
  * EXISTING job (observe() attaches accumulators to the plan), so a
  * 100 TB write gets row/null/freshness accounting with zero extra
  * passes; the reference logs equivalent stats from driver-side pandas
  * (collector.py logging), which would mean a second full scan here.
  */
object Quality {

  /** n_rows, null_keys, null_times, min_time, max_time. Null counters
    * coalesce to 0: sum() over an EMPTY batch is NULL, and the idle-poll
    * empty batch is the common case.
    *
    * `tsRange` supplies the value min/max observe — callers whose raw
    * time column is a STRING (e.g. RFC-1123 `published`, which sorts
    * lexicographically by weekday name) pass the parsed timestamp here
    * while the null counter stays on the raw column (a parse failure
    * must not masquerade as a missing value). */
  private def metrics(keyCol: String, tsCol: String,
      tsRange: Option[Column]) = {
    val range = tsRange.getOrElse(col(tsCol))
    Seq(
      count(lit(1)).as("n_rows"),
      coalesce(sum(when(col(keyCol).isNull, 1L).otherwise(0L)), lit(0L))
        .as("null_keys"),
      coalesce(sum(when(col(tsCol).isNull, 1L).otherwise(0L)), lit(0L))
        .as("null_times"),
      min(range).as("min_time"),
      max(range).as("max_time"))
  }

  /** BATCH frames: returns the instrumented frame (use IT downstream)
    * and the Observation to read after the next action. (The
    * Observation overload rejects streaming Datasets — use
    * [[observeIngestStream]] there.) */
  def observeIngest(df: DataFrame, keyCol: String, tsCol: String,
      name: String = "ingest-quality",
      tsRange: Option[Column] = None): (DataFrame, Observation) = {
    require(!df.isStreaming, "use observeIngestStream for streaming frames")
    val obs = Observation(name)
    val m = metrics(keyCol, tsCol, tsRange)
    (df.observe(obs, m.head, m.tail: _*), obs)
  }

  /** STREAMING frames: the name-based observe overload; per-batch values
    * surface in `StreamingQueryProgress.observedMetrics(name)`. */
  def observeIngestStream(df: DataFrame, keyCol: String, tsCol: String,
      name: String = "ingest-quality",
      tsRange: Option[Column] = None): DataFrame = {
    val m = metrics(keyCol, tsCol, tsRange)
    df.observe(name, m.head, m.tail: _*)
  }
}
