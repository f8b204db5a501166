package graft.engine

import org.apache.spark.sql.{DataFrame, Observation}
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
    * empty batch is the common case. */
  private def metrics(keyCol: String, tsCol: String) = Seq(
    count(lit(1)).as("n_rows"),
    coalesce(sum(when(col(keyCol).isNull, 1L).otherwise(0L)), lit(0L))
      .as("null_keys"),
    coalesce(sum(when(col(tsCol).isNull, 1L).otherwise(0L)), lit(0L))
      .as("null_times"),
    min(col(tsCol)).as("min_time"),
    max(col(tsCol)).as("max_time"))

  /** BATCH frames: returns the instrumented frame (use IT downstream)
    * and the Observation to read after the next action. (The
    * Observation overload rejects streaming Datasets — use
    * [[observeIngestStream]] there.) */
  def observeIngest(df: DataFrame, keyCol: String, tsCol: String,
      name: String = "ingest-quality"): (DataFrame, Observation) = {
    require(!df.isStreaming, "use observeIngestStream for streaming frames")
    val obs = Observation(name)
    val m = metrics(keyCol, tsCol)
    (df.observe(obs, m.head, m.tail: _*), obs)
  }

  /** STREAMING frames: the name-based observe overload; per-batch values
    * surface in `StreamingQueryProgress.observedMetrics(name)`. */
  def observeIngestStream(df: DataFrame, keyCol: String, tsCol: String,
      name: String = "ingest-quality"): DataFrame = {
    val m = metrics(keyCol, tsCol)
    df.observe(name, m.head, m.tail: _*)
  }
}
