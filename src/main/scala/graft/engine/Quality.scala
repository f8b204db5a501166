package graft.engine

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Data-quality counters via Spark's Observation API — metrics ride the
  * EXISTING job (observe() attaches accumulators to the plan), so a
  * 100 TB write gets row/null/freshness accounting with zero extra
  * passes; the reference logs equivalent stats from driver-side pandas
  * (collector.py logging), which would mean a second full scan here.
  *
  * Streaming: the same `observe` call works on a streaming DataFrame;
  * per-batch values surface in `StreamingQueryProgress.observedMetrics`
  * instead of `Observation.get`.
  */
object Quality {

  /** Attach standard ingest-quality metrics. Returns the instrumented
    * frame (use IT downstream) and the Observation to read after the
    * next action: n_rows, null_keys, null_times, min_time, max_time. */
  def observeIngest(df: DataFrame, keyCol: String, tsCol: String,
      name: String = "ingest-quality"): (DataFrame, Observation) = {
    val obs = Observation(name)
    val instrumented = df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col(keyCol).isNull, 1).otherwise(0)).as("null_keys"),
      sum(when(col(tsCol).isNull, 1).otherwise(0)).as("null_times"),
      min(col(tsCol)).as("min_time"),
      max(col(tsCol)).as("max_time"))
    (instrumented, obs)
  }
}
