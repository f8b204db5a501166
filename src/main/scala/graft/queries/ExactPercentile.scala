package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles computed FROM a value histogram — the
  * scale-safe spelling of `percentile(v, p)`.
  *
  * Spark's exact `Percentile` aggregate holds a value→count map per
  * group inside ONE aggregation buffer: on a continuous domain at
  * 100 TB with few groups, that buffer is O(distinct values) executor
  * heap — the aggregation, not the shuffle, is the scale killer. The
  * same numbers fall out of the (group, value, count) histogram with a
  * window cumsum and two conditional aggregates, so the distinct-value
  * mass stays a DISTRIBUTED table (map-side-combinable groupBy) and no
  * single buffer ever materializes it — the q_ntile
  * window-over-aggregate treatment generalized to percentile_cont.
  *
  * Parallelism bound: the cumsum window partitions by the GROUP, so
  * each group's histogram sorts in one (spillable) task — groups are
  * the parallelism unit, same as any per-group sort. That is the right
  * trade everywhere percentiles are grouped (q_daily_p95's hundreds of
  * (type, day) cells); the single global-percentile consumer
  * (q_approx_percentile's exact comparator) accepts a one-task cumsum
  * over its value histogram, which is still strictly better than the
  * `percentile` aggregate it replaced: a sort-based window SPILLS,
  * an in-memory value→count aggregation buffer cannot. A truly
  * distributed global exact percentile needs a range-partitioned
  * prefix-sum — out of contract here because Spark's own Percentile
  * semantics (what the oracle pins) are defined by this exact
  * interpolation over one ordered pass.
  *
  * Determinism: the interpolation replicates Spark Percentile's
  * operation tree node for node — `position = p * (N - 1)` (0-based),
  * `lower = floor(position)`, `higher = ceil(position)`, result
  * `(higher - position) * v_lo + (position - lower) * v_hi` — so the
  * output is bit-identical to what `percentile(v, p)` returns, and the
  * DuckDB `quantile_cont` oracle keeps matching exactly as before.
  */
object ExactPercentile {

  /** Percentiles of `valueCol` per `groupCols` group from raw rows:
    * returns one row per group with `groupCols`, `n` (non-null value
    * count — what percentile ranks are computed over; oracle mirrors
    * must spell `count(valueCol)`, not `count(*)`), and one double
    * column per requested (name, p). A group whose values are ALL null
    * is omitted (it has no ranks); [[fromCounts]] callers must filter
    * null values out of their histogram for the same reason — a
    * (group, NULL, cnt) row would shift every rank. */
  def overHistogram(df: DataFrame, groupCols: Seq[String],
      valueCol: String, ps: Seq[(String, Double)]): DataFrame = {
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
    fromCounts(hist, groupCols, valueCol, "__cnt", ps)
  }

  /** Same, from an existing (groupCols..., valueCol, cntCol) histogram
    * (counts must be positive; one row per distinct value per group). */
  def fromCounts(hist: DataFrame, groupCols: Seq[String],
      valueCol: String, cntCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    val cumW = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(valueCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grpW = Window.partitionBy(groupCols.map(col): _*)
    // __cum/__n are histogram-sized window passes (sub-linear in corpus
    // rows); __pos/__lo/__hi are group constants carried on every row
    val prepared = ps.zipWithIndex.foldLeft(
      hist.withColumn("__cum", sum(col(cntCol)).over(cumW))
        .withColumn("__n", sum(col(cntCol)).over(grpW))) {
      case (d, ((_, p), i)) =>
        d.withColumn(s"__pos_$i",
            lit(p) * (col("__n") - 1).cast("double"))
          .withColumn(s"__lo_$i", floor(col(s"__pos_$i")))
          .withColumn(s"__hi_$i", ceil(col(s"__pos_$i")))
    }
    val v = col(valueCol).cast("double")
    val aggs: Seq[Column] =
      max(col("__n")).as("n") +: ps.zipWithIndex.flatMap { case (_, i) =>
        Seq(
          // value at 0-based rank __lo / __hi: first histogram run whose
          // cumulative count covers that rank (min over a null-gated when)
          min(when(col("__cum") >= col(s"__lo_$i") + 1, v)).as(s"__vlo_$i"),
          min(when(col("__cum") >= col(s"__hi_$i") + 1, v)).as(s"__vhi_$i"),
          max(col(s"__pos_$i")).as(s"__p_$i"),
          max(col(s"__lo_$i")).as(s"__l_$i"),
          max(col(s"__hi_$i")).as(s"__h_$i"))
      }
    val agged = prepared.groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val withResults = ps.zipWithIndex.foldLeft(agged) {
      case (d, ((name, _), i)) =>
        // the v_lo == v_hi shortcut mirrors Spark's Percentile: with a
        // tie spanning both ranks it returns the value itself —
        // interpolating v with v computes (h-p)*v + (p-l)*v, which can
        // land 1 ulp off v
        d.withColumn(name,
          when(col(s"__l_$i") === col(s"__h_$i") ||
              col(s"__vlo_$i") === col(s"__vhi_$i"), col(s"__vlo_$i"))
            .otherwise(
              (col(s"__h_$i") - col(s"__p_$i")) * col(s"__vlo_$i") +
                (col(s"__p_$i") - col(s"__l_$i")) * col(s"__vhi_$i")))
    }
    withResults.select(
      (groupCols.map(col) ++ (col("n") +: ps.map(p => col(p._1)))): _*)
  }
}
