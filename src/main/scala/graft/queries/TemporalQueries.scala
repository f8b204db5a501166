package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Round-8 temporal-monitoring wave: the time-series readouts an
  * ingestion/ops team runs over the event stream —
  *
  *  - q_ewma: per-type exponentially-weighted daily volume (span-16
  *    adjusted EWMA) — the standard smoothed-traffic line on every
  *    monitoring dashboard.
  *  - q_spike: trailing-window spike detection — a day is a spike when
  *    its count exceeds 2x its trailing-7-observation mean; the alert
  *    rule behind "ingestion volume anomaly".
  *
  * Determinism: EWMA terms are count * 0.5^d with d <= 15 — every term
  * and every partial sum is an exact dyadic rational in double (counts
  * < 2^26, scale 2^-15), so the sums are order-independent without
  * DECIMAL; the final ratio is rational -> r4 floor-rounding. Spike
  * flags compare k*c > 2*s in BIGINTs — no floats at all.
  *
  * Scale: both run windows over the per-(type, day) AGGREGATE table
  * (|types| x |days| rows — sub-linear in events); the daily rollup is
  * one map-side-combinable keyed shuffle. */
object TemporalQueries {

  /** EWMA span: trailing observations included (0.5^15 ~ 3e-5 — terms
    * beyond this are noise; the cap is what makes the sums exact). */
  private val EwmaSpan = 16

  private def daily(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("c"))

  private val dailyCte =
    """daily AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
      |            count(*) AS c
      |          FROM events GROUP BY 1, 2)""".stripMargin

  val all: Seq[Q] = Seq(

    Q("q_ewma",
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy("day")
        val base = daily(s, d)
        // explicit lag ladder (16 terms): weight 0.5^k attaches to the
        // k-th PREVIOUS observation; a missing lag (series head)
        // contributes to neither sum — pandas' adjust=True semantics
        val numer = (0 until EwmaSpan).map(k =>
          coalesce(lag(col("c"), k).over(w).cast("double") *
            lit(math.pow(0.5, k)), lit(0.0))).reduce(_ + _)
        val denom = (0 until EwmaSpan).map(k =>
          when(lag(col("c"), k).over(w).isNotNull,
            lit(math.pow(0.5, k))).otherwise(lit(0.0))).reduce(_ + _)
        base
          .withColumn("ewma", Helpers.r4(numer / denom))
          .select("event_type", "day", "c", "ewma")
          .orderBy("event_type", "day")
      },
      Some {
        val numer = (0 until EwmaSpan).map(k =>
          s"coalesce(lag(c, $k) OVER w::DOUBLE * ${math.pow(0.5, k)}, 0)")
          .mkString(" + ")
        val denom = (0 until EwmaSpan).map(k =>
          s"(CASE WHEN lag(c, $k) OVER w IS NOT NULL THEN ${
            math.pow(0.5, k)} ELSE 0 END)").mkString(" + ")
        s"""WITH $dailyCte
           SELECT event_type, day, CAST(c AS BIGINT) AS c,
             floor(($numer) / ($denom) * 10000 + 0.5::DOUBLE) / 10000
               AS ewma
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY day)
           ORDER BY event_type, day"""
      }),

    Q("q_spike",
      (s, d) => {
        val w = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(-7, -1)
        daily(s, d)
          .withColumn("trail_n", count(col("c")).over(w))
          .withColumn("trail_sum", coalesce(sum(col("c")).over(w), lit(0L)))
          // spike: c > 2 * trailing mean, in exact integers
          // (k*c > 2*s <=> c > 2*s/k); series heads (no history) never flag
          .withColumn("is_spike",
            (col("trail_n") > 0) &&
              (col("c") * col("trail_n") > lit(2) * col("trail_sum")))
          .select(col("event_type"), col("day"), col("c"),
            col("trail_n"), col("trail_sum"), col("is_spike"))
          .orderBy("event_type", "day")
      },
      Some(s"""WITH $dailyCte,
             t AS (SELECT event_type, day, c,
                     count(c) OVER w AS trail_n,
                     coalesce(sum(c) OVER w, 0) AS trail_sum
                   FROM daily
                   WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
             SELECT event_type, day, CAST(c AS BIGINT) AS c,
               CAST(trail_n AS BIGINT) AS trail_n,
               CAST(trail_sum AS BIGINT) AS trail_sum,
               (trail_n > 0 AND c * trail_n > 2 * trail_sum) AS is_spike
             FROM t ORDER BY event_type, day""")),

    // CUSUM drift accumulation: the sustained-shift detector q_spike's
    // point rule misses (a +20% volume drift never trips a 2x spike
    // threshold but accumulates linearly in CUSUM). Per type, the
    // classic one-sided CUSUM s_t = max(0, s_{t-1} + (x_t - mean))
    // against the series' own mean, computed WITHOUT the recursion via
    // the reflection identity s_t = S_t - min(0, min_{j<=t} S_j) on the
    // prefix sums — two stacked windows over the per-(type, day)
    // aggregate, sub-linear in events. EXACT integers throughout:
    // deviations are scaled by n_days (dev = nd*c - tot), so "mean" is
    // never a float; drift_max is reported in that nd-scaled unit.
    // Peak ties break to the earliest day.
    Q("q_cusum",
      (s, d) => {
        val base = daily(s, d)
        val totals = base.groupBy("event_type")
          .agg(sum("c").as("tot"), count(lit(1)).as("nd"))
        val wc = Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val scored = base.join(broadcast(totals), "event_type")
          .withColumn("dev", col("nd") * col("c") - col("tot"))
          .withColumn("s_raw", sum("dev").over(wc))
          .withColumn("runmin", min(col("s_raw")).over(wc))
          .withColumn("cusum", col("s_raw") - least(col("runmin"), lit(0L)))
        val wt = Window.partitionBy("event_type")
        scored.withColumn("mx", max(col("cusum")).over(wt))
          .filter(col("cusum") === col("mx"))
          .groupBy(col("event_type"), col("nd").as("n_days"),
            col("mx").as("drift_max"))
          .agg(min(col("day")).as("peak_day"))
          .select("event_type", "n_days", "drift_max", "peak_day")
          .orderBy("event_type")
      },
      Some(s"""WITH $dailyCte,
             tot AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS tot,
                       CAST(count(*) AS BIGINT) AS nd
                     FROM daily GROUP BY 1),
             s1 AS (SELECT d.event_type, d.day, t.nd,
                      sum(t.nd * d.c - t.tot) OVER (
                        PARTITION BY d.event_type ORDER BY d.day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS s_raw
                    FROM daily d JOIN tot t USING (event_type)),
             s2 AS (SELECT event_type, day, nd,
                      s_raw - least(min(s_raw) OVER (
                        PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                        0) AS cusum
                    FROM s1),
             mx AS (SELECT event_type, nd, max(cusum) AS drift_max
                    FROM s2 GROUP BY 1, 2)
             SELECT m.event_type, m.nd AS n_days,
               CAST(m.drift_max AS BIGINT) AS drift_max,
               min(s2.day) AS peak_day
             FROM mx m JOIN s2 ON s2.event_type = m.event_type
               AND s2.cusum = m.drift_max
             GROUP BY 1, 2, 3 ORDER BY m.event_type""")),

    // Daily P50/P95 value bands per event type — THE standing ops
    // readout (latency/size percentile bands per day). Exact
    // interpolated percentiles from the (type, day, value) histogram
    // via ExactPercentile: the percentile never sees corpus rows and no
    // value→count aggregation buffer exists (the q_percentile
    // treatment, here composed per day). One map-side-combinable
    // rollup; windows partition on (type, day). Outputs r4-floored
    // (value domain is 2-decimal rationals — the q_mad_outlier
    // precedent).
    Q("q_daily_p95",
      (s, d) => {
        val hist = Tables.events(s, d)
          .filter(col("value").isNotNull) // quantile_cont null semantics
          .groupBy(col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"), col("value"))
          .agg(count(lit(1)).as("cnt"))
        ExactPercentile.fromCounts(hist, Seq("event_type", "day"),
            "value", "cnt", Seq(("p50", 0.5), ("p95", 0.95)))
          .select(col("event_type"), col("day"), col("n"),
            Helpers.r4(col("p50")).as("p50"),
            Helpers.r4(col("p95")).as("p95"))
          .orderBy("event_type", "day")
      },
      Some("""SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
               CAST(count(value) AS BIGINT) AS n,
               floor(quantile_cont(value, 0.5)
                 * 10000 + 0.5::DOUBLE) / 10000 AS p50,
               floor(quantile_cont(value, 0.95)
                 * 10000 + 0.5::DOUBLE) / 10000 AS p95
             FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))
  )
}
