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
             FROM t ORDER BY event_type, day"""))
  )
}
