package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Tables

/** [[graft.plans.NanosRangePushdown]]: time predicates over the
  * nanos->timestamp conversion chain must reach the parquet scan as
  * pushed filters on the raw long column, and the implied bounds must
  * never change results — probed at exact truncation boundaries, which
  * a hand-derived (rather than search-inverted) bound would get wrong. */
class NanosPushdownSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def pushedLine(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n")

  test("timestamp range predicate pushes raw-long bounds to the scan") {
    val df = Tables.events(spark, sf)
      .filter(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp"))
      .select("event_id")
    val pushed = pushedLine(df)
    assert(pushed.contains("GreaterThanOrEqual(ts,"), pushed)
  }

  test("to_date between pushes BOTH raw-long bounds to the scan") {
    val df = Tables.events(spark, sf)
      .filter(to_date(col("ts")).between(lit("2024-01-10"), lit("2024-01-20")))
      .select("event_id")
    val pushed = pushedLine(df)
    assert(pushed.contains("GreaterThanOrEqual(ts,"), pushed)
    // nanos-generation data derives an inclusive bound (our rule);
    // native-timestamp data gets Spark's own exclusive rewrite
    assert(pushed.contains("LessThanOrEqual(ts,") ||
      pushed.contains("LessThan(ts,"), pushed)
  }

  test("pushed plans return identical rows to the unassisted predicate") {
    // Ground truth from Spark itself with no derivable filter chain: the
    // converted micros collected first, then compared in the driver.
    val ev = Tables.events(spark, sf)
    val micros = ev.select(col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val loTs = java.time.LocalDate.of(2024, 1, 10)
    val hiTs = java.time.LocalDate.of(2024, 1, 21) // exclusive
    def dayUs(d: java.time.LocalDate): Long = d.toEpochDay * 86400L * 1000000L

    val expected = micros.collect {
      case (id, us) if us >= dayUs(loTs) && us < dayUs(hiTs) => id
    }.toSet
    val actual = ev
      .filter(to_date(col("ts")).between(lit("2024-01-10"), lit("2024-01-20")))
      .select("event_id").collect().map(_.getLong(0)).toSet
    assert(actual == expected,
      s"missing=${(expected -- actual).take(5)} extra=${(actual -- expected).take(5)}")
    assert(actual.nonEmpty, "fixture range matched no rows — test is vacuous")
  }

  test("derived bounds are exact at 1ns/1us truncation boundaries") {
    import spark.implicits._
    // Raw nanos straddling a microsecond boundary and a day boundary,
    // including negatives (pre-1970), where trunc and floor division
    // diverge — the search-inversion must follow the engine's own eval.
    val dayNs = 86400L * 1000000000L
    val raws = Seq(
      -1001L, -1000L, -999L, -1L, 0L, 1L, 999L, 1000L, 1001L,
      dayNs - 1, dayNs, dayNs + 1, 19732L * dayNs - 1, 19732L * dayNs)
    val df = raws.toDF("raw")
      .withColumn("ts", timestamp_micros(expr("raw div 1000")))

    // cut = epoch day 19732 (2024-01-10) as a timestamp literal
    val cut = lit("2024-01-10 00:00:00").cast("timestamp")
    val expected = df.select(col("raw"), unix_micros(col("ts")).as("us"))
      .collect().filter(_.getLong(1) >= 19732L * 86400L * 1000000L)
      .map(_.getLong(0)).toSet
    val actual = df.filter(col("ts") >= cut)
      .select("raw").collect().map(_.getLong(0)).toSet
    assert(actual == expected, s"expected=$expected actual=$actual")

    // equality at an exact microsecond: all nanos that truncate onto it
    val eqExpected = df.select(col("raw"), unix_micros(col("ts")).as("us"))
      .collect().filter(_.getLong(1) == 0L).map(_.getLong(0)).toSet
    val eqActual = df.filter(col("ts") === lit("1970-01-01 00:00:00").cast("timestamp"))
      .select("raw").collect().map(_.getLong(0)).toSet
    assert(eqActual == eqExpected, s"expected=$eqExpected actual=$eqActual")
  }

  test("rule leaves non-chain filters untouched (idempotent, no noise)") {
    val df = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 10)
    val optimized = df.queryExecution.optimizedPlan.toString
    // exactly the original predicate family — no synthesized conjuncts
    assert(!optimized.contains("86400"), optimized)
    df.collect() // and it still runs
  }
}
