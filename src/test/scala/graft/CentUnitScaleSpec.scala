package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.math.BigDecimal

/** Exactness of the r17 two-level long→DECIMAL combines PAST the
  * bounds where the r16 single-level long sums break (VERDICT r16 #1):
  * q_agg_pricing's ~6 global groups mean per-group sums grow with the
  * CORPUS — a plain sum(long).cast(double) loses exactness past 2^53
  * and wraps silently past 2^63. These fixtures use magnitudes a small
  * row count can push past both bounds (per-ROW terms stay inside the
  * documented per-row envelope; only the GROUP totals cross), and
  * assert the published doubles equal an independent BigDecimal
  * reference — i.e. the value the DuckDB DECIMAL-sum oracle produces.
  */
class CentUnitScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Writes the synthetic rows as a parquet `lineitem` so the REAL
    * registered query runs against them. */
  private def lineitemDir(rows: Seq[(Long, Double, Double, Double)]): String = {
    val dir = TestSpark.tmpDir("centunit")
    rows.toDF("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
      .withColumn("l_partkey", col("l_orderkey"))
      .withColumn("l_suppkey", col("l_orderkey"))
      .withColumn("l_linenumber", lit(1))
      .withColumn("l_tax", lit(0.0))
      .withColumn("l_returnflag", lit("A"))
      .withColumn("l_linestatus", lit("F"))
      .withColumn("l_shipdate", lit("1998-01-01").cast("timestamp"))
      .repartition(8, col("l_orderkey")) // several level-1 partials
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("q_agg_pricing sums stay exact past 2^53 and past Long range") {
    // price 9e13 -> 9e15 cents/row; 12 rows total 1.08e17 cents >
    // 2^53 (9.007e15): the old long-sum->double cast loses exactness
    // there, the DECIMAL combine does not. disc_price (discount 0):
    // cent^2 term 9e17/row, total 1.08e19 > 2^63 — a single-level long
    // sum would overflow (ANSI: throw; non-ANSI: wrap), the two-level
    // combine must not. Per-PARTITION partials stay inside the long
    // envelope (~2-4 rows x 9e17 after the 8-way repartition), which
    // is the design's documented per-task bound.
    val rows = (1L to 12L).map(i => (i, 2.0, 9.0e13, 0.0))
    val dir = lineitemDir(rows)
    val out = SparkEntry.queries("q_agg_pricing")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    // BigDecimal reference — the oracle's CAST(SUM(DECIMAL) AS DOUBLE)
    val qty = new BigDecimal("2.00").multiply(new BigDecimal(12))
    val base = new BigDecimal("90000000000000.00").multiply(new BigDecimal(12))
    assert(r.getAs[Double]("sum_qty") == qty.doubleValue())
    assert(r.getAs[Double]("sum_base_price") == base.doubleValue())
    assert(r.getAs[Double]("sum_disc_price") == base.doubleValue(),
      "disc_price (discount 0) must equal the exact decimal base sum " +
        "even though the cent^2 total exceeds 2^63")
    assert(r.getAs[Long]("count_order") == 12L)
    // guard that the fixture actually crosses both lines
    assert(base.movePointRight(2).compareTo(
      new BigDecimal(1L << 53)) > 0, "base must cross 2^53")
    assert(base.movePointRight(4).compareTo(
      new BigDecimal(Long.MaxValue)) > 0, "disc cent^2 must cross 2^63")
  }

  test("q_corr_sums two-word square sums stay exact past Long range") {
    // price 2.9e7 -> pc = 2.9e9, pc^2 = 8.41e18 per row (within the
    // per-row long envelope); 8 rows -> syy total 6.7e19 > 2^63, which
    // a single-level long sum silently wraps. quantity varies so the
    // correlation is well-defined.
    val rows = (1L to 8L).map(i => (i, i.toDouble, 2.9e7 + i, 0.0))
    val dir = lineitemDir(rows)
    val out = SparkEntry.queries("q_corr_sums")(spark, dir).collect()
    assert(out.length == 1)
    val got = out.head.getAs[Double]("corr_qty_price")
    // independent reference in exact BigDecimal arithmetic
    val n = new BigDecimal(8)
    def bd(d: Double) = new BigDecimal(d).setScale(2, java.math.RoundingMode.HALF_UP)
    val xs = rows.map(t => bd(t._2)); val ys = rows.map(t => bd(t._3))
    def s(l: Seq[BigDecimal]) = l.reduce(_.add(_))
    val sx = s(xs); val sy = s(ys)
    val sxy = s(xs.zip(ys).map { case (a, b) => a.multiply(b) })
    val sxx = s(xs.map(a => a.multiply(a)))
    val syy = s(ys.map(a => a.multiply(a)))
    assert(syy.movePointRight(4).compareTo(
      new BigDecimal(Long.MaxValue)) > 0, "fixture must cross 2^63")
    val corr = (n.doubleValue() * sxy.doubleValue() -
      sx.doubleValue() * sy.doubleValue()) /
      math.sqrt((n.doubleValue() * sxx.doubleValue() -
        sx.doubleValue() * sx.doubleValue()) *
        (n.doubleValue() * syy.doubleValue() -
          sy.doubleValue() * sy.doubleValue()))
    val expected = math.floor(corr * 10000 + 0.5) / 10000
    assert(got == expected, s"got $got expected $expected")
  }
}
