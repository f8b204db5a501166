package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.ExactPercentile

/** ExactPercentile (histogram-based percentile_cont) must be
  * BIT-IDENTICAL to Spark's exact `percentile` aggregate — it replaces
  * that aggregate in four oracle queries, so any drift in the
  * interpolation tree (position = p*(N-1);
  * (higher-position)*v_lo + (position-lower)*v_hi) breaks hash-match. */
class ExactPercentileSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val ps = Seq(("p05", 0.05), ("p25", 0.25), ("p50", 0.5),
    ("p90", 0.9), ("p99", 0.99))

  private def compare(rows: Seq[(String, Double)]): Unit = {
    val df = rows.toDF("g", "v")
    val ours = ExactPercentile.overHistogram(df, Seq("g"), "v", ps)
      .orderBy("g").collect()
    val aggs = count(lit(1)).as("n") +: ps.map { case (n, p) =>
      expr(s"percentile(v, ${p})").as(n) }
    val theirs = df.groupBy("g").agg(aggs.head, aggs.tail: _*)
      .orderBy("g").collect()
    assert(ours.length == theirs.length)
    ours.zip(theirs).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      assert(a.getLong(1) == b.getLong(1), s"n mismatch for ${a.getString(0)}")
      ps.indices.foreach { i =>
        val x = a.getDouble(2 + i); val y = b.getDouble(2 + i)
        assert(java.lang.Double.doubleToRawLongBits(x) ==
          java.lang.Double.doubleToRawLongBits(y),
          s"${ps(i)._1} of group ${a.getString(0)}: ours $x vs percentile $y")
      }
    }
  }

  test("bit-identical to Spark percentile on seeded continuous doubles") {
    val rnd = new scala.util.Random(42)
    compare((1 to 5000).map(_ =>
      (s"g${rnd.nextInt(4)}", rnd.nextDouble() * 1000 - 500)))
  }

  test("bit-identical on heavy ties and 2-decimal values") {
    val rnd = new scala.util.Random(7)
    compare((1 to 5000).map(_ =>
      (s"g${rnd.nextInt(3)}", rnd.nextInt(200) / 100.0 * 12.34)))
  }

  test("bit-identical on tiny groups (1, 2, 3 rows) and negatives") {
    compare(Seq(("a", 5.5), ("b", -1.0), ("b", 3.25),
      ("c", 0.1), ("c", 0.2), ("c", 0.30000000000000004)))
  }

  test("nulls excluded from ranks like the percentile aggregate") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)))
      .toDF("g", "v")
    val r = ExactPercentile.overHistogram(df, Seq("g"), "v",
      Seq(("p50", 0.5))).collect()(0)
    assert(r.getAs[Long]("n") == 2L)
    assert(r.getAs[Double]("p50") == 2.0)
  }
}
