package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Views

class ViewsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("registerTestdata exposes tables + graft_dot to spark.sql") {
    Views.registerTestdata(spark, "/root/testdata/sf0.001")
    val r = spark.sql(
      """SELECT count(*) AS n FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey""".stripMargin).collect()(0)
    assert(r.getLong(0) > 0)
    val dot = spark.sql(
      """SELECT graft_dot(cast(embedding as array<double>),
        |                 cast(embedding as array<double>)) AS d
        |FROM embeddings LIMIT 1""".stripMargin).collect()(0)
    assert(math.abs(dot.getDouble(0) - 1.0) < 1e-3) // unit-norm vectors
  }
}
