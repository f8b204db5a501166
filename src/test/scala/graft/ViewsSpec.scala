package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{VersionedParquetSink, Views}

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

  test("GraftSql.run: two dashboard queries via plain SQL strings") {
    val byType = GraftSql.run(spark, "/root/testdata/sf0.001",
      """SELECT event_type, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY n DESC""".stripMargin)
      .collect()
    assert(byType.nonEmpty && byType.map(_.getLong(1)).sum > 0)
    val topCustomers = GraftSql.run(spark, "/root/testdata/sf0.001",
      """SELECT c_name, sum(o_totalprice) AS spend
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_name ORDER BY spend DESC LIMIT 5""".stripMargin)
      .collect()
    assert(topCustomers.length == 5)
    assert(topCustomers.map(_.getDouble(1)).toSeq ==
      topCustomers.map(_.getDouble(1)).sortBy(-_).toSeq)
  }

  test("registerSnapshot exposes a historical version to spark.sql (time travel)") {
    import spark.implicits._
    val sink = new VersionedParquetSink(TestSpark.tmpDir("viewsnap"))
    sink.append(Seq((1, "a"), (2, "b")).toDF("id", "v"), "t") // version 0
    sink.append(Seq((3, "c")).toDF("id", "v"), "t")           // version 1
    val v0 = Views.registerSnapshot(spark, sink, "t", 0)
    assert(v0 == "t_v0")
    assert(spark.sql(s"SELECT count(*) AS n FROM $v0").collect()(0).getLong(0) == 2)
    val v1 = Views.registerSnapshot(spark, sink, "t", 1)
    assert(spark.sql(s"SELECT count(*) AS n FROM $v1").collect()(0).getLong(0) == 3)
    // historical view keeps serving version 0 even after newer appends
    sink.append(Seq((4, "d")).toDF("id", "v"), "t")
    assert(spark.sql(s"SELECT count(*) AS n FROM $v0").collect()(0).getLong(0) == 2)
  }
}
