package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Graph

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val edges = Seq(
    (2L, 1L), (2L, 3L),           // chain 1-2-3
    (10L, 11L),                   // pair
    (20L, 21L), (21L, 22L), (22L, 20L) // triangle
  ).toDF("d1", "d2")

  private val expected = Map(
    1L -> 1L, 2L -> 1L, 3L -> 1L,
    10L -> 10L, 11L -> 10L,
    20L -> 20L, 21L -> 20L, 22L -> 20L)

  test("driver union-find labels components by min id") {
    val got = Graph.connectedComponents(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("iterative min-label propagation agrees with union-find") {
    // direct call: connectedComponents' distributed path routes to
    // large-star/small-star, which has its own tests below
    val got = Graph.iterativeMinLabel(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("distributed path of connectedComponents agrees with union-find") {
    val got = Graph.connectedComponents(spark, edges, driverMaxEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("large-star/small-star agrees with union-find on the fixture") {
    val got = Graph.largeStarSmallStar(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("large-star/small-star converges on a 200-node chain") {
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("d1", "d2")
    val got = Graph.largeStarSmallStar(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 200)
    assert(got.values.toSet == Set(0L))
  }

  test("property: all three strategies agree on seeded random graphs") {
    for (seed <- Seq(7, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      val n = 40
      val es = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val df = es.toDF("d1", "d2")
      val uf = Graph.connectedComponents(spark, df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val lsss = Graph.largeStarSmallStar(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val iml = Graph.iterativeMinLabel(df)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(lsss == uf, s"large/small-star vs union-find, seed=$seed")
      assert(iml == uf, s"min-label vs union-find, seed=$seed")
    }
  }

  test("large-star/small-star matches union-find on a 10k-edge random graph") {
    // non-toy scale for the distributed path: 4k vertices, 10k random
    // edges -> a few hundred multi-node components plus isolated chains
    val rnd = new scala.util.Random(2024)
    val n = 4000
    val es = Seq.fill(10000)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    val df = es.toDF("d1", "d2")
    val uf = Graph.connectedComponents(spark, df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lsss = Graph.largeStarSmallStar(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lsss == uf)
  }

  test("pointer jumping converges on a 200-node chain within the round cap") {
    // diameter 199: plain one-hop propagation would need 199 rounds and
    // trip the maxIter guard; pointer jumping needs ~log2(200)
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("d1", "d2")
    val got = Graph.iterativeMinLabel(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 200)
    assert(got.values.toSet == Set(0L))
  }
}
