package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.BudgetFill

/** Waterfilling allocation (engine/BudgetFill) on SKEWED fixtures —
  * the synthetic corpus's sources are uniform (nobody saturates, the
  * oracle row only checks the proportional branch), so the saturation
  * prefix, redistribution, and edge cases are pinned here. */
class BudgetFillSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fill(rows: Seq[(String, Long, Long)], num: Long = 1L,
      den: Long = 2L) =
    BudgetFill.waterfill(rows.toDF("source", "d", "t"), num, den)
      .collect().map(r => r.getAs[String]("source") ->
        ((r.getAs[Boolean]("saturated"), r.getAs[Long]("alloc"),
          r.getAs[Long]("B")))).toMap

  test("token-poor source saturates; freed budget redistributes") {
    // equal weights, skewed supply: total 1000, budget 500.
    // Proportional share would be 125 each, but `tiny` only has 10 —
    // it saturates and the other three split the remaining 490.
    val r = fill(Seq(("tiny", 10L, 10L), ("a", 10L, 330L),
      ("b", 10L, 330L), ("c", 10L, 330L)))
    assert(r("tiny") == ((true, 10L, 500L)))
    // (500 - 10) * 10 DIV 30 = 163 each
    Seq("a", "b", "c").foreach(s => assert(r(s) == ((false, 163L, 500L))))
    // conservation: within |unsat| of the budget, never over
    val used = r.values.map(_._2).sum
    assert(used <= 500L && 500L - used < 3)
  }

  test("cascading saturation: the saturated set is a prefix by t/d") {
    // budget 600 of 1200; s1 (cap 50) and s2 (cap 150) both sit below
    // the final water line and saturate; s3/s4 share the rest by weight
    val r = fill(Seq(("s1", 10L, 50L), ("s2", 10L, 150L),
      ("s3", 10L, 500L), ("s4", 10L, 500L)))
    assert(r("s1")._1 && r("s2")._1)
    assert(!r("s3")._1 && !r("s4")._1)
    assert(r("s1")._2 == 50L && r("s2")._2 == 150L)
    assert(r("s3")._2 == 200L && r("s4")._2 == 200L) // (600-200)*10/20
  }

  test("budget >= supply: everyone saturates at their cap") {
    val r = fill(Seq(("a", 1L, 100L), ("b", 1L, 300L)), num = 1L, den = 1L)
    assert(r.values.forall(_._1))
    assert(r("a")._2 == 100L && r("b")._2 == 300L)
  }

  test("weights drive the unsaturated split") {
    // no one saturates; allocations proportional to d, floored
    val r = fill(Seq(("x", 1L, 1000L), ("y", 3L, 1000L)))
    assert(r.values.forall(!_._1))
    assert(r("x")._2 == 250L && r("y")._2 == 750L) // B=1000 split 1:3
  }

  test("deterministic tie-break on equal ratios") {
    val a = fill(Seq(("m", 5L, 100L), ("n", 5L, 100L), ("o", 5L, 700L)))
    val b = fill(Seq(("o", 5L, 700L), ("n", 5L, 100L), ("m", 5L, 100L)))
    assert(a == b, "input order changed the allocation")
  }

  /** Plain-Scala reference waterfill (the textbook iterative form):
    * repeatedly saturate any source whose proportional share exceeds
    * its cap, redistribute, until stable. */
  private def reference(rows: Seq[(String, Long, Long)],
      num: Long, den: Long): Map[String, Long] = {
    val budget = rows.map(_._3).sum * num / den
    var sat = Map.empty[String, Long]
    var active = rows
    var remB = budget
    var changed = true
    while (changed) {
      changed = false
      val w = active.map(_._2).sum
      if (w > 0) {
        // saturate the smallest-ratio violator first (prefix order)
        val viol = active
          .filter { case (_, d, t) => t * w <= remB * d }
          .sortBy { case (s, d, t) => (t.toDouble / d, s) }
          .headOption
        viol.foreach { case (src, _, t) =>
          sat += src -> t; remB -= t
          active = active.filterNot(_._1 == src)
          changed = true
        }
      }
    }
    val w = active.map(_._2).sum
    sat ++ active.map { case (s, d, _) =>
      s -> (if (w == 0) 0L else remB * d / w) }.toMap
  }

  test("property: matches the iterative reference on 20 random inputs") {
    val rnd = new scala.util.Random(1234)
    (0 until 20).foreach { i =>
      val n = 2 + rnd.nextInt(6)
      val rows = (0 until n).map(j =>
        (f"s$j%02d", 1L + rnd.nextInt(20), 1L + rnd.nextInt(1000).toLong))
      val num = 1L + rnd.nextInt(2) // budget 1/3..2/3 of supply
      val den = 3L
      val got = fill(rows, num, den).map { case (s, (_, a, _)) => s -> a }
      val want = reference(rows, num, den)
      val budget = rows.map(_._3).sum * num / den
      // exact agreement with the reference
      assert(got == want, s"seed-case $i: $rows got $got want $want")
      // invariants: never over cap, never over budget
      rows.foreach { case (s, _, t) => assert(got(s) <= t, s"case $i cap") }
      assert(got.values.sum <= budget, s"case $i overspent")
    }
  }
}
