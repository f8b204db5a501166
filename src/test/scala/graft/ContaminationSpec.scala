package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Contamination

/** Parameterized embedding-contamination path (engine/Contamination
  * .scala — the SemDedup split of q_embed_contam): detection on planted
  * near-dups, clean-eval pass-through, and the cell-boundedness
  * invariant that keeps the eval × train pair term linear as the train
  * corpus grows under a FIXED eval set. */
class ContaminationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Well-separated direction groups in 8-dim (the SemDedupSpec
    * fixture): ids offset lets train/eval draw from the same groups. */
  private def vectors(groups: Int, per: Int, idBase: Long) = {
    val rows = for {
      g <- 0 until groups
      m <- 0 until per
    } yield {
      val v = Array.fill(8)(0.001 * ((g * per + m) % 7))
      v(g % 8) = 1.0
      v((g + 3) % 8) += 0.01 * m
      (idBase + g.toLong * per + m, v.toSeq)
    }
    rows.toDF("id", "vec")
  }

  test("planted eval near-dups of train vectors are flagged; fresh directions pass") {
    val train = vectors(groups = 4, per = 5, idBase = 0L)
    // eval: 2 vectors inside train groups 0 and 1 (contaminated), plus
    // 2 on axes no train group uses (clean)
    def axis(i: Int, id: Long) = {
      val v = Array.fill(8)(0.0); v(i) = 1.0; (id, v.toSeq)
    }
    val eval = Seq(
      (100L, { val v = Array.fill(8)(0.0); v(0) = 1.0; v(3) += 0.005; v.toSeq }),
      (101L, { val v = Array.fill(8)(0.0); v(1) = 1.0; v(4) += 0.005; v.toSeq }),
      axis(6, 102L), axis(7, 103L)).toDF("id", "vec")
    val v = Contamination.verdicts(spark, train, eval,
        targetCellSize = 10, tau = 0.95)
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("contaminated"))
      .toMap
    assert(v.size == 4)
    assert(v(100L) && v(101L), s"planted dups not flagged: $v")
    assert(!v(102L) && !v(103L), s"clean eval flagged: $v")
    val kept = Contamination.clean(spark, train, eval,
      targetCellSize = 10, tau = 0.95)
    assert(kept.select("id").collect().map(_.getLong(0)).toSet ==
      Set(102L, 103L))
  }

  test("tau=1.01 flags nothing; every eval vector gets a verdict") {
    val train = vectors(3, 4, 0L)
    val eval = vectors(3, 2, 1000L)
    val v = Contamination.verdicts(spark, train, eval, 100, tau = 1.01)
    assert(v.count() == 6 && v.filter(col("contaminated")).count() == 0)
  }

  test("k tracks the TRAIN corpus: per-cell train membership stays " +
    "bounded as train grows 4x") {
    // the scale invariant behind the eval x train pair join (the
    // SemDedupSpec pattern): with tau=-1 every same-cell train vector
    // is a hit, so an eval vector's n_hits IS its cell's train
    // membership — the quantity that must not scale with the corpus
    val eval = vectors(groups = 2, per = 3, idBase = 9000L)
    def maxHits(groups: Int): Long = {
      val train = vectors(groups, per = 8, idBase = 0L)
      Contamination.verdicts(spark, train, eval, targetCellSize = 16,
          tau = -1.0)
        .agg(max("n_hits")).head().getLong(0)
    }
    val small = maxHits(4)  // N=32,  k=2
    val large = maxHits(16) // N=128, k=8
    assert(small <= 48L, s"small corpus cell membership $small")
    assert(large <= 48L,
      s"large corpus cell membership $large — k failed to scale")
  }
}
