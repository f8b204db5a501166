package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.SemDedup

class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic synthetic vectors: `groups` well-separated direction
    * groups (axis-aligned in a 8-dim space, rotating axes), `per` members
    * each — members of one group are near-duplicates (cosine ~1 after
    * the tiny per-member jitter on a second axis), across groups ~0. */
  private def corpus(groups: Int, per: Int) = {
    val rows = for {
      g <- 0 until groups
      m <- 0 until per
    } yield {
      val v = Array.fill(8)(0.001 * ((g * per + m) % 7))
      v(g % 8) = 1.0
      v((g + 3) % 8) += 0.01 * m // jitter: member 0 is centroid-nearest
      ((g.toLong * per + m), v.toSeq)
    }
    rows.toDF("id", "vec")
  }

  test("near-duplicate groups keep exactly one representative; distinct vectors survive") {
    val df = corpus(groups = 4, per = 5)
    val v = SemDedup.verdicts(spark, df, targetCellSize = 10, tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(v.size == 20)
    // each 5-member near-dup group keeps >= 1 member; most are removed
    val removed = v.count(_._2)
    assert(removed >= 12 && removed <= 16, s"removed=$removed of 20")
    val kept = SemDedup.dedup(spark, df, targetCellSize = 10, tau = 0.95)
    assert(kept.count() == 20 - removed)
    // determinism: identical verdicts on a re-run
    val v2 = SemDedup.verdicts(spark, df, targetCellSize = 10, tau = 0.95)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).toMap
    assert(v2 == v)
  }

  test("tau=1.01 removes nothing; tau=-1 within a cell keeps exactly one per cell") {
    val df = corpus(groups = 3, per = 4)
    val none = SemDedup.verdicts(spark, df, targetCellSize = 100, tau = 1.01)
    assert(none.filter(col("removed")).count() == 0)
    val all = SemDedup.verdicts(spark, df, targetCellSize = 100, tau = -1.0)
    // every pair in a cell is a "duplicate": one survivor per cell
    val perCell = all.groupBy("cell")
      .agg(count(lit(1)).as("n"),
        sum(when(col("removed"), 0L).otherwise(1L)).as("kept"))
      .collect()
    perCell.foreach(r => assert(r.getLong(2) == 1L,
      s"cell ${r.get(0)}: expected 1 survivor, got ${r.getLong(2)} of ${r.getLong(1)}"))
  }

  test("k tracks corpus size: cells stay bounded near the target as N grows 4x") {
    // the scale invariant behind the N^2/k pair join: k = ceil(N/target)
    // re-derives from the input, so cluster membership stays ~target at
    // any corpus size (the fixed-k oracle query can't do this; this
    // engine path is the 100 TB configuration)
    def maxCell(groups: Int): Long = {
      val df = corpus(groups, per = 8)
      SemDedup.verdicts(spark, df, targetCellSize = 16, tau = 0.95)
        .groupBy("cell").agg(count(lit(1)).as("n"))
        .agg(max("n")).head().getLong(0)
    }
    val small = maxCell(4)  // N=32,  k=2
    val large = maxCell(16) // N=128, k=8
    // with k scaling, the largest cell must NOT scale with N: allow
    // skew up to 3x the target but not the 4x corpus growth
    assert(small <= 48, s"small corpus max cell $small")
    assert(large <= 48, s"large corpus max cell $large — k failed to scale")
  }
}
