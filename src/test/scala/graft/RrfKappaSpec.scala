package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Value-level invariants for the round-16 additions — hybrid
  * reciprocal-rank fusion (q_rrf) and the screen-agreement kappa audit
  * (q_kappa). The DuckDB oracle pins cross-engine equality; these pin
  * the math against independent recomputation.
  */
class RrfKappaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q_kappa: contingency cells partition the corpus; kappa matches " +
      "the closed form recomputed from the published cells") {
    val row = run("q_kappa").collect()(0)
    val (n, n11, n10, n01, n00) = (row.getAs[Long]("n"),
      row.getAs[Long]("n11"), row.getAs[Long]("n10"),
      row.getAs[Long]("n01"), row.getAs[Long]("n00"))
    assert(n == n11 + n10 + n01 + n00, "cells must partition the corpus")
    assert(n == graft.engine.Tables.documents(spark, sf).count())
    val agree = n11 + n00
    val peNum = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    assert(row.getAs[Double]("po") == r4(agree.toDouble / n))
    val expected =
      if (n * n == peNum) 0.0
      else r4((n * agree - peNum).toDouble / (n * n - peNum).toDouble)
    val kappa = row.getAs[Double]("kappa")
    assert(kappa == expected, s"kappa=$kappa expected=$expected")
    assert(kappa >= -1.0 && kappa <= 1.0)
  }

  test("q_rrf: fused scores are exactly the 1/(60+rank) arm sums, and " +
      "every emitted doc came from one of the two top-100 arms") {
    val out = run("q_rrf").collect()
    assert(out.length <= 20 && out.nonEmpty)
    // recompute both arms independently (same ranking rule)
    val lex = SparkEntry.queries("q_bm25")(spark, sf) // already top-25 ranked
      .collect().zipWithIndex
      .map { case (r, i) => r.getAs[Long]("doc_id") -> (i + 1) }.toMap
    // semantic arm: rank ALL non-query vectors by rounded cosine vs vec 0
    val e = graft.engine.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val q = e(0L)
    val qn = math.sqrt(dot(q, q))
    val sem = e.toSeq.filter(_._1 != 0L)
      .map { case (id, v) =>
        id -> math.floor((dot(q, v) / (qn * math.sqrt(dot(v, v)))) * 10000
          + 0.5) / 10000 // mirrors round(x, 4) away from half-boundaries
      }
      .sortBy { case (id, s) => (-s, id) }
      .take(100).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1) }.toMap
    def r4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val rl = lex.get(id)
      val rs = sem.get(id)
      // q_bm25 publishes only the top 25 lexical ranks; a doc past that
      // may carry a lexical contribution this recomputation can't see,
      // so only assert exact equality when the arms we recomputed fully
      // explain the score — and ALWAYS assert membership + lower bound.
      assert(rl.isDefined || rs.isDefined,
        s"doc $id in fusion output but in neither recomputed arm")
      val partial = rl.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        rs.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      val got = r.getAs[Double]("rrf")
      if (rl.isDefined || lex.size < 25)
        assert(got == r4(partial), s"doc $id rrf=$got arms=$partial")
      else assert(got >= r4(partial) - 1e-9,
        s"doc $id rrf=$got below its semantic-arm floor $partial")
    }
    // output is sorted by (rrf desc, doc_id)
    val pairs = out.map(r =>
      (r.getAs[Double]("rrf"), r.getAs[Long]("doc_id")))
    assert(pairs.sameElements(pairs.sortBy { case (s, id) => (-s, id) }))
  }
}
