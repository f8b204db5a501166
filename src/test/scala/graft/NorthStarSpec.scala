package graft

import org.scalatest.funsuite.AnyFunSuite

/** Property-style checks over the sf0.001 testdata linking the north-star
  * operators to each other (the DuckDB oracle locks exact values; these
  * lock the relationships between operators). */
class NorthStarSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("minhash LSH candidates recall the high-jaccard pairs") {
    val jaccardPairs = SparkEntry.queries("q_dedup_ngram")(spark, sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val candidates = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(jaccardPairs.nonEmpty, "fixture should contain planted near-dups")
    // 4 bands x 2 rows at jaccard>=0.8 -> expected recall ~1; demand >=90%
    val recalled = jaccardPairs.intersect(candidates)
    assert(recalled.size * 10 >= jaccardPairs.size * 9,
      s"LSH recalled ${recalled.size}/${jaccardPairs.size}")
  }

  test("exact dedup finds no duplicate texts in the synthetic corpus") {
    val n = SparkEntry.queries("q_dedup_exact")(spark, sf).count()
    val total = graft.engine.Tables.documents(spark, sf).count()
    assert(n == total) // all distinct -> one canonical row per doc
  }

  test("ann bucket results are a subset of brute-force cosine ordering") {
    val brute = SparkEntry.queries("q_cosine_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = SparkEntry.queries("q_ann_bucket")(spark, sf).collect()
    assert(ann.nonEmpty)
    // every ANN hit shares the query's bucket; spot-check similarity is
    // bounded by the brute-force top (ANN can only miss, never invent)
    val bruteTop = SparkEntry.queries("q_cosine_topk")(spark, sf)
      .groupBy("q_id").agg(org.apache.spark.sql.functions.max("sim").as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ann.foreach { r =>
      assert(r.getDouble(2) <= bruteTop(r.getLong(0)) + 1e-9)
    }
  }

  test("simhash: near-identical token sets land within small hamming distance") {
    import org.apache.spark.sql.functions._
    val sh = SparkEntry.queries("q_simhash")(spark, sf)
    val pairs = SparkEntry.queries("q_dedup_ngram")(spark, sf).select("d1", "d2")
    val joined = pairs
      .join(sh.withColumnRenamed("doc_id", "d1").withColumnRenamed("simhash", "h1"), "d1")
      .join(sh.withColumnRenamed("doc_id", "d2").withColumnRenamed("simhash", "h2"), "d2")
      .select(bit_count(expr("h1 ^ h2")).as("ham"))
      .collect().map(_.getInt(0))
    assert(joined.nonEmpty)
    // near-dup docs share almost all tokens -> near-identical signatures
    assert(joined.forall(_ <= 4), s"hamming distances: ${joined.toSeq}")
  }
}
