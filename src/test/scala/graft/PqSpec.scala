package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Pq

/** The parameterized PQ engine path ([[graft.engine.Pq]]) behind the
  * fixed-geometry oracle queries: arbitrary subspace count / codebook
  * size, deterministic codes, and the ADC search's quality behavior —
  * exact retrieval when codebooks are lossless, improving recall as
  * codebooks grow. */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic pseudo-random vectors: coordinate j of vector i is a
    * hash-derived double in [-0.5, 0.5] — reproducible across runs and
    * partitionings without any RNG state. */
  private def vectors(n: Int, dim: Int): DataFrame =
    (0 until n).map { i =>
      (i.toLong, (0 until dim).map { j =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(s"${i}_$j".getBytes("UTF-8"))
        ((h(0) & 0xff) * 256 + (h(1) & 0xff)) / 65535.0 - 0.5
      })
    }.toDF("id", "vec")

  /** Brute-force cosine top-k (the recall reference). */
  private def exactTopK(vecs: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    graft.GraftExtensions.ensureRegistered(spark)
    val e = vecs.select(col("id"), col("vec").cast("array<double>").as("emb"))
      .withColumn("nrm", sqrt(expr("graft_dot(emb, emb)")))
    val q = e.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("q_id"), col("emb").as("qe"), col("nrm").as("qn"))
    val w = Window.partitionBy("q_id").orderBy(desc("sim"), asc("id"))
    e.join(broadcast(q), col("id") =!= col("q_id"))
      .withColumn("sim",
        round(expr("graft_dot(qe, emb)") / (col("qn") * col("nrm")), 4))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select("q_id", "id")
  }

  private def recallAt(vecs: DataFrame, m: Int, subK: Int, k: Int): Double = {
    val dim = vecs.select(size(col("vec"))).head.getInt(0)
    val model = Pq.train(spark, vecs, dim, m, subK)
    val enc = Pq.encode(spark, vecs, model)
    val queryIds = Seq(0L, 1L, 2L)
    val approx = Pq.search(spark, enc, model,
      vecs.filter(col("id").isin(queryIds: _*)), k)
    val exact = exactTopK(vecs, queryIds, k)
    val hits = exact.join(approx.select("q_id", "id"), Seq("q_id", "id"))
      .count()
    hits.toDouble / exact.count()
  }

  test("codes are partition-count-invariant and well-formed") {
    val vecs = vectors(80, 16)
    val model = Pq.train(spark, vecs.repartition(3), 16, m = 4, subK = 8)
    val a = Pq.encode(spark, vecs.repartition(3), model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = Pq.encode(spark, vecs.repartition(13), model)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a == b, "codes depend on partitioning")
    assert(a.size == 80)
    a.values.foreach { codes =>
      assert(codes.length == 4)
      assert(codes.forall(c => c >= 0 && c < 8))
    }
  }

  test("lossless codebooks (subK >= N) retrieve exactly: recall@3 = 1.0") {
    // with one codeword available per vector, k-means converges to the
    // vectors themselves, reconstruction is exact, and ADC ranking
    // matches brute force
    val vecs = vectors(40, 8)
    assert(recallAt(vecs, m = 2, subK = 40, k = 3) == 1.0)
  }

  test("IVF-PQ: full probe equals plain ADC; recall grows with probes") {
    import graft.engine.KMeans
    val vecs = vectors(80, 16)
    val kCoarse = 6
    val model = Pq.train(spark, vecs, 16, m = 2, subK = 32)
    val coarse = KMeans.train(spark,
      vecs.select(col("id").as("vec_id"),
          col("vec").cast("array<double>").as("emb"))
        .withColumn("nrm", sqrt(expr("graft_dot(emb, emb)"))),
      kCoarse, iters = 2)
    val enc = Pq.encode(spark, vecs, model)
      .join(Pq.assignCells(spark, vecs, coarse), "id")
    val queries = vecs.filter(col("id") < 3)

    def key(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("q_id", "id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // probing EVERY cell = no pruning: identical to the flat ADC search
    val full = Pq.searchIvf(spark, enc, coarse, model, queries,
      probes = kCoarse, k = 5)
    val flat = Pq.search(spark, enc.drop("cell"), model, queries, k = 5)
    assert(key(full) == key(flat))
    // probe-1 scans one cell per query: results are a (possibly lossy)
    // subset of candidates — recall vs the flat search can only be
    // recovered by probing deeper, never exceeded
    val p1 = Pq.searchIvf(spark, enc, coarse, model, queries,
      probes = 1, k = 5)
    val hits1 = key(p1).intersect(key(flat)).size
    val hitsAll = key(full).intersect(key(flat)).size
    assert(hits1 <= hitsAll)
    assert(hitsAll == key(flat).size)
  }

  test("recall improves as codebooks grow (the SubK quality lever)") {
    val vecs = vectors(60, 8)
    val coarse = recallAt(vecs, m = 2, subK = 2, k = 5)
    val fine = recallAt(vecs, m = 2, subK = 32, k = 5)
    assert(fine > coarse,
      s"recall did not improve: subK=2 -> $coarse, subK=32 -> $fine")
  }
}
