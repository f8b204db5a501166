package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Value-level invariants for the second round-16 wave — the
  * per-source embedding-centroid similarity matrix (q_centroid_sim)
  * and the directional containment audit (q_containment). The DuckDB
  * oracle pins cross-engine equality; these pin the math.
  */
class CentroidContainmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q_centroid_sim: one row per unordered source pair, cosines in " +
      "[-1,1], and one pair matches a from-scratch recomputation") {
    val out = run("q_centroid_sim").collect()
    val nSources = graft.engine.Tables.documents(spark, sf)
      .select("source").distinct().count().toInt
    assert(out.length == nSources * (nSources - 1) / 2)
    out.foreach { r =>
      val c = r.getAs[Double]("cos_sim")
      assert(c >= -1.0 && c <= 1.0, s"cosine $c out of range")
      assert(r.getAs[String]("src_a") < r.getAs[String]("src_b"))
    }
    // recompute the first emitted pair from the raw tables with the
    // same quantization (integer micro-units; counts cancel)
    val first = out.head
    val (sa, sb) = (first.getAs[String]("src_a"), first.getAs[String]("src_b"))
    val rows = graft.engine.Tables.documents(spark, sf)
      .select("doc_id", "source")
      .join(graft.engine.Tables.embeddings(spark, sf)
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("e")),
        col("doc_id") === col("vec_id"))
      .filter(col("source").isin(sa, sb))
      .select("source", "e").collect()
    val dims = rows.head.getSeq[Double](1).length
    def sumVec(src: String): Array[Double] = {
      val acc = Array.fill(dims)(0L)
      rows.filter(_.getString(0) == src).foreach { r =>
        val e = r.getSeq[Double](1)
        var i = 0
        while (i < dims) {
          acc(i) += math.floor(e(i) * 1000000 + 0.5).toLong; i += 1
        }
      }
      acc.map(_.toDouble)
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dims) { s += a(i) * b(i); i += 1 }; s
    }
    val (va, vb) = (sumVec(sa), sumVec(sb))
    val expected = math.floor(dot(va, vb) /
      (math.sqrt(dot(va, va)) * math.sqrt(dot(vb, vb))) * 10000 + 0.5) / 10000
    assert(first.getAs[Double]("cos_sim") == expected)
  }

  test("q_source_cohesion: one row per source, cohesion in [-1,1], " +
      "and one source matches a from-scratch recomputation") {
    val out = run("q_source_cohesion").collect()
    val nSources = graft.engine.Tables.documents(spark, sf)
      .select("source").distinct().count().toInt
    assert(out.length == nSources)
    out.foreach { r =>
      val c = r.getAs[Double]("cohesion")
      assert(c >= -1.0 && c <= 1.0, s"cohesion $c out of range")
    }
    val src = out.head.getAs[String]("source")
    val vs = graft.engine.Tables.documents(spark, sf)
      .select("doc_id", "source")
      .join(graft.engine.Tables.embeddings(spark, sf)
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("e")),
        col("doc_id") === col("vec_id"))
      .filter(col("source") === src)
      .select("e").collect().map(_.getSeq[Double](0).toArray)
    assert(out.head.getAs[Long]("n_docs") == vs.length)
    val dims = vs.head.length
    val cent = Array.tabulate(dims)(i =>
      vs.map(v => math.floor(v(i) * 1000000 + 0.5)).sum)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dims) { s += a(i) * b(i); i += 1 }; s
    }
    // mean of plain-rounded per-doc cosines through exact 1e-4 units
    // (mirrors the DECIMAL(18,4) sum; inputs are away from half
    // boundaries so floor(x*1e4+0.5) == round here)
    val units = vs.map { v =>
      math.floor(dot(v, cent) /
        (math.sqrt(dot(v, v)) * math.sqrt(dot(cent, cent))) * 10000
        + 0.5).toLong
    }.sum
    val expected =
      math.floor(units.toDouble / 10000 / vs.length * 10000 + 0.5) / 10000
    assert(out.head.getAs[Double]("cohesion") == expected)
  }

  test("q_dup_cluster_hist: cluster sizes partition the corpus and " +
      "agree with the group labeling") {
    val hist = run("q_dup_cluster_hist").collect()
      .map(r => r.getAs[Long]("cluster_size") ->
        r.getAs[Long]("n_clusters")).toMap
    val nDocs = graft.engine.Tables.documents(spark, sf).count()
    assert(hist.keys.forall(_ >= 1L))
    assert(hist.map { case (k, n) => k * n }.sum == nDocs,
      "sum of cluster_size * n_clusters must equal the corpus size")
    // cross-check against q_dedup_groups' labeling (sizes >= 2 only)
    val groups = run("q_dedup_groups").collect()
      .groupBy(_.getAs[Long]("group_id")).map(_._2.length.toLong)
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    groups.foreach { case (k, n) =>
      assert(hist.get(k).contains(n), s"size-$k count mismatch")
    }
  }

  test("q_containment: overlap >= jaccard on every shared candidate " +
      "pair, and contained_doc is the smaller side") {
    val cont = run("q_containment").collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")) ->
        (r.getAs[Double]("overlap"), r.getAs[Long]("contained_doc"))).toMap
    val est = run("q_minhash_est").collect()
      .map(r => (r.getAs[Long]("d1"), r.getAs[Long]("d2")) ->
        r.getAs[Double]("jaccard")).toMap
    assert(cont.nonEmpty, "no LSH candidate pairs at this tier")
    assert(cont.keySet == est.keySet,
      "containment and estimator audits must cover the same pair set")
    cont.foreach { case ((d1, d2), (overlap, contained)) =>
      assert(overlap >= 0.0 && overlap <= 1.0)
      // inter/min(n1,n2) >= inter/(n1+n2-inter) always (min <= union);
      // both are r4-floored, which preserves >= (monotone rounding)
      assert(overlap >= est((d1, d2)),
        s"pair ($d1,$d2): overlap $overlap < jaccard ${est((d1, d2))}")
      assert(contained == d1 || contained == d2)
    }
  }
}
