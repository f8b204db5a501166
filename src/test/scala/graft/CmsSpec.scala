package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.Cms

/** Count-Min sketch (engine/Cms.scala) held to the PAPER's guarantees
  * on seeded random corpora, plus the linearity property that justifies
  * building from the (key, count) aggregate instead of the raw token
  * stream, and exact agreement with a sequential reference fed one
  * token at a time. */
class CmsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Zipf-ish seeded corpus: word w_i with frequency ~ N/i — heavy head
    * + long tail, the shape CMS is built for. */
  private def corpus(seed: Int, nWords: Int, maxF: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (1 to nWords).flatMap(i =>
      Seq.fill(math.max(1, maxF / i + rnd.nextInt(3)))(s"w$seed-$i"))
  }

  /** Sequential reference: the textbook depth x width array updated one
    * occurrence at a time, sharing the engine's bucket function. */
  private def seqCms(tokens: Seq[String], depth: Int, width: Int):
      Map[(Int, Int), Long] = {
    def bucket(r: Int, w: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$r:$w".getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(4)
      Integer.parseInt(hex, 16) % width
    }
    tokens.foldLeft(Map.empty[(Int, Int), Long].withDefaultValue(0L)) {
      (acc, t) =>
        (0 until depth).foldLeft(acc)((a, r) =>
          a.updated((r, bucket(r, t)), a((r, bucket(r, t))) + 1))
    }
  }

  private def countsOf(tokens: Seq[String]) =
    tokens.toDF("w").groupBy("w").agg(count(lit(1)).as("cnt"))

  test("aggregate-built sketch equals the sequential per-token reference") {
    val tokens = corpus(7, 400, 1000)
    val got = Cms.build(countsOf(tokens)).collect()
      .map(r => (r.getAs[Int]("r"), r.getAs[Int]("b")) -> r.getAs[Long]("cnt"))
      .toMap
    val want = seqCms(tokens, Cms.Depth, Cms.Width)
    assert(got == want.filter(_._2 > 0),
      "DataFrame build diverged from the sequential reference")
  }

  test("overestimate-only: est >= true for EVERY key") {
    val tokens = corpus(11, 2000, 500)
    val counts = countsOf(tokens)
    val est = Cms.estimate(Cms.build(counts), counts).collect()
    est.foreach { r =>
      assert(r.getAs[Long]("est_n") >= r.getAs[Long]("cnt"),
        s"underestimate at ${r.getAs[String]("w")}")
    }
  }

  test("absent probe keys survive the lookup: empty bucket counts as 0") {
    // A tiny sketch leaves most buckets unwritten. A probe key that was
    // never inserted must (a) stay in the output and (b) let its empty
    // buckets participate in the min — inner-joining the sketch would
    // drop those depth rows, inflating est_n to the min over only the
    // COLLIDING buckets (or losing the key entirely).
    val counts = Seq(("only", 5L)).toDF("w", "cnt")
    val sketch = Cms.build(counts)
    assert(sketch.count() == Cms.Depth) // most buckets absent
    val probes = Seq("only", "never-seen").toDF("w")
    val est = Cms.estimate(sketch, probes).collect()
      .map(r => r.getAs[String]("w") -> r.getAs[Long]("est_n")).toMap
    assert(est("only") == 5L)
    // "never-seen" hashes to at least one empty bucket with width 256
    // and 4 occupied cells unless all 4 collide (they don't, seeded)
    assert(est.contains("never-seen"), "absent key dropped from output")
    assert(est("never-seen") == 0L,
      s"absent key must estimate 0, got ${est("never-seen")}")
  }

  test("error bound: P[over > (e/width) * N] <= e^-depth") {
    val tokens = corpus(13, 2000, 500)
    val n = tokens.size.toDouble
    val eps = math.E / Cms.Width
    val counts = countsOf(tokens)
    val est = Cms.estimate(Cms.build(counts), counts).collect()
    val breaches = est.count(r =>
      (r.getAs[Long]("est_n") - r.getAs[Long]("cnt")) > eps * n)
    val pBound = math.exp(-Cms.Depth) // ~1.8%
    assert(breaches <= math.ceil(pBound * est.length),
      s"$breaches/${est.length} keys breach the eps*N bound")
  }

  test("linearity: cms(A) + cms(B) = cms(A ++ B) bucket-wise") {
    val a = corpus(17, 300, 200)
    val b = corpus(19, 300, 200) // distinct seed -> different words too
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Int]("r"), r.getAs[Int]("b")) -> r.getAs[Long]("cnt"))
      .toMap.withDefaultValue(0L)
    val ma = toMap(Cms.build(countsOf(a)))
    val mb = toMap(Cms.build(countsOf(b)))
    val whole = toMap(Cms.build(countsOf(a ++ b)))
    val keys = ma.keySet ++ mb.keySet
    assert(keys.forall(k => ma(k) + mb(k) == whole(k)),
      "bucket-wise addition of the halves diverged from the whole")
    assert(whole.keys == keys)
  }

  test("merge of per-day sketches answers the whole window exactly") {
    // the production pattern: one sketch per day, windows answered by
    // bucket-wise addition without re-touching the data
    val days = Seq(corpus(29, 200, 150), corpus(31, 200, 150),
      corpus(37, 200, 150))
    val merged = Cms.merge(
      days.map(d => Cms.build(countsOf(d))).reduce(_ unionByName _))
    val whole = Cms.build(countsOf(days.flatten))
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Int]("r"), r.getAs[Int]("b")) -> r.getAs[Long]("cnt"))
      .toMap
    assert(toMap(merged) == toMap(whole))
    // and estimates over the merged sketch match estimates over the whole
    val counts = countsOf(days.flatten)
    val a = Cms.estimate(merged, counts).collect()
      .map(r => r.getAs[String]("w") -> r.getAs[Long]("est_n")).toMap
    val b = Cms.estimate(whole, counts).collect()
      .map(r => r.getAs[String]("w") -> r.getAs[Long]("est_n")).toMap
    assert(a == b)
  }

  test("sketch size is depth x width at most, regardless of vocab") {
    val rows = Cms.build(countsOf(corpus(23, 5000, 100))).count()
    assert(rows <= Cms.Depth.toLong * Cms.Width)
  }
}
