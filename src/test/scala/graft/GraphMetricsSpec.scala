package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.GraphMetrics

/** engine/GraphMetrics.scala: PageRank / triangles / mutual-NN against
  * sequential references (the PropertySpec pattern — the distributed
  * implementation must agree EXACTLY with a straightforward
  * single-threaded implementation of the same integer recurrence),
  * plus structural invariants on known graphs. */
class GraphMetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Scale = 1000000000000L

  /** Sequential mirror of GraphMetrics.pagerank — same canonicalize,
    * same scaled-BIGINT recurrence with truncating division. */
  private def seqPagerank(edges: Seq[(Long, Long)], iters: Int,
      scale: Long = Scale, dampNum: Long = 85,
      dampDen: Long = 100): Map[Long, Long] = {
    val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a < b }.distinct
    val adj = canon.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (v, l) => v -> l.map(_._2) }
    val n = adj.size
    val base = ((dampDen - dampNum) * scale) / (dampDen * n)
    var r: Map[Long, Long] = adj.keysIterator.map(v => v -> scale / n).toMap
    for (_ <- 1 to iters) {
      val contrib = r.map { case (v, rv) => v -> rv / adj(v).size }
      r = adj.map { case (v, nbrs) =>
        v -> (base + (dampNum * nbrs.iterator.map(contrib).sum) / dampDen)
      }
    }
    r
  }

  /** Brute-force per-node triangle counts over all vertex triples. */
  private def seqTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a < b }.distinct.toSet
    val vs = es.toSeq.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
    val counts = collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
    for {
      triple <- vs.combinations(3)
      Seq(a, b, c) = triple
      if es((a, b)) && es((b, c)) && es((a, c))
      v <- triple
    } counts(v) += 1L
    vs.map(v => v -> counts(v)).toMap
  }

  private def runPagerank(edges: Seq[(Long, Long)], iters: Int = 5) =
    GraphMetrics.pagerank(edges.toDF("d1", "d2"), iters, Scale)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("pagerank agrees exactly with the sequential reference on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 20 + trial * 10
      val edges = Seq.fill(3 * n) {
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      val want = seqPagerank(edges, 5)
      val got = runPagerank(edges)
      assert(got.view.mapValues(_._2).toMap == want,
        s"trial $trial: distributed != sequential")
    }
  }

  test("pagerank on a cycle is uniform (regular graph fixed point)") {
    val n = 12L
    val edges = (0L until n).map(i => (i, (i + 1) % n))
    val got = runPagerank(edges)
    assert(got.size == n)
    assert(got.values.map(_._2).toSet.size == 1, "regular graph must rank uniformly")
    // mass conservation up to truncation: sum <= scale, loss bounded
    val total = got.values.map(_._2).sum
    assert(total <= Scale && total >= Scale - 5 * 2 * n * 100)
  }

  test("pagerank ranks the star center above leaves, duplicates/orientation ignored") {
    val star = (1L to 8L).map(l => (0L, l))
    val withNoise = star ++ star.map(_.swap) ++ star.take(3) // dupes + reversed
    val got = runPagerank(withNoise)
    val center = got(0L)._2
    val leaves = (1L to 8L).map(got(_)._2)
    assert(leaves.toSet.size == 1)
    assert(center > leaves.head * 4, s"center $center vs leaf ${leaves.head}")
    assert(got == runPagerank(star), "canonicalization must ignore dupes/orientation")
  }

  test("triangles agree with brute force on seeded random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 15 + trial * 5
      val edges = Seq.fill(4 * n) {
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      val want = seqTriangles(edges)
      val got = GraphMetrics.triangles(edges.toDF("d1", "d2"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == want, s"trial $trial")
    }
  }

  test("triangles: K4 has 3 per node, a chain has none") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val gotK4 = GraphMetrics.triangles(k4.toDF("d1", "d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(gotK4.forall { case (_, deg, t) => deg == 3 && t == 3 })
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val gotChain = GraphMetrics.triangles(chain.toDF("d1", "d2"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(gotChain.values.forall(_ == 0L))
  }

  private def vecDf(rows: Seq[(Long, Seq[Double], Int)]) =
    rows.toDF("id", "emb", "cell")
      .withColumn("nrm", sqrt(expr("graft_dot(emb, emb)")))
      .select("id", "emb", "nrm", "cell")

  test("mutualTopOne keeps only reciprocal top-1 pairs and respects cell blocking") {
    graft.GraftExtensions.ensureRegistered(spark)
    // cell 0: s1 <-> t1 and s2 <-> t2 are mutual; s3's top-1 is t1 but
    // t1 prefers s1, so the hub-adjacent s3 must be suppressed.
    // cell 1: identical coords to s1/t1 — pairs stay inside their cell.
    val src = vecDf(Seq(
      (1L, Seq(1.0, 0.0), 0), (2L, Seq(0.6, 0.8), 0),
      (3L, Seq(0.99, 0.141), 0), (5L, Seq(1.0, 0.0), 1)))
    val tgt = vecDf(Seq(
      (10L, Seq(1.0, 0.0), 0), (11L, Seq(0.6, 0.8), 0),
      (15L, Seq(1.0, 0.0), 1)))
    val got = GraphMetrics.mutualTopOne(src, tgt)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0, 1L, 10L), (0, 2L, 11L), (1, 5L, 15L)))
  }

  /** Sequential mirror of GraphMetrics.marginTopOne: same rounded sims,
    * same scaled-BIGINT sums, same single-division margin. */
  private def seqMargin(src: Seq[(Long, Seq[Double], Int)],
      tgt: Seq[(Long, Seq[Double], Int)], k: Int): Map[Long, (Long, Double)] = {
    def sim(x: Seq[Double], y: Seq[Double]): Double = {
      def dot(a: Seq[Double], b: Seq[Double]) =
        a.zip(b).map { case (u, v) => u * v }.sum
      val raw = dot(x, y) / (math.sqrt(dot(x, x)) * math.sqrt(dot(y, y)))
      BigDecimal(raw).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val pairs = for {
      (si, se, sc) <- src; (ti, te, tc) <- tgt; if sc == tc
    } yield (si, ti, sim(se, te), math.floor(sim(se, te) * 10000 + 0.5).toLong)
    def topk(by: Long, side: Int) = {
      val mine = pairs.filter(p => (if (side == 0) p._1 else p._2) == by)
        .sortBy(p => (-p._3, if (side == 0) p._2 else p._1)).take(k)
      (mine.map(_._4).sum, mine.size.toLong)
    }
    pairs.groupBy(_._1).flatMap { case (sid, mine) =>
      val (sa, na) = topk(sid, 0)
      val cands = mine.sortBy(p => (-p._3, p._2)).take(k).flatMap {
        case (_, tid, s4, s) =>
          val (sb, nb) = topk(tid, 1)
          val den = sa * nb + sb * na
          if (den <= 0) None
          else Some((tid, s4,
            math.floor(2.0 * s * na * nb / den * 10000 + 0.5) / 10000))
      }
      if (cands.isEmpty) None
      else {
        val best = cands.minBy { case (tid, _, m) => (-m, tid) }
        Some(sid -> (best._1, best._3))
      }
    }
  }

  test("marginTopOne agrees with the sequential reference and discounts hubs") {
    graft.GraftExtensions.ensureRegistered(spark)
    val rnd = new scala.util.Random(11)
    def randVec() = Seq.fill(8)(rnd.nextGaussian())
    val src = (1L to 12L).map(i => (i, randVec(), (i % 2).toInt))
    val tgt = (101L to 112L).map(i => (i, randVec(), (i % 2).toInt))
    val want = seqMargin(src, tgt, 4)
    val gotM = GraphMetrics.marginTopOne(vecDf(src), vecDf(tgt), 4)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(4))).toMap
    assert(gotM == want, s"margin mismatch:\n got  $gotM\n want $want")
    // hub discount: a target near-identical to THREE sources loses the
    // margin argmax to a slightly-lower-sim exclusive target
    val hubT = Seq((201L, Seq(1.0, 0.0), 9), (202L, Seq(0.985, 0.174), 9))
    val srcs = Seq(
      (21L, Seq(1.0, 0.001), 9), (22L, Seq(1.0, -0.001), 9),
      (23L, Seq(0.999, 0.002), 9))
    val m2 = GraphMetrics.marginTopOne(vecDf(srcs), vecDf(hubT), 4)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val w2 = seqMargin(srcs, hubT, 4).map { case (s, (t, _)) => s -> t }
    assert(m2 == w2)
  }
}
