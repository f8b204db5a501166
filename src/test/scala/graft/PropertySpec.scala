package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Analyze, Ingest}
import graft.engine.Analyze.{Actor, Analysis}

/** Property-based invariants (SURVEY.md §5.4): dedup idempotence, explode
  * row-count conservation, anti ⊎ semi partitioning. Generators sampled
  * over fixed seeds (the scalatest-scalacheck bridge isn't in the offline
  * cache; deterministic seeds are what we want for CI anyway). */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val idsGen: Gen[List[String]] =
    Gen.listOfN(30, Gen.oneOf((1 to 10).map(i => s"id$i")))

  test("dedup is idempotent: run ∘ run ≡ run") {
    for (seed <- 1L to 8L) {
      val ids = sample(idsGen, seed)
      val once = ids.toDF("id").dropDuplicates("id")
      val twice = once.dropDuplicates("id")
      assert(once.count() == twice.count())
      assert(once.count() == ids.distinct.size.toLong)
    }
  }

  test("anti-join ⊎ semi-join partitions the input") {
    for (seed <- 1L to 8L) {
      val left = sample(idsGen, seed)
      val state = sample(idsGen, seed + 100)
      val l = left.zipWithIndex.toDF("id", "row") // keep duplicates distinct
      val s = state.toDF("id")
      val anti = l.join(s, Seq("id"), "left_anti")
      val semi = l.join(s, Seq("id"), "left_semi")
      assert(anti.count() + semi.count() == l.count())
      assert(anti.intersect(semi).count() == 0)
    }
  }

  test("explode row count = sum of array lengths") {
    val actorsGen: Gen[List[List[Actor]]] = Gen.listOfN(5,
      Gen.chooseNum(0, 4).flatMap(n =>
        Gen.listOfN(n, Gen.alphaStr.map(s => Actor("a" + s.take(4), "r")))))
    for (seed <- 1L to 8L) {
      val mains = sample(actorsGen, seed)
      val others = sample(actorsGen, seed + 100)
      val rows = mains.zip(others).zipWithIndex.map { case ((m, o), i) =>
        (s"n$i", Some(Analysis(m, o, "Others")))
      }
      val exploded = Analyze.explodeActors(rows.toDF("id", "analysis")).count()
      val expected = rows.map { case (_, a) =>
        a.get.main_actors.size + a.get.other_actors.size
      }.sum.toLong
      assert(exploded == expected)
    }
  }

  test("ingest state accumulation: processing all batches ≡ processing their union") {
    for (seed <- 1L to 8L) {
      val batch1 = sample(idsGen, seed).distinct.toDF("id")
      val batch2 = sample(idsGen, seed + 100).distinct.toDF("id")
      val new2 = Ingest.newEntries(batch2, batch1)
      val sequential = batch1.count() + new2.count()
      val union = batch1.union(batch2).dropDuplicates("id").count()
      assert(sequential == union)
    }
  }

  test("streaming admission: progress, caps, and full-drain invariants") {
    import graft.sources.AdmissionLimits
    val sizesGen: Gen[List[(Long, Int, Long)]] = for {
      n <- Gen.choose(1, 20)
      costs <- Gen.listOfN(n, Gen.zip(
        Gen.choose(0, 4), Gen.choose(0L, 1000L)))
    } yield costs.zipWithIndex.map { case ((nf, nb), i) =>
      (i.toLong + 1L, nf, if (nf == 0) 0L else nb + 1L)
    }
    val limitGen: Gen[AdmissionLimits] = Gen.zip(
      Gen.option(Gen.choose(1, 6)),
      Gen.option(Gen.choose(1L, 2000L))).map { case (f, b) =>
      AdmissionLimits(f, b)
    }
    for (seed <- 1L to 40L) {
      val sizes = sample(sizesGen, seed)
      val lim = sample(limitGen, seed + 999)
      val latest = sizes.map(_._1).max
      val end = lim.admit(sizes.iterator, latest)
      // 1. progress: something admits whenever backlog exists
      assert(end >= sizes.head._1 || end == latest,
        s"no progress: $end of $sizes with $lim")
      // 2. never beyond latest
      assert(end <= latest)
      // 3. soft caps: the admitted slice respects the caps OR is a
      //    single data commit (the oversized-first-commit allowance)
      val admitted = sizes.filter(_._1 <= end)
      val dataCommits = admitted.count(_._2 > 0)
      lim.maxFiles.foreach { m =>
        assert(admitted.map(_._2).sum <= m || dataCommits == 1,
          s"files cap broken: $admitted with $lim")
      }
      lim.maxBytes.foreach { m =>
        assert(admitted.map(_._3).sum <= m || dataCommits == 1,
          s"bytes cap broken: $admitted with $lim")
      }
      // 4. repeated admission from each new floor drains the backlog in
      //    finitely many steps, never skipping or repeating a version
      var floor = 0L
      var steps = 0
      while (floor < latest && steps < 100) {
        val nxt = lim.admit(
          sizes.iterator.filter(_._1 > floor), latest)
        assert(nxt > floor, s"stuck at $floor: $sizes with $lim")
        floor = nxt; steps += 1
      }
      assert(floor == latest, s"never drained: $floor of $latest")
    }
  }

  // ---- winnow / CDC reference agreement ---------------------------------

  /** The shared 16-bit split hash, sequentially: first 4 hex chars of
    * md5 (exactly Helpers.hash16 / the engines' portable SQL form). */
  private def hash16Ref(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    (((d(0) & 0xffL) << 8) | (d(1) & 0xffL))
  }

  /** Sequential winnowing (Schleimer et al. fig. 5 with the rightmost
    * tie-break): returns selected 1-based kgram positions. */
  private def winnowRef(words: IndexedSeq[String], k: Int,
      w: Int): Set[Long] = {
    if (words.length < k) return Set.empty // sliding() yields one short group
    val grams = words.sliding(k).map(_.mkString(" ")).toVector
    if (grams.isEmpty) return Set.empty
    val h = grams.map(hash16Ref)
    val m = grams.length
    val starts = 1 to math.max(m - w + 1, 1)
    starts.map { p =>
      val win = (p to math.min(p + w - 1, m))
      // min hash, rightmost position on ties
      win.minBy(i => (h(i - 1), -i)).toLong
    }.toSet
  }

  /** Sequential CDC chunking: chunk texts in order (boundary AFTER
    * token t when hash16 of the k-gram ending at t is 0 mod mod). */
  private def cdcRef(words: IndexedSeq[String], k: Int,
      mod: Int): Vector[String] = {
    val bounds = (k to words.length).filter { t =>
      hash16Ref(words.slice(t - k, t).mkString(" ")) % mod == 0
    }
    val cuts = (0 +: bounds) :+ words.length
    cuts.sliding(2).collect {
      case Seq(a, b) if b > a => words.slice(a, b).mkString(" ")
    }.toVector
  }

  private val vocabGen: Gen[Vector[String]] = Gen.chooseNum(2, 24)
    .map(n => (1 to n).map(i => s"w$i").toVector)
  private def docGen(vocab: Vector[String]): Gen[Vector[String]] =
    Gen.chooseNum(0, 160).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.toVector))

  test("winnowing agrees with the sequential reference on random docs") {
    for (seed <- 1L to 10L) {
      val vocab = sample(vocabGen, seed)
      val docs = (1 to 6).map(i =>
        (i.toLong, sample(docGen(vocab), seed * 31 + i)))
      val df = docs.map { case (id, ws) => (id, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.engine.Winnow.fingerprints(df, "doc_id", "text", 4, 5)
        .collect().groupBy(_.getLong(0))
        .map { case (id, rs) => id -> rs.map(_.getAs[Long]("pos")).toSet }
      docs.foreach { case (id, ws) =>
        // empty-split quirk: "" splits to [""], one 0-word doc = no grams
        val expect = if (ws.isEmpty) Set.empty[Long] else winnowRef(ws, 4, 5)
        assert(got.getOrElse(id, Set.empty[Long]) == expect,
          s"seed $seed doc $id (${ws.length} words, vocab ${vocab.length})")
      }
    }
  }

  test("CDC chunking agrees with the sequential reference on random docs") {
    for (seed <- 20L to 28L) {
      val vocab = sample(vocabGen, seed)
      val ws = sample(docGen(vocab), seed * 17).filter(_ => true)
      if (ws.nonEmpty) {
        val df = Seq((1L, ws.mkString(" "))).toDF("doc_id", "text")
        val got = graft.engine.Chunker
          .cdcChunks(df, "doc_id", "text", 4, 8) // mod 8: frequent bounds
          .collect().sortBy(_.getAs[Long]("start_pos"))
          .map(_.getAs[String]("text")).toVector
        assert(got == cdcRef(ws, 4, 8),
          s"seed $seed (${ws.length} words, vocab ${vocab.length})")
      }
    }
  }
}
