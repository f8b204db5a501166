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
}
