package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.VersionedParquetSink

/** Races between writes and the governance metadata commits: the claim
  * loop must ABORT a write that validated/translated against a
  * metadata set a concurrent commit replaced — never let it land. */
class GovernanceRaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Run `a` and `b` concurrently from a shared start gate; return
    * their outcomes (None = success, Some(t) = thrown). */
  private def race(a: () => Unit, b: () => Unit):
      (Option[Throwable], Option[Throwable]) = {
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    def run(f: () => Unit) = pool.submit(
      new java.util.concurrent.Callable[Option[Throwable]] {
        def call(): Option[Throwable] = {
          gate.await()
          try { f(); None } catch { case t: Throwable => Some(t) }
        }
      })
    val fa = run(a); val fb = run(b)
    gate.countDown()
    val ra = fa.get(120, TimeUnit.SECONDS)
    val rb = fb.get(120, TimeUnit.SECONDS)
    pool.shutdown()
    (ra, rb)
  }

  test("append racing ADD CONSTRAINT never lands an unvalidated row") {
    // repeat the race a few times — interleavings vary per run
    (1 to 3).foreach { round =>
      val sink = new VersionedParquetSink(TestSpark.tmpDir(s"race1_$round"))
      sink.append(Seq((1, 10)).toDF("id", "n"), "t")
      // the appended row VIOLATES the constraint being added: exactly
      // one of the two must lose — either the append lands first and
      // addConstraint's backlog validation rejects, or the constraint
      // lands first and the append aborts at its claim (or fails its
      // own row guard on retry)
      val (ra, rb) = race(
        () => sink.append(Seq((2, -5)).toDF("id", "n"), "t"),
        () => sink.addConstraint(spark, "t", "n_pos", "n > 0"))
      val consOn = sink.constraintsOf(spark, "t").contains("n_pos")
      val hasBad = sink.read(spark, "t").filter(col("n") < 0).count() > 0
      assert(!(consOn && hasBad),
        s"round $round: constraint active over a violating row " +
          s"(append=${ra.map(_.getMessage)}, add=${rb.map(_.getMessage)})")
      assert(consOn || hasBad || ra.isDefined,
        s"round $round: both operations vanished silently")
    }
  }

  test("evolution append racing DROP COLUMN cannot resurrect physicals") {
    (1 to 3).foreach { round =>
      val sink = new VersionedParquetSink(TestSpark.tmpDir(s"race2_$round"))
      sink.append(Seq((1, "secret", 10)).toDF("id", "v", "n"), "t")
      sink.renameColumn(spark, "t", "n", "num") // enable mapping
      // dropColumn(v) races an append that still carries v
      val (ra, rb) = race(
        () => sink.append(Seq((2, "x", 20)).toDF("id", "v", "num"), "t"),
        () => sink.dropColumn(spark, "t", "v"))
      // whatever interleaved, the final table must be internally
      // consistent: schema and mapping agree, reads don't throw
      val df = sink.read(spark, "t")
      val cols = df.columns.toSeq
      df.collect()
      val mapping = sink.columnMappingOf(spark, "t")
      assert(mapping.keySet == cols.toSet,
        s"round $round: mapping $mapping disagrees with schema $cols " +
          s"(append=${ra.map(_.getMessage)}, drop=${rb.map(_.getMessage)})")
      // if the drop won and an evolution append later re-adds v, the
      // old bytes stay dead
      if (!cols.contains("v")) {
        sink.append(Seq((3, "fresh", 30)).toDF("id", "v", "num"), "t",
          allowEvolution = true)
        val r1 = sink.read(spark, "t").filter(col("id") === 1).head()
        assert(r1.isNullAt(r1.fieldIndex("v")),
          s"round $round: dropped value resurrected")
      }
    }
  }

  test("two appends racing a generated-column declaration stay consistent") {
    (1 to 3).foreach { round =>
      val sink = new VersionedParquetSink(TestSpark.tmpDir(s"race3_$round"))
      sink.append(Seq((1, 10, 20)).toDF("id", "n", "n2"), "t")
      // the racing append provides n2 = n * 3 — valid only BEFORE the
      // declaration lands
      val (ra, rb) = race(
        () => sink.append(Seq((2, 5, 15)).toDF("id", "n", "n2"), "t"),
        () => sink.setGeneratedColumn(spark, "t", "n2", "n * 2"))
      val declared = sink.generatedColumnsOf(spark, "t").contains("n2")
      if (declared) {
        // every committed row satisfies the expression (declaration
        // validated the backlog; a post-declaration append was guarded)
        assert(sink.read(spark, "t")
          .filter(!(col("n2") <=> col("n") * 2)).count() == 0,
          s"round $round: declared expression violated " +
            s"(append=${ra.map(_.getMessage)}, gen=${rb.map(_.getMessage)})")
      } else {
        // declaration lost to the nonconforming append's backlog — the
        // append must be present and the declaration rejected
        assert(rb.isDefined && sink.read(spark, "t").count() == 2,
          s"round $round: declaration failed yet its loser vanished")
      }
    }
  }
}
