package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Funnel

class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming funnel: stage machine advances in order, across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val events = mem.toDF().toDF("user_id", "event_type", "ts")

    val q = Funnel.stageTransitions(spark, events,
        Seq("view", "click", "purchase"))
      .writeStream.format("memory").queryName("funnel")
      .outputMode(OutputMode.Append).start()

    // batch 1: user 1 completes two stages OUT OF ORDER within the batch
    // (intra-batch disorder is sorted); user 2 clicks without viewing
    mem.addData(
      (1L, "click", ts("2024-02-01 10:05:00")),
      (1L, "view", ts("2024-02-01 10:00:00")),
      (2L, "click", ts("2024-02-01 10:00:00")))
    q.processAllAvailable()
    // batch 2: user 1 purchases (stage 3); user 2 finally views, then a
    // LATE click older than the view must NOT advance (cross-batch
    // disorder is skipped, like a watermark-late row)
    mem.addData(
      (1L, "purchase", ts("2024-02-01 10:30:00")),
      (2L, "view", ts("2024-02-01 11:00:00")),
      (2L, "click", ts("2024-02-01 10:59:00")))
    q.processAllAvailable()
    // batch 3: user 2 clicks after the view -> stage 2
    mem.addData((2L, "click", ts("2024-02-01 11:10:00")))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("funnel").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == Set((1L, 1), (1L, 2), (1L, 3), (2L, 1), (2L, 2)),
      s"got $got")
    // live dashboard shape: counts per stage match the batch q_funnel
    // semantics on the same events (2 viewed, 2 clicked-after, 1 bought)
    val byStage = spark.table("funnel").groupBy("stage").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byStage == Map(1 -> 2L, 2 -> 2L, 3 -> 1L))
  }

  test("retention state is a bounded bitset: bytes scale with week SPAN, not batches") {
    import graft.streaming.Funnel.{advanceRetention, RetentionState}
    val week = 604800L
    val cohort = 1700000000L / week * week
    def wk(k: Long) = (cohort + k * week, s"label$k")
    // 520 active weeks (a decade) arriving one batch each: state stays
    // ~span/8 bytes and every week is emitted exactly once
    var st: Option[RetentionState] = None
    val emitted = Seq.newBuilder[Long]
    (0L until 520L).foreach { k =>
      val (next, fresh) = advanceRetention(st, Seq(wk(k)))
      st = Some(next)
      emitted ++= fresh
    }
    assert(emitted.result() == (0L until 520L))
    assert(st.get.bits.length == 65, s"520 weeks must cost 65 bytes, " +
      s"got ${st.get.bits.length}")
    // replays/duplicates: nothing re-emitted, state unchanged
    val (again, none) = advanceRetention(st, (0L until 520L).map(wk))
    assert(none.isEmpty && again.bits.sameElements(st.get.bits))
    // out-of-order across batches: an unseen OLDER week still emits
    val (_, gap) = advanceRetention(
      Some(advanceRetention(None, Seq(wk(0), wk(10)))._1), Seq(wk(3)))
    assert(gap == Seq(3L))
    // pre-cohort weeks are skipped, never a rewind
    val (pinned, pre) = advanceRetention(
      Some(advanceRetention(None, Seq(wk(5)))._1), Seq(wk(2)))
    assert(pre.isEmpty && pinned.cohort == cohort + 5 * week)
  }

  test("event-time TTL: idle users evict at watermark points, replay-deterministically") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val events = mem.toDF().toDF("user_id", "ts")
    val q = Funnel.weeklyRetention(spark, events, ttl = Some("7 days"))
      .writeStream.format("memory").queryName("retention_ttl")
      .outputMode(OutputMode.Append).start()

    // user 1 pins cohort week 2024-02-05
    mem.addData((1L, ts("2024-02-06 10:00:00")))
    q.processAllAvailable()
    // another user's event advances the WATERMARK past user 1's
    // timeout (2024-02-13); the eviction point is pure event time
    mem.addData((2L, ts("2024-03-01 10:00:00")))
    q.processAllAvailable()
    // a batch without user-1 data fires the timeout and drops the state
    mem.addData((3L, ts("2024-03-02 10:00:00")))
    q.processAllAvailable()
    // user 1 returns: a FRESH cohort (2024-03-04), not week 4 of the old
    mem.addData((1L, ts("2024-03-05 09:00:00")))
    q.processAllAvailable()
    q.stop()

    val u1 = spark.table("retention_ttl").collect()
      .filter(_.getLong(0) == 1L)
      .map(r => (r.getString(1), r.getLong(2))).toSet
    assert(u1 == Set(("2024-02-05", 0L), ("2024-03-04", 0L)), s"got $u1")
  }

  test("funnel event-time TTL: an evicted user restarts the stage machine") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val events = mem.toDF().toDF("user_id", "event_type", "ts")
    val q = Funnel.stageTransitions(spark, events, Seq("view", "click"),
        ttl = Some("7 days"))
      .writeStream.format("memory").queryName("funnel_ttl")
      .outputMode(OutputMode.Append).start()

    mem.addData((1L, "view", ts("2024-02-06 10:00:00")))
    q.processAllAvailable()
    mem.addData((2L, "view", ts("2024-03-01 10:00:00"))) // watermark push
    q.processAllAvailable()
    mem.addData((3L, "view", ts("2024-03-02 10:00:00"))) // timeout fires
    q.processAllAvailable()
    // user 1 views again: with the old state this would NOT advance
    // (stage already 1, next expected is click); a fresh machine emits
    mem.addData((1L, "view", ts("2024-03-05 09:00:00")))
    q.processAllAvailable()
    q.stop()

    val u1Stage1 = spark.table("funnel_ttl").collect()
      .count(r => r.getLong(0) == 1L && r.getInt(1) == 1)
    assert(u1Stage1 == 2, s"expected a restarted machine, got $u1Stage1 stage-1 rows")
  }

  test("streaming retention: cohort pinned by first activity, weeks emitted once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val events = mem.toDF().toDF("user_id", "ts")

    val q = Funnel.weeklyRetention(spark, events)
      .writeStream.format("memory").queryName("retention")
      .outputMode(OutputMode.Append).start()

    // week of 2024-02-05 (Monday). user 1 active wk0; user 2 active wk0
    mem.addData((1L, ts("2024-02-06 10:00:00")), (2L, ts("2024-02-07 09:00:00")))
    q.processAllAvailable()
    // user 1 returns wk1 AND repeats wk0 (no duplicate emission);
    // a pre-cohort late row for user 2 must be skipped, not rewind
    mem.addData(
      (1L, ts("2024-02-13 10:00:00")), (1L, ts("2024-02-08 23:00:00")),
      (2L, ts("2024-01-30 08:00:00")))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("retention").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rows == Set(
      (1L, "2024-02-05", 0L), (1L, "2024-02-05", 1L),
      (2L, "2024-02-05", 0L)), s"got $rows")
  }
}
