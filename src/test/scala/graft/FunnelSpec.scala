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
