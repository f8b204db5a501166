package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.WindowedStats

class WindowedStatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dailyCounts: event-time tumbling day window with watermark drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val news = mem.toDF().toDF("published_time", "category")

    val q = WindowedStats.dailyCounts(news, watermark = "1 day")
      .writeStream.format("memory").queryName("daily")
      .outputMode(OutputMode.Append).start()

    mem.addData((ts("2024-02-01 10:00:00"), "Politics"),
      (ts("2024-02-01 12:00:00"), "Politics"),
      (ts("2024-02-02 09:00:00"), "Tech"))
    q.processAllAvailable()
    // advance watermark past Feb 1+2 so those windows close
    mem.addData((ts("2024-02-05 00:00:00"), "Tech"))
    q.processAllAvailable()
    // a late row far behind the watermark must be DROPPED
    mem.addData((ts("2024-02-01 23:00:00"), "Politics"))
    q.processAllAvailable()
    mem.addData((ts("2024-02-09 00:00:00"), "Tech")) // close Feb 5 too
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("daily")
      .collect().map(r => (r.getTimestamp(0).toString.take(10), r.getString(1), r.getLong(2)))
      .toSet
    assert(rows.contains(("2024-02-01", "Politics", 2L))) // late row not counted
    assert(rows.contains(("2024-02-02", "Tech", 1L)))
    assert(rows.contains(("2024-02-05", "Tech", 1L)))
  }

  test("sessionCounts: session windows merge within gap, split across it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val events = mem.toDF().toDF("ts", "user_id")

    val q = WindowedStats.sessionCounts(events, gap = "30 minutes",
        watermark = "1 hour")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()

    mem.addData(
      (ts("2024-02-01 10:00:00"), 1L), // session A...
      (ts("2024-02-01 10:20:00"), 1L), // ...extends A (within 30min)
      (ts("2024-02-01 11:30:00"), 1L), // new session B (70min gap)
      (ts("2024-02-01 10:05:00"), 2L)) // user 2, own session
    q.processAllAvailable()
    mem.addData((ts("2024-02-01 15:00:00"), 9L)) // advance watermark
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sessions")
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("session_start").toString.take(16),
        r.getAs[Long]("n_events")))
      .toSet
    assert(rows.contains((1L, "2024-02-01 10:00", 2L))) // merged session A
    assert(rows.contains((1L, "2024-02-01 11:30", 1L))) // split session B
    assert(rows.contains((2L, "2024-02-01 10:05", 1L)))
  }

  test("hoppingCounts: each event lands in size/slide overlapping windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Double)]
    val events = mem.toDF().toDF("ts", "value")

    val q = WindowedStats.hoppingCounts(events, size = "60 minutes",
        slide = "30 minutes", watermark = "1 hour")
      .writeStream.format("memory").queryName("hopping")
      .outputMode(OutputMode.Append).start()

    mem.addData(
      (ts("2024-02-01 10:10:00"), 1.5), // windows [9:30,10:30) and [10:00,11:00)
      (ts("2024-02-01 10:40:00"), 2.0)) // windows [10:00,11:00) and [10:30,11:30)
    q.processAllAvailable()
    mem.addData((ts("2024-02-01 15:00:00"), 0.0)) // advance watermark
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("hopping").collect()
      .map(r => (r.getAs[Timestamp]("w_start").toString.take(16),
        r.getAs[Long]("n"), r.getAs[Double]("total"))).toSet
    assert(rows.contains(("2024-02-01 09:30", 1L, 1.5)))
    assert(rows.contains(("2024-02-01 10:00", 2L, 3.5))) // both events overlap here
    assert(rows.contains(("2024-02-01 10:30", 1L, 2.0)))
  }

  test("feedProgress: mapGroupsWithState accumulates per-key counters") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val news = mem.toDF().toDF("published_time", "category")

    val q = WindowedStats.feedProgress(spark, news)
      .writeStream.format("memory").queryName("progress")
      .outputMode(OutputMode.Update).start()

    mem.addData((ts("2024-02-01 10:00:00"), "Politics"),
      (ts("2024-02-01 11:00:00"), "Politics"),
      (ts("2024-02-01 12:00:00"), "Tech"))
    q.processAllAvailable()
    mem.addData((ts("2024-02-02 10:00:00"), "Politics"))
    q.processAllAvailable()
    q.stop()

    val last = spark.table("progress")
      .groupBy("category")
      .agg(org.apache.spark.sql.functions.max("articles").as("articles"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(last("Politics") == 3L) // 2 then +1, state carried across batches
    assert(last("Tech") == 1L)
  }
}
