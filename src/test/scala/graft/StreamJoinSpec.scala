package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamJoin

class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-stream interval join matches within lookback only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]

    val joined = StreamJoin.joinWithin(
      clicks.toDF().toDF("click_id", "user_id", "ts"),
      purchases.toDF().toDF("purchase_id", "user_id", "p_ts"),
      key = "user_id", leftTs = "ts", rightTs = "p_ts", lookback = "1 hour")

    val q = joined.select("click_id", "purchase_id")
      .writeStream.format("memory").queryName("sj")
      .outputMode(OutputMode.Append).start()

    purchases.addData(
      (100L, 1L, ts("2024-02-01 10:00:00")), // 20min before click -> match
      (101L, 1L, ts("2024-02-01 07:00:00")), // 3h20m before -> outside lookback
      (102L, 2L, ts("2024-02-01 10:15:00"))) // other user
    clicks.addData(
      (1L, 1L, ts("2024-02-01 10:20:00")),
      (2L, 2L, ts("2024-02-01 10:20:00")),
      (3L, 3L, ts("2024-02-01 10:20:00"))) // no purchase -> no row (inner)
    q.processAllAvailable()
    // advance both watermarks so results flush
    purchases.addData((900L, 9L, ts("2024-02-01 15:00:00")))
    clicks.addData((901L, 9L, ts("2024-02-01 15:00:01")))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("sj").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 100L)))
    assert(got.contains((2L, 102L)))
    assert(!got.exists(_._2 == 101L), "out-of-lookback purchase must not match")
    assert(!got.exists(_._1 == 3L), "click with no purchase must not appear")
  }
}
