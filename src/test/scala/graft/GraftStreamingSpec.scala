package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.VersionedParquetSink

/** `readStream`/`writeStream.format("graft")`: the versioned sink as a
  * Structured Streaming source (offsets = commit versions) and sink
  * (one keyed ACID append per micro-batch). */
class GraftStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("writeStream commits each micro-batch exactly once") {
    val base = TestSpark.tmpDir("gst1")
    val ckpt = TestSpark.tmpDir("gst1c")
    val mem = MemoryStream[(Int, String)](spark)
    val q = mem.toDF().toDF("id", "v").writeStream.format("graft")
      .option("checkpointLocation", ckpt).start(s"$base/t")
    try {
      mem.addData((1, "a"), (2, "b"))
      q.processAllAvailable()
      mem.addData((3, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val sink = new VersionedParquetSink(base)
    assert(sink.read(spark, "t").collect().map(_.getInt(0)).sorted.toSeq ==
      Seq(1, 2, 3))
    // a restarted query on the same checkpoint replays nothing
    val q2 = mem.toDF().toDF("id", "v").writeStream.format("graft")
      .option("checkpointLocation", ckpt).start(s"$base/t")
    try {
      mem.addData((4, "d"))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(sink.read(spark, "t").collect().map(_.getInt(0)).sorted.toSeq ==
      Seq(1, 2, 3, 4), "replay duplicated or lost rows")
  }

  test("complete output mode on the format sink: keyed rewrite per batch") {
    import org.apache.spark.sql.functions._
    val base = TestSpark.tmpDir("gst-cm")
    val ckpt = TestSpark.tmpDir("gst-cmc")
    val mem = MemoryStream[Int](spark)
    val agg = mem.toDF()
      .groupBy((col("value") % 2).cast("int").as("k"))
      .agg(count(lit(1)).as("n"))
    val sink = new VersionedParquetSink(base)
    def current(): Map[Int, Long] =
      sink.read(spark, "agg").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val q = agg.writeStream.format("graft").outputMode("complete")
      .option("checkpointLocation", ckpt).start(s"$base/agg")
    try {
      mem.addData(1, 2, 3)
      q.processAllAvailable()
      assert(current() == Map(0 -> 1L, 1 -> 2L), current())
      mem.addData(4)
      q.processAllAvailable()
      assert(current() == Map(0 -> 2L, 1 -> 2L), current())
    } finally q.stop()
  }

  test("streaming change feed: deletes arrive as tagged rows, stream keeps going") {
    val base = TestSpark.tmpDir("gst-cdf")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((1, "a"), (2, "b")).toDF("id", "v"), "t") // v0
    val stream = spark.readStream.format("graft")
      .option("readChangeFeed", "true").load(s"$base/t")
    assert(stream.schema.fieldNames.contains("_change_type"))
    val q = stream.writeStream.format("memory").queryName("gstcdf_out")
      .option("checkpointLocation", TestSpark.tmpDir("gst-cdfc"))
      .start()
    def rows(): Seq[(Int, String, String)] =
      spark.table("gstcdf_out").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2))).sorted.toSeq
    try {
      q.processAllAvailable()
      assert(rows() == Seq((1, "a", "insert"), (2, "b", "insert")),
        s"initial feed: ${rows()}")
      sink.append(Seq((3, "c")).toDF("id", "v"), "t") // v1
      q.processAllAvailable()
      assert(rows().contains((3, "c", "insert")))
      // a DELETE stops the plain source; the CDF stream serves it as a
      // tagged row and keeps going
      sink.delete(spark, "t", col("id") === 1) // v2 rewrite
      q.processAllAvailable()
      assert(rows().contains((1, "a", "delete")), s"delete row: ${rows()}")
      sink.append(Seq((4, "d")).toDF("id", "v"), "t") // v3
      q.processAllAvailable()
      assert(rows().contains((4, "d", "insert")))
    } finally q.stop()
  }

  test("readStream tails commits; compaction transparent; DV stops it") {
    val base = TestSpark.tmpDir("gst2")
    val sink = new VersionedParquetSink(base)
    sink.append(Seq((1, "a")).toDF("id", "v"), "t")
    val stream = spark.readStream.format("graft").load(s"$base/t")
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("gst2_out")
      .option("checkpointLocation", TestSpark.tmpDir("gst2c"))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("gst2_out").count() == 1)
      sink.append(Seq((2, "b")).toDF("id", "v"), "t")
      sink.compact(spark, "t", targetFiles = Some(1)) // transparent
      sink.append(Seq((3, "c")).toDF("id", "v"), "t")
      q.processAllAvailable()
      assert(spark.table("gst2_out").collect().map(_.getInt(0)).sorted
        .toSeq == Seq(1, 2, 3), "compaction duplicated or dropped rows")
      // a data-changing commit stops the stream (Delta's contract)
      sink.delete(spark, "t", col("id") === 1)
      sink.append(Seq((4, "d")).toDF("id", "v"), "t")
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.processAllAvailable()
        q.awaitTermination(10000)
      }
    } finally q.stop()
    // with skipChangeCommits the same range streams appends-only
    val q2 = spark.readStream.format("graft")
      .option("skipChangeCommits", "true").load(s"$base/t")
      .writeStream.format("memory").queryName("gst2_out2")
      .option("checkpointLocation", TestSpark.tmpDir("gst2c2"))
      .start()
    try {
      q2.processAllAvailable()
      assert(spark.table("gst2_out2").collect().map(_.getInt(0)).sorted
        .toSeq == Seq(1, 2, 3, 4))
    } finally q2.stop()
  }

  test("graft-to-graft relay is exactly-once end to end") {
    val base = TestSpark.tmpDir("gst3")
    val src = new VersionedParquetSink(base)
    src.append(Seq((1, "a"), (2, "b")).toDF("id", "v"), "s")
    val q = spark.readStream.format("graft").load(s"$base/s")
      .filter(col("id") > 1) // a real transform in the middle
      .writeStream.format("graft")
      .option("checkpointLocation", TestSpark.tmpDir("gst3c"))
      .start(s"$base/d")
    try {
      q.processAllAvailable()
      src.append(Seq((3, "c")).toDF("id", "v"), "s")
      q.processAllAvailable()
    } finally q.stop()
    assert(new VersionedParquetSink(base).read(spark, "d").collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
  }
}
