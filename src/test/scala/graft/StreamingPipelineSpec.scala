package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.ParquetTableSink
import graft.streaming.StreamingPipeline

class StreamingPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def entry(guid: String, title: String): String =
    s"""{"title":"$title","published":"Mon, 05 Feb 2024 10:30:00 GMT","description":"d","link":"https://x/$guid","guid":"$guid","media_thumbnail":null,"feed":"Politics"}"""

  test("streaming pipeline: AvailableNow drain, dedup state across batches, restart exactly-once") {
    val feeds = TestSpark.tmpDir("sfeeds")
    val store = TestSpark.tmpDir("sstore")
    val ckpt = TestSpark.tmpDir("sckpt")
    val sink = new ParquetTableSink(store)

    Files.write(Paths.get(feeds, "b1.json"),
      Seq(entry("g1", "President Alice Smith resigns"),
        entry("g2", "Mayor Bob Kane appoints Carol Day")).mkString("\n").getBytes)

    val q1 = StreamingPipeline.stream(spark, feeds, sink, ckpt)
    q1.awaitTermination()
    assert(sink.read(spark, "raw").count() == 2)
    assert(sink.read(spark, "actors").count() > 0)

    // restart with no new input: nothing re-appended (checkpointed offsets)
    val q2 = StreamingPipeline.stream(spark, feeds, sink, ckpt)
    q2.awaitTermination()
    assert(sink.read(spark, "raw").count() == 2)

    // new file with one duplicate guid: state store drops it
    Files.write(Paths.get(feeds, "b2.json"),
      Seq(entry("g2", "Mayor Bob Kane appoints Carol Day"),
        entry("g3", "Housing rent crisis, warns Dana Reed")).mkString("\n").getBytes)
    val q3 = StreamingPipeline.stream(spark, feeds, sink, ckpt)
    q3.awaitTermination()
    assert(sink.read(spark, "raw").count() == 3)
    assert(sink.read(spark, "raw").select("id").distinct().count() == 3)
  }
}
