package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.VersionedParquetSink
import graft.streaming.Rebalance

class RebalanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("batch rebalancing converges toward the smallest group's volume") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("rbb"))
    // 10:1 skew — en should be accepted at ~10% rate, de fully
    val rows = ((1 to 500).map(i => (i.toLong, s"t$i", "en")) ++
      (1 to 50).map(i => (1000L + i, s"u$i", "de"))).toDF("doc_id", "text", "lang")
    val r = Rebalance.appendRebalanced(spark, sink, rows, "lang", "doc_id")
    assert(r.seen == 550)
    val byLang = sink.read(spark, "balanced").groupBy("lang").count()
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(byLang("de") == 50, s"smallest group must be kept whole: $byLang")
    // hash acceptance at rate 0.1 over 500 docs: allow generous noise
    assert(byLang("en") >= 25 && byLang("en") <= 85,
      s"en should be downsampled to ~50: $byLang")
    // counts table carries the cumulative distribution
    val counts = sink.read(spark, "group_counts").collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(counts == Map("en" -> 500L, "de" -> 50L))
  }

  test("streaming rebalance: cumulative rates adapt, replay is exactly-once") {
    import java.nio.file.{Files, Paths}
    def line(id: Long, lang: String) =
      s"""{"doc_id":$id,"text":"doc $id","lang":"$lang"}"""
    val docsDir = TestSpark.tmpDir("rbs_in")
    val ckpt = TestSpark.tmpDir("rbs_ck")
    val sink = new VersionedParquetSink(TestSpark.tmpDir("rbs_store"))

    // batch 1: balanced mix — everything accepted (rates all 1.0)
    Files.write(Paths.get(docsDir, "b1.json"),
      ((1 to 20).map(i => line(i, "en")) ++ (21 to 40).map(i => line(i, "de")))
        .mkString("\n").getBytes)
    Rebalance.streamRebalanced(spark, docsDir, sink, ckpt).awaitTermination()
    assert(sink.read(spark, "balanced").count() == 40)

    // batch 2: en-only flood — cumulative en count now dwarfs de, so the
    // en acceptance rate drops to ~40/540
    Files.write(Paths.get(docsDir, "b2.json"),
      (41 to 540).map(i => line(i, "en")).mkString("\n").getBytes)
    Rebalance.streamRebalanced(spark, docsDir, sink, ckpt).awaitTermination()
    val counts = sink.read(spark, "group_counts").collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(counts == Map("en" -> 520L, "de" -> 20L), s"got $counts")
    val accepted2 = sink.read(spark, "balanced").count()
    assert(accepted2 >= 40 && accepted2 <= 40 + 80,
      s"flood should be heavily downsampled, got ${accepted2 - 40} of 500")

    // catastrophic restart: checkpoint LOST — batch-keyed commits absorb
    // the full replay with no double counts and no double appends
    val ckpt2 = TestSpark.tmpDir("rbs_ck2")
    Rebalance.streamRebalanced(spark, docsDir, sink, ckpt2).awaitTermination()
    assert(sink.read(spark, "balanced").count() == accepted2)
    assert(sink.read(spark, "group_counts").collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap == counts)
  }
}
