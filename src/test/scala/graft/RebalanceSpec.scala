package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.VersionedParquetSink
import graft.streaming.Rebalance

class RebalanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cumCounts(sink: VersionedParquetSink): Map[String, Long] =
    sink.read(spark, "group_counts").groupBy("lang")
      .sum("n_seen").collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap

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
    // counts log carries the cumulative distribution
    assert(cumCounts(sink) == Map("en" -> 500L, "de" -> 50L))
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
    assert(cumCounts(sink) == Map("en" -> 520L, "de" -> 20L))
    val accepted2 = sink.read(spark, "balanced").count()
    assert(accepted2 >= 40 && accepted2 <= 40 + 80,
      s"flood should be heavily downsampled, got ${accepted2 - 40} of 500")

    // catastrophic restart: checkpoint LOST — content-derived batch keys
    // absorb the replay of the SAME files with no double counts/appends
    val ckpt2 = TestSpark.tmpDir("rbs_ck2")
    Rebalance.streamRebalanced(spark, docsDir, sink, ckpt2).awaitTermination()
    assert(sink.read(spark, "balanced").count() == accepted2)
    assert(cumCounts(sink) == Map("en" -> 520L, "de" -> 20L))

    // checkpoint lost AGAIN and a NEW file arrived before the restart:
    // the replayed batch now holds old + new files under a NEW content
    // key, so the new rows must land (a batch-id key would silently
    // swallow them) while the old rows never duplicate (id anti-join)
    Files.write(Paths.get(docsDir, "b3.json"),
      (1001 to 1020).map(i => line(i, "de")).mkString("\n").getBytes)
    val ckpt3 = TestSpark.tmpDir("rbs_ck3")
    Rebalance.streamRebalanced(spark, docsDir, sink, ckpt3).awaitTermination()
    val balanced = sink.read(spark, "balanced")
    val newDe = balanced.filter($"doc_id" >= 1001).count()
    assert(newDe == 20, s"new file's rows were swallowed: $newDe of 20")
    // no id appears twice anywhere
    assert(balanced.count() ==
      balanced.select("doc_id").distinct().count())
  }

  test("upgrade from the merged (pre-log) counts layout: legacy rows still count") {
    val sink = new VersionedParquetSink(TestSpark.tmpDir("rbleg"))
    // old layout: one merged row per group, NO batch_key column
    sink.append(Seq(("en", 400L), ("de", 40L)).toDF("lang", "n_seen"),
      "group_counts")
    val r = Rebalance.appendRebalanced(spark, sink,
      (1 to 100).map(i => (i.toLong, s"t$i", "en")).toDF("doc_id", "text", "lang"),
      "lang", "doc_id", batchKey = Some("up-1"))
    assert(r.seen == 100)
    // legacy counts participate: en cumulative 500 vs de 40 -> rate 0.08
    val en = sink.read(spark, "balanced").count()
    assert(en <= 25, s"legacy counts ignored: accepted $en of 100")
    assert(cumCounts(sink) == Map("en" -> 500L, "de" -> 40L))
    // empty ad-hoc frame is a clean no-op, not an NPE
    val r0 = Rebalance.appendRebalanced(spark, sink,
      Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang"),
      "lang", "doc_id")
    assert(r0 == Rebalance.Result(0L, 0L))
  }

  test("replay between the counts append and the corpus append keeps the sample identical") {
    // simulate the crash window: run once normally, then manually replay
    // with the same batch key after the counts append already committed —
    // rates must EXCLUDE the batch's own counts, so the accepted set (and
    // the corpus) is byte-identical, not resampled at half the rate
    val sink = new VersionedParquetSink(TestSpark.tmpDir("rbcrash"))
    Rebalance.appendRebalanced(spark, sink,
      Seq((1L, "a", "fr")).toDF("doc_id", "text", "lang"), "lang", "doc_id",
      batchKey = Some("seed"))
    val batch = ((1 to 200).map(i => (100L + i, s"t$i", "en")) ++
      Seq((900L, "x", "fr"))).toDF("doc_id", "text", "lang")
    val r1 = Rebalance.appendRebalanced(spark, sink, batch, "lang", "doc_id",
      batchKey = Some("b-7"))
    val corpus1 = sink.read(spark, "balanced").orderBy("doc_id").collect().toSeq
    // full replay of the same batch key: counts appendOnce no-ops, and the
    // recomputed rates/accepted set must match the first run exactly
    val r2 = Rebalance.appendRebalanced(spark, sink, batch, "lang", "doc_id",
      batchKey = Some("b-7"))
    val corpus2 = sink.read(spark, "balanced").orderBy("doc_id").collect().toSeq
    assert(corpus1 == corpus2, "replay changed the committed sample")
    assert(r1.seen == r2.seen)
  }
}
