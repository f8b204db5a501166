package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{SemDedup, Tables, VersionedParquetSink}

/** The training-corpus flagship: the library's curation operators
  * composed into the actual LLM-data workflow — quality filter → exact
  * dedup → semantic dedup → contamination-safe split → sequence packing
  * → one transactional multi-table publish — with the invariants a
  * 100 TB corpus build is gated on asserted at the end: no duplicate
  * survives, no duplicate group straddles the train/val split, every
  * kept document passes the quality rule, the published stats reconcile
  * with the published splits, and re-running the batch is a no-op
  * (keyed cross-table transaction). */
class TrainingPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("curate -> dedup -> split -> pack -> transactional publish") {
    graft.GraftExtensions.ensureRegistered(spark)
    val sink = new VersionedParquetSink(TestSpark.tmpDir("trainpipe"))

    // 1. quality filter (the Gopher word-count/diversity shape, row-local)
    val docs = Tables.documents(spark, sf)
      .withColumn("ws", split(col("text"), " "))
      .withColumn("n_tok", size(col("ws")).cast("long"))
      .withColumn("ttr",
        size(array_distinct(col("ws"))).cast("double") / col("n_tok"))
      .filter(col("n_tok") >= 10 && col("ttr") >= 0.05)
      .drop("ws")
    val nQuality = docs.count()
    assert(nQuality > 0 && nQuality <= 500)

    // 2. exact dedup: one survivor (lowest doc_id) per content fingerprint
    val fp = docs.withColumn("fp", md5(col("text").cast("binary")))
    val keepIds = fp.groupBy("fp").agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val exactKept = fp.join(keepIds, Seq("doc_id"), "left_semi")

    // 3. semantic dedup on the aligned embeddings (SemDeDup, k ∝ corpus)
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
      .join(exactKept.select(col("doc_id").as("id")), Seq("id"), "left_semi")
    val semKept = SemDedup.dedup(spark, vecs,
      targetCellSize = 50, tau = 0.35).select("id")
    val curated = exactKept.join(
      semKept.select(col("id").as("doc_id")), Seq("doc_id"), "left_semi")

    // 4. contamination-safe split: the split hash keys on the CONTENT
    // fingerprint, so any residual duplicate pair lands on one side
    val splitDocs = curated.withColumn("split",
      when(conv(substring(col("fp"), 1, 4), 16, 10).cast("int") % 10 < 8,
        "train").otherwise("val"))

    // 5. pack into ~128-token sequences per split (running-sum binning)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("split").orderBy("doc_id")
    val packed = splitDocs
      .withColumn("cum", sum("n_tok").over(w))
      .withColumn("seq_id", floor((col("cum") - 1) / 128))
      .select("doc_id", "split", "fp", "n_tok", "seq_id", "text")

    // 6. one transactional publish: train/val/stats all land or none
    val train = packed.filter(col("split") === "train").drop("split")
    val vali = packed.filter(col("split") === "val").drop("split")
    val stats = packed.groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
        countDistinct("seq_id").as("n_seqs"))
    assert(sink.multiAppendOnce(Seq(
      train -> "train", vali -> "val", stats -> "corpus_stats"),
      txnKey = "corpus-build-1"))

    // ---- the gating invariants, read back from the PUBLISHED tables
    val pubTrain = sink.read(spark, "train")
    val pubVal = sink.read(spark, "val")
    val pubStats = sink.read(spark, "corpus_stats")

    // no duplicate fingerprint survives anywhere
    val all = pubTrain.select("fp").union(pubVal.select("fp"))
    assert(all.count() == all.distinct().count(), "duplicate survived dedup")
    // no fingerprint straddles the split (contamination)
    assert(pubTrain.select("fp").intersect(pubVal.select("fp")).count() == 0)
    // every published doc passes the quality gate
    assert(pubTrain.filter(col("n_tok") < 10).count() == 0)
    // stats reconcile with the published splits
    val m = pubStats.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("train")._1 == pubTrain.count())
    assert(m("val")._1 == pubVal.count())
    assert(m("train")._2 == pubTrain.agg(sum("n_tok")).head.getLong(0))
    // packing respects the bin grain: every sequence holds >= 1 doc and
    // consecutive seq_ids per split
    val seqs = pubTrain.select("seq_id").distinct().orderBy("seq_id")
      .collect().map(_.getLong(0))
    assert(seqs.head == 0 && seqs.zip(seqs.tail).forall { case (a, b) => b == a + 1 })

    // 7. the batch is a keyed transaction: a replay publishes NOTHING
    assert(!sink.multiAppendOnce(Seq(
      train -> "train", vali -> "val", stats -> "corpus_stats"),
      txnKey = "corpus-build-1"))
    assert(sink.read(spark, "train").count() == pubTrain.count())
    assert(sink.versions(spark, "train").size == 1)
  }
}
