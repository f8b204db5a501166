package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{MinHashLsh, Text}

/** Incremental corpus deduplication — the production shape of dedup at
  * 100 TB: new documents are checked against a PERSISTED index of
  * content seen so far (exact fingerprints + MinHash band signatures),
  * and only survivors are appended to the corpus. Nothing ever
  * recomputes over the full historical corpus; each ingest round costs
  * O(new batch) plus equi-joins against the index on fingerprint /
  * (band, signature) — bucketed shuffle keys, never all-pairs, no
  * forced broadcasts (victim sets can be O(batch), which at re-crawl
  * scale would blow the broadcast ceiling).
  *
  * Index tables (on any [[TableSink]]):
  *  - `<prefix>_fp`:  (doc_id, fp) — [[Text.fingerprint]] (exact dup)
  *  - `<prefix>_sig`: (doc_id, band, bsig) — [[MinHashLsh]] signatures
  *    (the scheme shared with q_dedup_minhash; centralized because these
  *    rows PERSIST — producer drift would break the stored index)
  *
  * The index records every exact-distinct document the pipeline has SEEN
  * (including near-dup victims that never reach the corpus), so a
  * replayed or overlapping batch is fully absorbed — without this, a
  * doc dropped for colliding with another DROPPED doc would be
  * unrepresented and reappear on replay.
  *
  * Semantics: exact-duplicate and band-collision (near-dup candidate)
  * rows are dropped; first occurrence wins, including WITHIN the new
  * batch. Band collision alone is the recall-leaning default; pass
  * `verifyThreshold` to add the precision stage — exact n-gram jaccard
  * on each candidate pair (as in q_minhash_est) gating the drop.
  */
object DedupIndex {

  final case class Result(appended: Long, droppedExact: Long, droppedNear: Long)

  /** Continuous ingestion: stream document files (JSON lines with
    * doc_id/text) and dedup every micro-batch against the persisted
    * index via [[appendDeduped]], keyed by batchId — on a versioned sink
    * a crash-replayed batch is absorbed exactly-once.
    *
    * @param verifyThreshold passed through to [[appendDeduped]]: when
    *   set, each band collision must ALSO reach this exact n-gram
    *   jaccard to drop the document (the precision stage, applied per
    *   micro-batch against the persisted index). */
  def streamDeduped(spark: SparkSession, docsDir: String, sink: TableSink,
      checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      verifyThreshold: Option[Double] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType, nullable = false)))
    // one file per micro-batch (the Rebalance recipe): batch composition
    // is then DETERMINISTIC across checkpoint loss, so the content keys
    // align file-for-file — a crash between appendDeduped's three table
    // writes heals on replay (same key: corpus no-ops, index fills in),
    // and a post-loss NEW file forms its own batch with its own key
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .json(docsDir)
      .writeStream
      .queryName("graft-dedup-ingest")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // CONTENT-derived key, NOT batchId (the round-4 chaos test's
        // find): after checkpoint loss the re-formed batch 0 may MERGE
        // already-committed files with NEW ones; a batchId key would
        // match the pre-crash commit and appendOnce would silently
        // swallow the new files' rows. A content key makes an identical
        // replay a no-op while any re-batched superset proceeds — the
        // index's fingerprint stage then absorbs the already-ingested
        // rows, so the combination stays exactly-once under ANY
        // re-batching. The aggregate doubles as the emptiness check.
        // ( separator: boundary-shifted values must not collide.)
        val sig = batch.agg(count(lit(1)),
          sum(crc32(concat_ws("", col("doc_id"), col("text"))))).head()
        if (sig.getLong(0) > 0) {
          appendDeduped(batch.sparkSession, sink, batch,
            batchKey = Some(s"dedup-${sig.getLong(0)}-${sig.getLong(1)}"),
            verifyThreshold = verifyThreshold)
          ()
        }
      }
      .start()
  }

  /** Dedup `newDocs` (doc_id, text, ...) against the index AND itself,
    * append survivors to `docsTable` and every exact-distinct doc's
    * fingerprint/signatures to the index tables.
    *
    * @param batchKey idempotency key for the three appends (use the
    *   micro-batch id from streaming): a crash between appends followed
    *   by a replay otherwise appends corpus rows whose index entries
    *   were never written — and the second run can't dedup them.
    * @param verifyThreshold precision stage: when set, a band collision
    *   is only a CANDIDATE — the pair's exact n-gram jaccard must reach
    *   the threshold for the new doc to be dropped, so an unlucky
    *   signature collision between unrelated documents (LSH false
    *   positive) no longer costs a document. Verification is row-local
    *   on the already-bucketed candidate pairs (never all-pairs); an
    *   index-side candidate whose colliding document is not in the
    *   corpus (it was itself dropped as a near-dup victim, so its text
    *   is gone) stays a drop — the recall-conservative default. */
  def appendDeduped(spark: SparkSession, sink: TableSink, newDocs: DataFrame,
      docsTable: String = "corpus", indexPrefix: String = "dedup",
      batchKey: Option[String] = None,
      verifyThreshold: Option[Double] = None): Result = {
    val fpTable = s"${indexPrefix}_fp"
    val sigTable = s"${indexPrefix}_sig"
    def write(df: DataFrame, table: String): Unit = batchKey match {
      case Some(k) => sink.appendOnce(df, table, s"$k:$table"); ()
      case None => sink.append(df, table)
    }

    val inBatch = newDocs.cache()
    var toUnpersist = List.empty[DataFrame]
    try {
      val total = inBatch.count()
      // ---- exact: drop known fingerprints, keep first per fp in batch
      val fps = inBatch.select(col("doc_id"),
        Text.fingerprint(col("text")).as("fp"))
      val knownFp =
        if (sink.exists(spark, fpTable)) sink.read(spark, fpTable).select("fp")
        else spark.emptyDataFrame.select(lit("").as("fp")).limit(0)
      val freshFp = fps.join(knownFp, Seq("fp"), "left_anti")
        .groupBy("fp").agg(min("doc_id").as("doc_id"))
        .select("doc_id", "fp")
      val exactSurvivors = inBatch.join(
        freshFp.select("doc_id"), Seq("doc_id"), "left_semi").cache()
      toUnpersist ::= exactSurvivors
      // ---- near: drop band-signature collisions vs index and in-batch.
      // sigs feeds three branches AND the index append — cache it.
      val sigs = MinHashLsh.signatures(spark, exactSurvivors).cache()
      toUnpersist ::= sigs
      val knownSig =
        if (sink.exists(spark, sigTable))
          sink.read(spark, sigTable).select("doc_id", "band", "bsig")
        else spark.emptyDataFrame
          .select(lit(0L).as("doc_id"), lit(0).as("band"),
            lit("").as("bsig")).limit(0)
      val nearVictims = verifyThreshold match {
        case None =>
          val hitIndex = sigs
            .join(knownSig.select("band", "bsig"), Seq("band", "bsig"),
              "left_semi")
            .select("doc_id").distinct()
          // in-batch near-dups: per (band,bsig) bucket the min doc_id wins
          val hitBatch = sigs.as("a")
            .join(sigs.as("b"),
              col("a.band") === col("b.band") &&
                col("a.bsig") === col("b.bsig") &&
                col("a.doc_id") > col("b.doc_id"))
            .select(col("a.doc_id").as("doc_id")).distinct()
          hitIndex.union(hitBatch).distinct()
        case Some(thr) =>
          import spark.implicits._
          val newTexts = exactSurvivors.select(col("doc_id"),
            col("text").as("new_text"))
          // index-side candidate pairs, joined to the corpus for the
          // historical text (equi-joins on (band,bsig) then doc_id —
          // bucketed keys, candidate-sized inputs)
          val idxPairs = sigs
            .join(knownSig.withColumnRenamed("doc_id", "idx_doc_id"),
              Seq("band", "bsig"))
            .select(col("doc_id"), col("idx_doc_id")).distinct()
          // broadcast semi-join prefilter: candidate ids are bounded by
          // this batch's collisions (tiny), so the corpus text column is
          // filtered MAP-SIDE — without it the full historical text
          // column would shuffle every batch, breaking the module's
          // O(new batch) cost contract
          val candidateIds = idxPairs.select("idx_doc_id").distinct()
          val corpusTexts =
            if (sink.exists(spark, docsTable))
              sink.read(spark, docsTable)
                .select(col("doc_id").as("idx_doc_id"),
                  col("text").as("idx_text"))
                .join(broadcast(candidateIds), Seq("idx_doc_id"), "left_semi")
            else spark.emptyDataFrame
              .select(lit(0L).as("idx_doc_id"), lit("").as("idx_text"))
              .limit(0)
          val idxVictims = idxPairs
            .join(corpusTexts, Seq("idx_doc_id"), "left")
            .join(newTexts, Seq("doc_id"))
            .select(col("doc_id"), col("new_text"), col("idx_text"))
            .as[(Long, String, Option[String])]
            .filter { case (_, nt, it) =>
              it.forall(t => Text.jaccard(nt, t, 3) >= thr) // None => drop
            }
            .map(_._1).toDF("doc_id")
          // in-batch candidate pairs carry both texts; min doc_id wins
          // only when the pair VERIFIES
          val batchVictims = sigs.as("a")
            .join(sigs.as("b"),
              col("a.band") === col("b.band") &&
                col("a.bsig") === col("b.bsig") &&
                col("a.doc_id") > col("b.doc_id"))
            .select(col("a.doc_id").as("doc_id"),
              col("b.doc_id").as("other_id")).distinct()
            .join(newTexts, Seq("doc_id"))
            .join(newTexts.select(col("doc_id").as("other_id"),
              col("new_text").as("other_text")), Seq("other_id"))
            .select(col("doc_id"), col("new_text"), col("other_text"))
            .as[(Long, String, String)]
            .filter { case (_, a, b) => Text.jaccard(a, b, 3) >= thr }
            .map(_._1).toDF("doc_id")
          idxVictims.union(batchVictims).distinct()
      }
      val kept = exactSurvivors
        .join(nearVictims, Seq("doc_id"), "left_anti")
        .cache()
      toUnpersist ::= kept
      val nKept = kept.count()
      val nExactSurvived = exactSurvivors.count()
      if (nExactSurvived > 0) {
        if (nKept > 0) write(kept, docsTable)
        // the index absorbs EVERY exact-distinct doc seen (victims too)
        write(exactSurvivors.select(col("doc_id"),
          Text.fingerprint(col("text")).as("fp")), fpTable)
        write(sigs, sigTable)
      }
      Result(nKept,
        droppedExact = total - nExactSurvived,
        droppedNear = nExactSurvived - nKept)
    } finally {
      toUnpersist.foreach(_.unpersist())
      inBatch.unpersist()
    }
  }
}
