package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.VersionedParquetSink
import graft.queries.Helpers

/** Streaming distribution rebalancing — the incremental form of
  * q_rebalance: every micro-batch is filtered by per-group acceptance
  * rates derived from the CUMULATIVE group counts seen so far, so the
  * accepted corpus converges toward the smallest group's volume even as
  * the stream's mix drifts.
  *
  * State is an APPEND-ONLY per-batch counts log persisted on the sink
  * (`countsTable`: group, n_seen, batch_key) — not the streaming state
  * store — so it survives checkpoint loss and is readable by any
  * session. Cumulative counts are one tiny groupBy over it.
  *
  * Replay contract (all writes share the batch key):
  *  - rates are derived from the log EXCLUDING this batch's key, so a
  *    replay that already appended its counts recomputes the IDENTICAL
  *    rates (and therefore the identical accepted set) — a crash
  *    between the two appends cannot change the sample;
  *  - the corpus append additionally anti-joins the already-committed
  *    corpus ids, so a replayed row can never duplicate even if a
  *    caller re-batches arbitrarily;
  *  - streaming keys are content-derived (order-independent id
  *    fingerprint of the batch), so new files arriving between a
  *    checkpoint loss and the replay are never silently swallowed by a
  *    batch-id collision — and maxFilesPerTrigger=1 makes batch
  *    composition deterministic, so post-loss replays re-form the SAME
  *    per-file batches and the counts log never over-counts.
  *
  * Acceptance itself is the same pure per-row hash test as q_rebalance
  * (hash16(id)/2^16 < rate): no window, no per-group sort, identical
  * behavior in a backfill and in a stream.
  */
object Rebalance {

  final case class Result(accepted: Long, seen: Long)

  /** File-stream wrapper: JSON lines with (doc_id, text, <groupCol>)
    * rebalanced into `corpusTable` with the counts log in
    * `countsTable`. Keys are per-table, so two pipelines on one sink
    * separate cleanly by table names. */
  def streamRebalanced(spark: SparkSession, docsDir: String,
      sink: VersionedParquetSink, checkpoint: String,
      groupCol: String = "lang",
      corpusTable: String = "balanced", countsTable: String = "group_counts",
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField(groupCol,
        org.apache.spark.sql.types.StringType, nullable = false)))
    // one file per micro-batch: batch composition is then DETERMINISTIC
    // across checkpoint loss (a replay re-forms the same per-file
    // batches, so the content keys align and every write no-ops; without
    // this, a replay could merge several files into one batch with a new
    // key and double-append the counts). Throughput trade-off is the
    // usual maxFilesPerTrigger one — ingest feeds land files steadily.
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .json(docsDir)
      .writeStream
      .queryName("graft-rebalance-ingest")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // content-derived key (order-independent FULL-ROW fingerprint):
        // stable across checkpoint loss — a replayed batch of the same
        // rows no-ops, while a post-loss batch that picked up NEW files
        // gets a NEW key, so its rows are never silently swallowed by a
        // batch-id collision (inputFiles is empty on foreachBatch
        // frames, so the fingerprint comes from the data). Hashing the
        // whole row, not just the id, means a corrected re-emission of
        // the same ids is a NEW batch, not a swallowed replay. The same
        // aggregate doubles as the emptiness check (one job, not two).
        // \u0001 separator (cannot occur in the data): an empty
        // separator would let boundary-shifted values (group='en',
        // text='xy' vs group='enx', text='y') produce identical per-row
        // strings, and a genuinely different batch could then collide on
        // (count, crc-sum) and be swallowed as a replay
        val sig = batch.agg(count(lit(1)),
          sum(crc32(concat_ws("\u0001",
            col("doc_id"), col(groupCol), col("text"))))).head()
        if (sig.getLong(0) > 0) {
          val key = s"rebalance-${sig.getLong(0)}-${sig.getLong(1)}"
          appendRebalanced(batch.sparkSession, sink, batch, groupCol,
            idCol = "doc_id", batchKey = Some(key),
            corpusTable = corpusTable, countsTable = countsTable,
            // maxFilesPerTrigger=1 makes batch composition deterministic,
            // so keyed no-ops fully cover replays — the per-batch
            // O(corpus) anti-join would be pure overhead on the hot path
            dedupAgainstCorpus = false)
          // bound the counts log's file/manifest growth (its row count is
          // G per batch — tiny; the FILE count is what a year of
          // micro-batches would bloat). Keyed: a replayed maintenance
          // batch skips the rewrite.
          if (batchId % 64 == 63)
            sink.compact(spark, countsTable, targetFiles = Some(1),
              commitKey = Some(s"$key:compact"))
          ()
        }
      }
      .start()
  }

  /** Rebalance one batch against the persisted cumulative counts and
    * append the accepted rows (see the class doc for the replay
    * contract). */
  def appendRebalanced(spark: SparkSession, sink: VersionedParquetSink,
      rows: DataFrame, groupCol: String, idCol: String,
      batchKey: Option[String] = None,
      corpusTable: String = "balanced", countsTable: String = "group_counts",
      dedupAgainstCorpus: Boolean = true)
      : Result = {
    // ad-hoc (unkeyed) calls still need a unique log marker to exclude
    val key = batchKey.getOrElse(s"adhoc-${java.util.UUID.randomUUID()}")
    val cached = rows.cache()
    try {
      val batchCounts = cached.groupBy(col(groupCol))
        .agg(count(lit(1)).cast("long").as("n_seen"))
        .withColumn("batch_key", lit(key))
      val nSeen = batchCounts.agg(coalesce(sum("n_seen"), lit(0L)))
        .head().getLong(0)
      if (nSeen == 0) return Result(0L, 0L) // empty frame: nothing to log

      // cumulative counts EXCLUDING this batch's key: deterministic under
      // replay whether or not the counts append already committed. A
      // counts table written by the pre-log (merged) layout has no
      // batch_key column — its rows are all prior state, nothing to
      // exclude; the first post-upgrade append evolves the schema.
      val prev =
        if (!sink.exists(spark, countsTable)) batchCounts.limit(0)
        else {
          val t = sink.read(spark, countsTable)
          // null-safe inequality: legacy (pre-evolution) rows read
          // batch_key as NULL and must stay included, not drop to null
          if (t.columns.contains("batch_key"))
            t.filter(!(col("batch_key") <=> lit(key)))
          else t.withColumn("batch_key", lit("legacy"))
        }
      val cum = prev.unionByName(batchCounts)
        .groupBy(groupCol)
        .agg(sum("n_seen").cast("long").as("n_seen"))

      // same rate formula as q_rebalance (r4 of the rational rate)
      val rates = cum
        .crossJoin(broadcast(cum.agg(min("n_seen").as("n_min"))))
        .withColumn("rate", Helpers.r4(col("n_min") / col("n_seen")))
        .select(col(groupCol), col("rate"))
      val sampled = cached.join(broadcast(rates), Seq(groupCol))
        .filter(Helpers.hash16(col(idCol)) / 65536.0 < col("rate"))
        .select(cached.columns.map(col): _*)
      // id-level dedup vs the committed corpus: a re-batched replay
      // (checkpoint loss) can never append the same row twice
      // id-level dedup vs the committed corpus: protects AD-HOC callers
      // whose re-batched replays have no stable key. The streaming
      // wrapper turns it OFF — with deterministic per-file batches the
      // keyed no-op already covers replays, and a per-batch O(corpus)
      // scan would dominate steady-state ingest.
      val accepted = (
        if (!dedupAgainstCorpus || !sink.exists(spark, corpusTable)) sampled
        else sampled.join(
          sink.read(spark, corpusTable).select(col(idCol)), Seq(idCol),
          "left_anti")
      ).cache() // consumed by the count AND the corpus write
      try {
        val nAccepted = accepted.count()
        batchKey match {
          case Some(k) =>
            sink.appendOnce(batchCounts, countsTable, s"$k:counts",
              allowEvolution = true) // legacy (pre-log) counts schema
            sink.appendOnce(accepted, corpusTable, s"$k:corpus")
          case None =>
            sink.append(batchCounts, countsTable, allowEvolution = true)
            sink.append(accepted, corpusTable)
        }
        Result(nAccepted, nSeen)
      } finally { accepted.unpersist(); () }
    } finally { cached.unpersist(); () }
  }
}
