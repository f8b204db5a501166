package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted streaming weighted reservoir — a size-k weighted sample
  * WITHOUT replacement over everything ever ingested, maintained
  * incrementally (the continuous-ingest counterpart of
  * `q_weighted_sample`, and the sampling member of the incremental-index
  * family: DedupIndex / AnnIndex / ChunkIndex).
  *
  * Soundness: with A-Res keys ([[Sampling.esKey]]) the global sample IS
  * the global top-k by key, and top-k distributes over union —
  * topK(S ∪ B) = topK(topK(S) ∪ topK(B)) — so retaining each batch's
  * top-k candidates suffices to answer the global sample exactly.
  *
  * Storage shape — an APPEND-ONLY candidate log plus a top-k view, not
  * read-modify-write state:
  *  - [[absorb]] appends the batch's k best candidates (one
  *    TakeOrderedAndProject over the batch — the historical corpus is
  *    never re-read). Appends are race-safe under concurrent writers on
  *    a versioned sink (commit-claim loop), unlike an overwrite-merge,
  *    whose read-merge-write window would silently drop a concurrent
  *    writer's contribution.
  *  - [[sample]] computes the current sample: top-k over the log after
  *    per-id dedup. Because the key is a DETERMINISTIC id hash,
  *    replayed/duplicated candidates are identical rows — the sample is
  *    correct with NO idempotency keys under ANY re-batching (top-k is
  *    idempotent over duplicates). Batch keys (the `batchKey` param)
  *    only bound log GROWTH under replay, never correctness.
  *  - [[compact]] folds the log back to its top-k. On a
  *    [[VersionedParquetSink]] it is a SERIALIZABLE rewrite
  *    (`rewriteSnapshot`): a concurrent absorb forces a retry that
  *    re-derives from the fresh snapshot, so nothing is lost; on plain
  *    sinks run it quiesced.
  *
  * Log growth between compactions is ≤ k rows per batch — bounded and
  * tiny relative to the data; a daily compact keeps reads O(k).
  * Property-tested in SampleIndexSpec (sequential-union equivalence,
  * out-of-order replay convergence, checkpoint-loss streaming replay,
  * compaction under interleaved absorbs).
  */
object SampleIndex {

  /** Appends `batch`'s top-k candidates (batch must carry `idCol` and
    * `wtCol`; the log stores them plus `es_key`). Pass `batchKey` to
    * make replayed appends no-ops — optional: [[sample]] is correct
    * without it, the key only bounds log growth. */
  def absorb(spark: SparkSession, sink: TableSink, batch: DataFrame, k: Int,
      table: String = "reservoir", idCol: String = "doc_id",
      wtCol: String = "wt", salt: String = "",
      batchKey: Option[String] = None): Unit = {
    val keyed = candidates(batch, k, idCol, wtCol, salt)
    batchKey match {
      case Some(bk) => sink.appendOnce(keyed, table, bk); ()
      case None => sink.append(keyed, table)
    }
  }

  /** One batch's keyed top-k candidate rows WITHOUT appending them —
    * the composable form: the flagship stream hands these to the SAME
    * `multiAppendOnce` transaction that commits the corpus tables, so
    * the reservoir absorbs a batch iff that batch landed. */
  def candidates(batch: DataFrame, k: Int, idCol: String = "doc_id",
      wtCol: String = "wt", salt: String = ""): DataFrame =
    batch
      .withColumn("es_key", Sampling.esKey(col(idCol), col(wtCol), salt))
      .orderBy(col("es_key").desc, col(idCol).asc)
      .limit(k)

  /** Deterministic per-id dedup of the candidate log: keep the MAX
    * es_key row (ties — same clamped weight, hence same key — broken by
    * the remaining columns descending, a total order). A bare
    * dropDuplicates keeps an ARBITRARY survivor: if the same doc_id is
    * ever absorbed with a different weight (a re-crawl changed the text
    * length in [[streamSampled]]), the surviving key — and hence the
    * top-k — would depend on partitioning. The window runs over the
    * log, which is O(k x batches) and compacted, never the corpus. */
  private def bestPerId(df: DataFrame, idCol: String): DataFrame = {
    val tieBreak = df.columns.filterNot(c => c == idCol || c == "es_key")
      .map(col(_).desc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("es_key").desc +: tieBreak: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** The current sample: top-k over the candidate log (per-id dedup
    * guards without-replacement under replayed candidates). */
  def sample(spark: SparkSession, sink: TableSink, k: Int,
      table: String = "reservoir", idCol: String = "doc_id"): DataFrame =
    bestPerId(sink.read(spark, table), idCol)
      .orderBy(col("es_key").desc, col(idCol).asc)
      .limit(k)

  /** Folds the candidate log to its current top-k. Serializable on a
    * versioned sink (see object doc); `localCheckpoint` keeps the plain
    * sink's overwrite from lazily re-reading the table it replaces. */
  def compact(spark: SparkSession, sink: TableSink, k: Int,
      table: String = "reservoir", idCol: String = "doc_id"): Unit = {
    def topK(df: DataFrame): DataFrame = bestPerId(df, idCol)
      .orderBy(col("es_key").desc, col(idCol).asc)
      .limit(k)
    sink match {
      case v: VersionedParquetSink =>
        v.rewriteSnapshot(spark, table, "sample-compact")(topK)
        ()
      case _ =>
        sink.overwrite(topK(sink.read(spark, table)).localCheckpoint(true),
          table)
    }
  }

  /** Continuous ingestion: stream document files (JSON lines with
    * doc_id/text), weight each doc by its text length, and fold every
    * micro-batch into the reservoir. Batch keys are content-derived
    * (the DedupIndex recipe) so a replayed batch appends nothing — but
    * see the object doc: the sample stays correct even when checkpoint
    * loss RE-BATCHES files and the keys never match. */
  def streamSampled(spark: SparkSession, docsDir: String, sink: TableSink,
      checkpoint: String, k: Int,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType, nullable = false)))
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .json(docsDir)
      .writeStream
      .queryName("graft-sample-ingest")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val prepped = batch.select(col("doc_id"),
          greatest(length(col("text")), lit(1)).as("wt"))
        val sig = prepped.agg(count(lit(1)),
          sum(crc32(concat_ws("", col("doc_id"), col("wt"))))).head()
        if (sig.getLong(0) > 0) {
          absorb(batch.sparkSession, sink, prepped, k,
            batchKey = Some(s"sample-${sig.getLong(0)}-${sig.getLong(1)}"))
        }
      }
      .start()
  }
}
