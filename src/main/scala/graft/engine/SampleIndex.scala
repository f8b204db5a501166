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
  * topK(S ∪ B) = topK(topK(S) ∪ topK(B)) — so each round needs only the
  * persisted k rows plus the new batch. Per-round cost: one
  * TakeOrderedAndProject over the batch (O(batch) scan, k-row result)
  * plus a 2k-row merge; the historical corpus is NEVER re-read.
  *
  * Exactly-once WITHOUT idempotency keys: the key is a deterministic
  * hash of the document id, so absorbing the same rows twice yields the
  * identical reservoir (topK is idempotent over duplicates — also
  * dropDuplicates(id) guards the without-replacement contract).
  * Checkpoint loss therefore needs no healing protocol at all: ANY
  * re-batching of replayed files converges to the same state — a
  * strictly stronger story than the content-keyed appendOnce the other
  * indexes need, because the reservoir is a bounded idempotent merge
  * (CRDT-shaped), not an append log. Property-tested in SampleIndexSpec
  * (sequential-union equivalence, replay convergence, checkpoint-loss
  * replay).
  */
object SampleIndex {

  /** Merges `batch` (must carry `idCol` and `wtCol`) into the persisted
    * reservoir table and returns the resulting sample size (≤ k). The
    * reservoir stores the batch's columns plus `es_key`. */
  def absorb(spark: SparkSession, sink: TableSink, batch: DataFrame, k: Int,
      table: String = "reservoir", idCol: String = "doc_id",
      wtCol: String = "wt", salt: String = ""): Long = {
    val keyed = batch
      .withColumn("es_key", Sampling.esKey(col(idCol), col(wtCol), salt))
      .orderBy(col("es_key").desc, col(idCol).asc)
      .limit(k)
    val merged =
      if (sink.exists(spark, table)) sink.read(spark, table).unionByName(keyed)
      else keyed
    val next = merged
      .dropDuplicates(idCol)
      .orderBy(col("es_key").desc, col(idCol).asc)
      .limit(k)
      // the 2k-row merge must not lazily re-read the table it is about
      // to overwrite
      .localCheckpoint(true)
    sink.overwrite(next, table)
    next.count()
  }

  /** Continuous ingestion: stream document files (JSON lines with
    * doc_id/text), weight each doc by its text length, and fold every
    * micro-batch into the reservoir. No batch keys — see the object doc
    * for why replay converges without them. */
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
        if (!prepped.isEmpty) {
          absorb(batch.sparkSession, sink, prepped, k)
          ()
        }
      }
      .start()
  }
}
