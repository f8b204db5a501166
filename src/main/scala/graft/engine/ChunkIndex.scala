package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental content-addressed chunk store — the LBFS / Venti /
  * restic storage model composed from [[Chunker]] and a [[TableSink]]:
  * each ingested document is split at content-defined boundaries, chunk
  * CONTENTS are stored once per distinct hash, and a per-document
  * manifest records the reassembly recipe. Because boundaries are
  * content-local, a re-crawl that edits one paragraph re-stores only
  * the chunks the edit touched — steady-state ingest cost is O(new
  * batch) plus ONE hash-keyed anti-join against the store (never a
  * re-scan of history), and storage grows with NOVEL content, not with
  * ingested bytes.
  *
  * Tables (on any [[TableSink]]):
  *  - `<prefix>_store`:    (hash, n_tokens, text) — distinct chunk
  *    contents, first writer wins (contents are immutable by address).
  *  - `<prefix>_manifest`: (doc_id, chunk, hash) — reassembly recipe;
  *    doc_ids must be unique across the corpus (the ingest contract
  *    shared with DedupIndex).
  *
  * Crash safety: both appends ride the sink's keyed exactly-once
  * ([[VersionedParquetSink.appendOnce]]) under one batch key, STORE
  * FIRST — a manifest row must never reference a chunk the store does
  * not hold, and a crash between the two appends heals on replay (the
  * store append no-ops on its key, the manifest append fills in). */
object ChunkIndex {

  final case class Result(docs: Long, chunks: Long, newChunks: Long,
      dedupedTokens: Long)

  /** Ingest `newDocs` (doc_id, text): chunk, store novel contents,
    * append the manifest. Returns batch metrics; `dedupedTokens` is
    * the token mass this batch served from already-stored chunks (the
    * storage saved by content addressing).
    *
    * Concurrency: two racing batches sharing a novel chunk may BOTH
    * store it (each anti-joins a store that lacks it) — benign,
    * because an address row always carries the identical content
    * (hash = md5(text)); [[reassemble]] dedupes on the address, so
    * correctness never depends on store uniqueness (raced in
    * SoakSpec's chunk-store soak). */
  def append(spark: SparkSession, sink: TableSink, newDocs: DataFrame,
      indexPrefix: String = "cdc", k: Int = 4, modulus: Int = 32,
      batchKey: Option[String] = None): Result = {
    val storeTable = s"${indexPrefix}_store"
    val manifestTable = s"${indexPrefix}_manifest"
    def write(df: DataFrame, table: String): Unit = batchKey match {
      case Some(kk) => sink.appendOnce(df, table, s"$kk:$table"); ()
      case None => sink.append(df, table)
    }
    val chunks = Chunker
      .cdcChunks(newDocs.select("doc_id", "text"), "doc_id", "text",
        k, modulus)
      .cache()
    try {
      val docs = newDocs.count()
      val total = chunks.count()
      val known =
        if (sink.exists(spark, storeTable))
          sink.read(spark, storeTable).select("hash")
        else spark.emptyDataFrame.select(lit("").as("hash")).limit(0)
      // one representative text per novel hash — min (doc, chunk) wins,
      // deterministic under any partitioning
      val fresh = chunks.join(known, Seq("hash"), "left_anti")
        .groupBy("hash")
        .agg(min(struct(col("doc_id"), col("chunk"), col("n_tokens"),
          col("text"))).as("rep"))
        .select(col("hash"), col("rep.n_tokens").as("n_tokens"),
          col("rep.text").as("text"))
        .cache()
      try {
        val newChunks = fresh.count()
        val freshTokens = fresh.agg(coalesce(sum("n_tokens"), lit(0L)))
          .head().getLong(0)
        val allTokens = chunks.agg(coalesce(sum("n_tokens"), lit(0L)))
          .head().getLong(0)
        write(fresh, storeTable)
        write(chunks.select("doc_id", "chunk", "hash"), manifestTable)
        Result(docs, total, newChunks, allTokens - freshTokens)
      } finally { fresh.unpersist(); () }
    } finally { chunks.unpersist(); () }
  }

  /** Reassembled documents: (doc_id, text) — the manifest joined to the
    * store on the chunk address, chunks re-concatenated in order.
    *
    * The store is deduped on the address first: two CONCURRENT
    * [[append]] batches that both see the same novel hash both pass
    * the anti-join and both store it — harmless for storage (the
    * address is md5 of the content, so every duplicate row carries the
    * IDENTICAL text), but a raw join would then duplicate the chunk
    * inside the reassembled document. */
  def reassemble(spark: SparkSession, sink: TableSink,
      indexPrefix: String = "cdc"): DataFrame =
    sink.read(spark, s"${indexPrefix}_manifest")
      .join(sink.read(spark, s"${indexPrefix}_store")
        .groupBy("hash").agg(min("text").as("text")), Seq("hash"))
      .groupBy("doc_id")
      .agg(concat_ws(" ", transform(array_sort(
        collect_list(struct(col("chunk"), col("text")))),
        x => x.getField("text"))).as("text"))

  /** Continuous ingestion: stream document files (JSON lines with
    * doc_id/text) into the chunk store, one file per micro-batch with a
    * CONTENT-derived idempotency key — the DedupIndex.streamDeduped
    * recipe, exactly-once under checkpoint loss and re-batching. */
  def streamChunked(spark: SparkSession, docsDir: String, sink: TableSink,
      checkpoint: String, indexPrefix: String = "cdc",
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
      .queryName("graft-cdc-ingest")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sig = batch.agg(count(lit(1)),
          sum(crc32(concat_ws("", col("doc_id"), col("text"))))).head()
        if (sig.getLong(0) > 0) {
          append(batch.sparkSession, sink, batch, indexPrefix,
            batchKey = Some(s"cdc-${sig.getLong(0)}-${sig.getLong(1)}"))
          ()
        }
      }
      .start()
  }
}
