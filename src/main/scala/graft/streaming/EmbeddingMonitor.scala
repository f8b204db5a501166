package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.VersionedParquetSink
import graft.queries.Helpers

/** Streaming embedding-drift monitor — the incremental form of the
  * q_centroid_sim batch audit, and the first embedding-domain member
  * of the streaming-monitor family (CorpusMonitor watches text mix,
  * this watches SEMANTIC position): every ingested micro-batch
  * appends one row per source to a persisted stats log carrying the
  * batch's vector count, its quantized centroid-sum vector, and the
  * cosine between the batch centroid and the PRIOR cumulative
  * centroid — so "source X's embeddings drifted" is a plain filter
  * over the log, and the cumulative cross-source similarity matrix
  * (the q_centroid_sim readout) is derivable from the log alone,
  * never by re-scanning the corpus.
  *
  * Determinism (the q_centroid_sim contract): a centroid is a
  * cross-row float mean, so each dimension is quantized to exact
  * integer micro-units (floor(v*1e6+0.5)) and summed as LONGs —
  * exact, order-independent, and ASSOCIATIVE, which is what makes
  * the cumulative state replay-safe: the prior centroid-sum derived
  * from the log is bit-identical no matter how batches were sliced.
  * Counts cancel in every cosine, so centroids are never
  * materialized as floats; dots run left-to-right over
  * integer-valued doubles (exact below 2^53 per term).
  *
  * Replay contract (CorpusMonitor's, reused): the log is an
  * append-only versioned table, writes are keyed by an
  * order-independent content fingerprint of the batch, and prior
  * cumulative sums are derived from the log EXCLUDING this batch's
  * key — a crash-replayed batch recomputes byte-identical rows and
  * the keyed append no-ops. There is no streaming-state dependence:
  * the log IS the state, readable by any session.
  *
  * Scale: per batch this is one posexplode into (source, dim)
  * partial sums — map-side combinable to |sources| x dims rows — and
  * one tiny aggregate over the stats log (|sources| x batches rows,
  * compacted periodically). Nothing is O(corpus).
  */
object EmbeddingMonitor {

  /** Dot product of two integer-valued double arrays, left-to-right —
    * built-ins only (zip_with + aggregate), codegen-friendly, and the
    * same fixed evaluation order on every engine and topology. */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def cosine(a: Column, b: Column): Column = {
    val denom = sqrt(dot(a, a)) * sqrt(dot(b, b))
    when(a.isNull || b.isNull || denom === 0.0, lit(null).cast("double"))
      .otherwise(Helpers.r4(dot(a, b) / denom))
  }

  /** Per-source quantized centroid-sum rows for one batch of
    * (source, embedding) vectors: (source, n_vecs, sums) where sums is
    * the element-wise LONG sum of the micro-unit-quantized vectors. */
  private def batchSums(batch: DataFrame): DataFrame = {
    val counts = batch.groupBy("source").agg(count(lit(1)).as("n_vecs"))
    val sums = batch
      .select(col("source"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("dim0", "v")))
      .withColumn("qv", floor(col("v") * 1000000 + lit(0.5)).cast("long"))
      .groupBy("source", "dim0").agg(sum("qv").as("sv"))
      .groupBy("source")
      .agg(transform(
        array_sort(collect_list(struct(col("dim0"), col("sv")))),
        x => x.getField("sv")).as("sums"))
    counts.join(sums, "source")
  }

  /** One batch's per-source stats rows WITHOUT appending them — the
    * composable form (CorpusMonitor.statsRows precedent). None for an
    * empty batch. The prior-sum read excludes `batchKey`, so a
    * crash-replayed batch recomputes byte-identical rows. */
  def statsRows(spark: SparkSession, sink: VersionedParquetSink,
      batch: DataFrame, batchKey: String,
      statsTable: String = "embedding_stats"): Option[DataFrame] = {
    val cur = batchSums(batch)
    if (cur.isEmpty) return None

    val prior: DataFrame =
      if (!sink.exists(spark, statsTable))
        spark.createDataFrame(
          new java.util.ArrayList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("source",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("prior_sums",
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.LongType)))))
      else sink.read(spark, statsTable)
        .filter(!(col("batch_key") <=> lit(batchKey)))
        .select(col("source"), posexplode(col("sums")).as(Seq("dim0", "sv")))
        .groupBy("source", "dim0").agg(sum("sv").as("sv"))
        .groupBy("source")
        .agg(transform(
          array_sort(collect_list(struct(col("dim0"), col("sv")))),
          x => x.getField("sv")).as("prior_sums"))

    val rows = cur.join(prior, Seq("source"), "left")
      .withColumn("drift_cos", cosine(
        col("sums").cast("array<double>"),
        col("prior_sums").cast("array<double>")))
      .withColumn("batch_key", lit(batchKey))
      .select("batch_key", "source", "n_vecs", "sums", "drift_cos")
    Some(rows)
  }

  /** Compute and append one batch's per-source stats rows. Returns the
    * appended frame's row count (0 for an empty batch; a replayed key
    * still returns the recomputed count — the append itself no-ops). */
  def appendStats(spark: SparkSession, sink: VersionedParquetSink,
      batch: DataFrame, batchKey: String,
      statsTable: String = "embedding_stats"): Long =
    statsRows(spark, sink, batch, batchKey, statsTable) match {
      case None => 0L
      case Some(rows) =>
        val n = rows.count()
        sink.appendOnce(rows, statsTable, batchKey)
        n
    }

  /** The monitor as a streaming sink: ride any streaming frame of
    * (vec_id, source, embedding) rows and append per-batch stats rows
    * exactly-once (content-derived keys; pair with maxFilesPerTrigger=1
    * on file sources — the Rebalance determinism contract). */
  def monitorStream(vecs: DataFrame, sink: VersionedParquetSink,
      checkpoint: String, statsTable: String = "embedding_stats",
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .queryName("graft-embedding-monitor")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // order-independent batch fingerprint over the identity
        // columns (vec_id unique per vector); doubles as the
        // emptiness check
        val sig = batch.agg(count(lit(1)),
          sum(crc32(concat_ws("\u0001",
            col("vec_id"), col("source"))))).head()
        if (sig.getLong(0) > 0) {
          appendStats(batch.sparkSession, sink, batch,
            s"embmon-${sig.getLong(0)}-${sig.getLong(1)}", statsTable)
          if (batchId % 64 == 63)
            sink.compact(batch.sparkSession, statsTable,
              targetFiles = Some(1),
              commitKey = Some(s"embmon-compact-$batchId"))
          ()
        }
      }
      .start()

  /** Drift alerts: stats rows whose batch centroid moved away from the
    * prior cumulative centroid (cosine below `threshold`; the first
    * batch of a source has no prior and never alerts). A plain
    * filter — the drift math was paid at append time. */
  def alerts(spark: SparkSession, sink: VersionedParquetSink,
      statsTable: String = "embedding_stats",
      threshold: Double = 0.8): DataFrame =
    sink.read(spark, statsTable)
      .filter(col("drift_cos").isNotNull && col("drift_cos") < threshold)

  /** Cumulative per-source state from the log alone: vector count and
    * centroid-sum vector (exact LONG sums — associative, so identical
    * however ingestion was batched). */
  def totals(spark: SparkSession, sink: VersionedParquetSink,
      statsTable: String = "embedding_stats"): DataFrame = {
    val n = sink.read(spark, statsTable)
      .groupBy("source").agg(sum("n_vecs").cast("long").as("n_vecs"))
    val sums = sink.read(spark, statsTable)
      .select(col("source"), posexplode(col("sums")).as(Seq("dim0", "sv")))
      .groupBy("source", "dim0").agg(sum("sv").as("sv"))
      .groupBy("source")
      .agg(transform(
        array_sort(collect_list(struct(col("dim0"), col("sv")))),
        x => x.getField("sv")).as("sums"))
    n.join(sums, "source")
  }

  /** The cumulative cross-source similarity matrix — q_centroid_sim's
    * readout derived from streaming state instead of a corpus scan:
    * cosine between every pair of cumulative centroid-sum vectors
    * (counts cancel). |sources|² rows over a |sources|-row input. */
  def similarityMatrix(spark: SparkSession, sink: VersionedParquetSink,
      statsTable: String = "embedding_stats"): DataFrame = {
    val t = totals(spark, sink, statsTable)
    t.as("a").join(t.as("b"), col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"),
        cosine(col("a.sums").cast("array<double>"),
          col("b.sums").cast("array<double>")).as("cos_sim"))
      .orderBy("src_a", "src_b")
  }
}
