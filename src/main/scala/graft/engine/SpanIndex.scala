package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental duplicate-SPAN removal — the continuous-ingestion form of
  * q_span_clean (Lee et al. exact-substring dedup), completing the
  * [[DedupIndex]] family at sub-document granularity: every
  * `spanWidth`-token span of an incoming batch is checked against the
  * PERSISTED span index (every span ever ingested) and against the
  * batch itself; tokens covered by a span that also occurs in another
  * document are masked, the cleaned documents append to `docsTable`,
  * and the batch's ORIGINAL spans append to the index — so future
  * copies of boilerplate are caught even though this batch's copy was
  * just masked out.
  *
  * Contract asymmetry vs the batch q_span_clean (deliberate, the
  * Lee et al. shape): history is immutable — a span shared with an
  * ALREADY-INGESTED document masks only the NEW occurrence; a span
  * shared between two documents of the SAME batch masks both (matching
  * the batch operator). A re-ingested doc_id does not self-mask.
  *
  * Exactly-once: both table appends go through the sink's keyed commits
  * under one caller key (the [[DedupIndex]] recipe — content-derived
  * keys + one-file-per-trigger in [[streamCleaned]]), so a crash
  * between the two appends heals on replay and replays no-op.
  *
  * Scale shape: the index probe joins on the span string, the mask join
  * on (doc, position) — both content-derived, unbounded-cardinality
  * keys; nothing collects. The index grows with corpus positions: at
  * 100 TB, compact it periodically ([[VersionedParquetSink.compact]])
  * and lean on the sink's data skipping; spans are near-unique unless
  * genuinely duplicated, so the probe join stays selective.
  */
object SpanIndex {

  final case class Result(appendedDocs: Long, tokensMasked: Long)

  /** Clean one batch of (doc_id, text) against the index and itself,
    * append cleaned docs + new spans. Returns (docs appended, tokens
    * masked); a replayed `batchKey` is a no-op returning zeros. */
  def appendCleaned(spark: SparkSession, sink: TableSink,
      newDocs: DataFrame, docsTable: String = "clean_corpus",
      spanTable: String = "span_index", batchKey: Option[String] = None,
      spanWidth: Int = 8): Result = {
    require(spanWidth >= 2, s"spanWidth must be >= 2, got $spanWidth")
    def write(df: DataFrame, table: String): Boolean = batchKey match {
      case Some(k) => sink.appendOnce(df, table, s"$k:$table")
      case None => sink.append(df, table); true
    }
    val toks = newDocs.select(col("doc_id").cast("long").as("doc_id"),
      split(col("text"), " ").as("ws")).cache()
    try {
      val spans = toks
        .select(col("doc_id"), col("ws"),
          explode(expr(s"CASE WHEN size(ws) >= $spanWidth " +
            s"THEN sequence(0, size(ws) - $spanWidth) ELSE array() END"))
            .as("i"))
        .select(col("doc_id"), col("i"),
          expr(s"array_join(slice(ws, i + 1, $spanWidth), ' ')").as("sp"))
      val hist: DataFrame =
        if (sink.exists(spark, spanTable)) sink.read(spark, spanTable)
        else spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType.fromDDL(
            "sp STRING, doc_id BIGINT"))
      // shared = 2+ docs within the batch, or in the index under a
      // DIFFERENT document (same doc_id = re-ingestion, not a dup)
      val batchShared = spans.groupBy("sp")
        .agg(countDistinct("doc_id").as("nd"))
        .filter(col("nd") >= 2).select("sp")
      val histShared = spans
        .join(hist.withColumnRenamed("doc_id", "first_doc"), Seq("sp"))
        .filter(col("doc_id") =!= col("first_doc"))
        .select("sp").distinct()
      val shared = batchShared.union(histShared).distinct()
      val bad = spans.join(shared, "sp")
        .select(col("doc_id"),
          explode(expr(s"sequence(i, i + ${spanWidth - 1})")).as("j"))
        .distinct()
      val tokPos = toks.select(col("doc_id"),
        posexplode(col("ws")).as(Seq("j", "w")))
      // only SURVIVING tokens enter the aggregation buffer (collect_list
      // skips the CASE's NULLs) — bounded by the longest single doc's
      // kept tokens, never the corpus (the q_span_clean shape)
      val cleaned = tokPos
        .join(bad.withColumn("b", lit(1)), Seq("doc_id", "j"), "left")
        .groupBy("doc_id")
        .agg(
          expr("array_join(transform(array_sort(" +
            "collect_list(CASE WHEN b IS NULL THEN struct(j, w) END)), " +
            "x -> x.w), ' ')").as("text"),
          count(lit(1)).cast("long").as("n_tokens"),
          sum(when(col("b").isNull, 1L).otherwise(0L))
            .cast("long").as("n_kept"))
        .cache()
      try {
        val stats = cleaned.agg(
          coalesce(count(lit(1)), lit(0L)),
          coalesce(sum(col("n_tokens") - col("n_kept")), lit(0L))).head()
        // ORIGINAL spans index (first-in-batch doc attribution): future
        // copies of masked boilerplate must still be detectable
        val newSpans = spans.groupBy("sp").agg(min("doc_id").as("doc_id"))
        val docsLanded =
          write(cleaned.select("doc_id", "text", "n_tokens", "n_kept"),
            docsTable)
        // ALWAYS attempt the span append, even when the docs table
        // reports a keyed replay: a crash between the two table writes
        // must heal on replay (each table's keyed append fills in
        // independently — the DedupIndex.appendDeduped shape). Skipping
        // it would leave the batch's spans permanently missing from the
        // index, so future copies of that boilerplate go undetected.
        write(newSpans, spanTable)
        if (!docsLanded) Result(0L, 0L) // full replay: nothing changed
        else Result(stats.getLong(0), stats.getLong(1))
      } finally { cleaned.unpersist(); () }
    } finally { toks.unpersist(); () }
  }

  /** Continuous form: JSON-lines (doc_id, text) files cleaned per
    * micro-batch — content-derived keys + one file per trigger (the
    * chaos-tested DedupIndex/Rebalance recipe), so checkpoint loss,
    * mid-batch crashes and replays all converge to exactly-once. */
  def streamCleaned(spark: SparkSession, docsDir: String, sink: TableSink,
      checkpoint: String,
      docsTable: String = "clean_corpus", spanTable: String = "span_index",
      spanWidth: Int = 8,
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
      .queryName("graft-span-clean-ingest")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sig = batch.agg(count(lit(1)),
          sum(crc32(concat_ws("", col("doc_id"), col("text"))))).head()
        if (sig.getLong(0) > 0) {
          appendCleaned(batch.sparkSession, sink, batch,
            docsTable, spanTable,
            batchKey = Some(s"spanclean-${sig.getLong(0)}-${sig.getLong(1)}"),
            spanWidth = spanWidth)
          ()
        }
      }
      .start()
  }
}
