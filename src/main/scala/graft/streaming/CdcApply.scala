package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.engine.VersionedParquetSink

/** APPLY CHANGES INTO (the Delta Live Tables idiom): consume a graft
  * change feed and continuously replicate it into a keyed target table
  * — the standing CDC pipeline that keeps a serving copy, an index, or
  * a downstream mart in sync with a source table including its deletes.
  *
  * Per micro-batch:
  *   1. the batch's change rows collapse to ONE row per key — ordered
  *      by the caller's `sequenceBy` column descending (DLT's
  *      `SEQUENCE BY`), inserts preferred over deletes on ties;
  *   2. surviving `insert` rows upsert, surviving `delete` rows remove
  *      their key, in ONE serializable commit
  *      ([[VersionedParquetSink.applyChanges]]) keyed by
  *      `(checkpoint, batchId)` — a crash-replayed batch applies
  *      exactly once.
  *
  * Ordering contract: ACROSS batches the change feed is
  * version-ordered (offsets are commit versions); WITHIN a batch only
  * `sequenceBy` orders same-key changes — the same contract DLT
  * documents. Rate limits compose: pass `maxFilesPerTrigger` in
  * `readerOptions` to bound catch-up batches.
  *
  * Scale: the collapse is one keyed window over the BATCH (O(batch),
  * never O(table)); the apply is the sink's merge machinery (anti-join
  * + union rewrite). The target table is created on first non-empty
  * batch if missing. */
object CdcApply {

  def start(spark: SparkSession, sourceTablePath: String,
      targetBase: String, targetTable: String, keyCols: Seq[String],
      sequenceBy: String, checkpoint: String,
      readerOptions: Map[String, String] = Map.empty): StreamingQuery = {
    require(keyCols.nonEmpty, "APPLY CHANGES requires key columns")
    val sink = new VersionedParquetSink(targetBase)
    val changes = readerOptions.foldLeft(
      spark.readStream.format("graft").option("readChangeFeed", "true")) {
        case (r, (k, v)) => r.option(k, v)
      }.load(sourceTablePath)
    changes.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(sink, targetTable, batch, keyCols, sequenceBy,
          s"cdc:$checkpoint#$batchId")
        ()
      }
      .option("checkpointLocation", checkpoint)
      .start()
  }

  /** One batch of tagged change rows into the target — also the unit a
    * custom foreachBatch can call directly. */
  private[graft] def applyBatch(sink: VersionedParquetSink, table: String,
      batch: DataFrame, keyCols: Seq[String], sequenceBy: String,
      commitKey: String): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(desc(sequenceBy), desc("_change_type")) // insert > delete
    val latest = batch
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val ups = latest.filter(col("_change_type") === "insert")
      .drop("_change_type")
    val dels = latest.filter(col("_change_type") === "delete")
      .select(keyCols.map(col): _*)
    if (!sink.exists(spark, table)) {
      // first batch materializes the target (deletes have nothing to hit)
      sink.appendOnce(ups, table, commitKey)
      ()
    } else {
      sink.applyChanges(spark, table, ups, dels, keyCols,
        Some(commitKey))
      ()
    }
  }
}
