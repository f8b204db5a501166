package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.VersionedParquetSink

/** Streaming distribution rebalancing — the incremental form of
  * q_rebalance: every micro-batch is filtered by per-group acceptance
  * rates derived from the CUMULATIVE group counts seen so far, so the
  * accepted corpus converges toward the smallest group's volume even as
  * the stream's mix drifts.
  *
  * State is a tiny per-group counts table persisted ON THE SINK (one row
  * per group, upserted via merge with batch-keyed commits), not in the
  * streaming state store — so it survives checkpoint loss, is readable
  * by any session, and the whole operator is exactly-once under replay
  * (counts merge and corpus append share the batch key).
  *
  * Acceptance itself is the same pure per-row hash test as q_rebalance
  * (hash(id)/2^16 < rate): no window, no per-group sort, no state beyond
  * the |groups|-row broadcast — identical behavior in a backfill and in
  * a stream.
  */
object Rebalance {

  final case class Result(accepted: Long, seen: Long)

  /** File-stream wrapper: JSON lines with (doc_id, text, <groupCol>)
    * rebalanced into `<prefix>corpus` with counts in `<prefix>counts`. */
  def streamRebalanced(spark: SparkSession, docsDir: String,
      sink: VersionedParquetSink, checkpoint: String,
      groupCol: String = "lang",
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
    spark.readStream.schema(schema).json(docsDir)
      .writeStream
      .queryName("graft-rebalance-ingest")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          appendRebalanced(batch.sparkSession, sink, batch, groupCol,
            idCol = "doc_id", batchKey = Some(s"rebalance-$batchId"))
          ()
        }
      }
      .start()
  }

  /** Rebalance one batch against the persisted cumulative counts and
    * append the accepted rows. `batchKey` makes both writes (counts
    * merge + corpus append) exactly-once under replay. */
  def appendRebalanced(spark: SparkSession, sink: VersionedParquetSink,
      rows: DataFrame, groupCol: String, idCol: String,
      batchKey: Option[String] = None,
      corpusTable: String = "balanced", countsTable: String = "group_counts")
      : Result = {
    val batchCounts = rows.groupBy(groupCol)
      .agg(count(lit(1)).cast("long").as("n_seen"))
    val cum =
      if (!sink.exists(spark, countsTable)) batchCounts
      else sink.read(spark, countsTable)
        .unionByName(batchCounts)
        .groupBy(groupCol)
        .agg(sum("n_seen").cast("long").as("n_seen"))

    // same rate formula as q_rebalance: smallest group's cumulative
    // volume over this group's, floor-rounded (rational)
    val rates = cum
      .crossJoin(broadcast(cum.agg(min("n_seen").as("n_min"))))
      .withColumn("rate",
        floor(col("n_min") / col("n_seen") * 10000 + 0.5) / 10000)
      .select(col(groupCol), col("rate"))
    val accepted = rows.join(broadcast(rates), Seq(groupCol))
      .withColumn("hv",
        conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 4),
          16, 10).cast("int"))
      .filter(col("hv") / 65536.0 < col("rate"))
      .drop("rate", "hv")
      .select(rows.columns.map(col): _*)

    val nAccepted = accepted.count()
    val nSeen = rows.count()
    // counts FIRST (idempotent): a crash between the two writes replays
    // into a keyed no-op, then the corpus append proceeds
    val countsKey = batchKey.map(k => s"$k:counts")
    if (!sink.exists(spark, countsTable)) {
      countsKey match {
        case Some(k) => sink.appendOnce(cum, countsTable, k); ()
        case None => sink.append(cum, countsTable)
      }
    } else sink.merge(spark, countsTable, cum, Seq(groupCol),
      commitKey = countsKey)
    batchKey match {
      case Some(k) => sink.appendOnce(accepted, corpusTable, s"$k:corpus")
      case None => sink.append(accepted, corpusTable)
    }
    Result(nAccepted, nSeen)
  }
}
