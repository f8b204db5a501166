package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.engine.VersionedParquetSink

/** `format("graft")`: the versioned sink as a first-class Spark data
  * source.
  *
  * {{{
  *   spark.read.format("graft").load("/data/store/events")      // latest
  *   spark.read.format("graft")
  *     .option("versionAsOf", 7).load("/data/store/events")     // travel
  *   df.write.format("graft").mode("append").save("/data/store/events")
  * }}}
  *
  * `load(path)` addresses `<basePath>/<table>`; with an explicit
  * `option("table", t)` the path is the sink's BASE directory and `t`
  * the table under it. Reads plan
  * through [[graft.engine.GraftRelation]] — commit-log stats pruning in
  * `FileIndex.listFiles`, stock vectorized parquet + codegen below, the
  * logical schema under column mapping. Writes commit through the
  * sink's optimistic log: `append` is an ACID append (schema-checked,
  * CHECK constraints enforced, generated columns computed/validated),
  * `overwrite` is an ACID rewrite commit that replaces content and
  * schema while preserving history (old versions stay travelable; a
  * concurrent reader sees old or new, never a missing table), `ignore`
  * no-ops when the table exists, `errorifexists` throws. Registered via
  * `META-INF/services`, so the short name works with zero imports. */
final class GraftDataSource extends RelationProvider
    with CreatableRelationProvider with StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  private def split(parameters: Map[String, String]): (String, String) = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "format(\"graft\") needs a path: load(\"<basePath>/<table>\")"))
    val p = new org.apache.hadoop.fs.Path(path)
    parameters.get("table") match {
      case Some(t) => (path.stripSuffix("/"), t)
      case None => (Option(p.getParent).map(_.toString).getOrElse(
        throw new IllegalArgumentException(
          s"cannot split '$path' into <basePath>/<table>")), p.getName)
    }
  }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val (base, table) = split(parameters)
    val sink = new VersionedParquetSink(base)
    // CDF reads (Delta's reader-option shape):
    //   spark.read.format("graft").option("readChangeFeed", "true")
    //     .option("startingVersion", 3)[.option("endingVersion", 7)]
    // serves the _change_type row feed from changesBetween —
    // startingVersion INCLUSIVE, endingVersion defaulting to latest,
    // both Delta's semantics. Distributed end-to-end: append-only
    // ranges stream straight from their commit dirs, rewrite-bearing
    // ranges fall back to the snapshot diff.
    if (parameters.get("readChangeFeed").exists(_.toBoolean)) {
      // Delta rejects the combination too: a change feed is a version
      // RANGE, a time-travel pin is a point — silently preferring one
      // would return rows the caller did not ask for.
      require(!parameters.contains("versionAsOf") &&
        !parameters.contains("timestampAsOf"),
        "readChangeFeed cannot be combined with versionAsOf/timestampAsOf" +
          " — use startingVersion/endingVersion to bound the feed")
      val from = parameters.get("startingVersion").map(_.toLong).getOrElse(
        throw new IllegalArgumentException(
          "readChangeFeed needs option(\"startingVersion\", <v>)"))
      val to = parameters.get("endingVersion").map(_.toLong)
        .orElse(sink.latestVersion(spark, table))
        .getOrElse(throw new IllegalArgumentException(
          s"no committed versions in '$table' to read changes from"))
      val df = sink.changesBetween(spark, table, from - 1, to)
      new BaseRelation with org.apache.spark.sql.sources.TableScan {
        override def sqlContext: SQLContext = spark.sqlContext
        override val schema: StructType = df.schema
        override def buildScan(): org.apache.spark.rdd.RDD[
          org.apache.spark.sql.Row] = df.rdd
      }
    } else sink.baseRelation(spark, table,
      version = parameters.get("versionAsOf").map(_.toLong),
      timestamp = parameters.get("timestampAsOf")
        .map(java.time.Instant.parse))
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val (base, table) = split(parameters)
    val sink = new VersionedParquetSink(base)
    val evolve = parameters.get("mergeSchema").exists(_.toBoolean)
    // option("zorderBy", "a,b[,c...]"): cluster the incoming batch on
    // the Morton value of the named columns before the append, so the
    // commit's per-file stats become tight on ALL of them — the
    // write-side half of data skipping (files land pre-clustered;
    // reads prune them for free). The 63-bit interleave budget splits
    // across columns (2 -> 16 bits each, 4 -> 15, ...).
    val df = parameters.get("zorderBy")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq) match {
      case Some(cols) if cols.nonEmpty =>
        // zorderFiles sizes the clustered file count: more files = more
        // z-prefix bits = finer per-column pruning (log2(files) bits
        // split round-robin across the columns)
        graft.engine.ZOrder.zOrderedN(data, cols,
          numFiles = parameters.get("zorderFiles").map(_.toInt)
            .getOrElse(8))
      case Some(_) => throw new IllegalArgumentException(
        "zorderBy wants a comma-separated column list")
      case None => data
    }
    mode match {
      case SaveMode.Append => sink.append(df, table, evolve)
      case SaveMode.Overwrite => sink.overwrite(df, table)
      case SaveMode.ErrorIfExists =>
        if (sink.exists(spark, table)) throw new IllegalStateException(
          s"table '$table' already exists at $base (mode=errorifexists)")
        else sink.append(df, table, evolve)
      case SaveMode.Ignore =>
        if (!sink.exists(spark, table)) sink.append(df, table, evolve)
    }
    sink.baseRelation(spark, table)
  }

  // ---- readStream.format("graft") --------------------------------------

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val spark = sqlContext.sparkSession
    val (base, table) = split(parameters)
    val tableSchema = new VersionedParquetSink(base).read(spark, table).schema
    val s = schema.getOrElse(
      if (parameters.get("readChangeFeed").exists(_.toBoolean))
        tableSchema.add("_change_type",
          org.apache.spark.sql.types.StringType)
      else tableSchema)
    (s"graft[$base/$table]", s)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val (base, table) = split(parameters)
    val pinned = schema.getOrElse(sourceSchema(sqlContext, schema,
      providerName, parameters)._2)
    if (parameters.get("readChangeFeed").exists(_.toBoolean)) {
      // streaming CDF (Delta's readChangeFeed on readStream): each batch
      // is the change feed of its version range — deletes/updates arrive
      // as tagged rows instead of stopping the stream. startingVersion is
      // INCLUSIVE like the batch CDF reader (default 0 = full history).
      require(!parameters.contains("versionAsOf") &&
        !parameters.contains("timestampAsOf"),
        "readChangeFeed cannot be combined with versionAsOf/timestampAsOf")
      new GraftChangeFeedSource(sqlContext, new VersionedParquetSink(base),
        table, pinned,
        startingVersion = parameters.get("startingVersion").map(_.toLong)
          .getOrElse(0L),
        limits = AdmissionLimits(parameters))
    } else new GraftStreamSource(sqlContext, new VersionedParquetSink(base),
      table, pinned,
      startingVersion = parameters.get("startingVersion").map(_.toLong)
        .getOrElse(-1L),
      skipChangeCommits = parameters.get("skipChangeCommits")
        .exists(_.toBoolean),
      limits = AdmissionLimits(parameters))
  }

  // ---- writeStream.format("graft") -------------------------------------

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append() ||
      outputMode == OutputMode.Complete(),
      s"format(\"graft\") streaming sink supports Append or Complete " +
        s"output, got $outputMode")
    require(partitionColumns.isEmpty,
      "format(\"graft\") streaming sink does not partition by columns")
    val (base, table) = split(parameters)
    // batch dedup key: scoped by checkpoint (two queries with different
    // checkpoints never collide), overridable for cross-checkpoint
    // exactly-once. Caveat shared with every batchId-keyed sink
    // (Delta's included): after checkpoint LOSS a replayed batch id can
    // cover different input — content-derived keys (streaming/Rebalance
    // recipe) are the stronger contract when inputs can re-batch.
    val appId = parameters.getOrElse("txnAppId",
      parameters.getOrElse("checkpointLocation", s"graft:$base/$table"))
    new GraftStreamSink(new VersionedParquetSink(base), table, appId,
      mergeSchema = parameters.get("mergeSchema").exists(_.toBoolean),
      replace = outputMode == OutputMode.Complete())
  }
}

/** Streaming admission control (Delta's reader rate limits): how many
  * files/bytes of backlog one micro-batch may admit.
  *
  *   - `maxFilesPerTrigger`  — cap on data files per batch (≥ 1)
  *   - `maxBytesPerTrigger`  — soft cap on data bytes per batch
  *     (byte strings like "64m" accepted)
  *
  * Both are SOFT in Delta's sense: a batch always admits at least one
  * data-bearing commit, even if that single commit exceeds the cap —
  * progress is guaranteed, the cap bounds everything after. Without
  * limits a stream whose checkpoint lags a 100 TB table by a month
  * would try to serve the whole backlog as micro-batch #1; with them
  * catch-up is a bounded sequence of right-sized batches. */
private[graft] final case class AdmissionLimits(maxFiles: Option[Int],
    maxBytes: Option[Long]) {
  require(maxFiles.forall(_ > 0), "maxFilesPerTrigger must be positive")
  require(maxBytes.forall(_ > 0), "maxBytesPerTrigger must be positive")

  def defined: Boolean = maxFiles.isDefined || maxBytes.isDefined

  /** Walk per-commit `(version, files, bytes)` costs ascending from the
    * floor and return the last admissible version. Zero-cost commits
    * (metadata-only, and anything the stream never serves) ride along
    * free; the walk stops as soon as a cap is reached, so the lazy
    * sizes iterator is only forced for admitted commits. */
  def admit(sizes: Iterator[(Long, Int, Long)], latest: Long): Long = {
    var files = 0L; var bytes = 0L
    var end = -1L; var admittedData = false
    while (sizes.hasNext) {
      val (v, nf, nb) = sizes.next()
      if (nf == 0 && nb == 0L) end = v
      else {
        val wouldExceed = maxFiles.exists(m => files + nf > m) ||
          maxBytes.exists(m => bytes + nb > m)
        if (wouldExceed && admittedData) return end
        files += nf; bytes += nb; admittedData = true; end = v
        if (maxFiles.exists(files >= _) || maxBytes.exists(bytes >= _))
          return end
      }
    }
    if (end < 0) latest else math.max(end, latest)
  }
}

private[graft] object AdmissionLimits {
  def apply(parameters: Map[String, String]): AdmissionLimits =
    AdmissionLimits(
      parameters.get("maxFilesPerTrigger").map(_.trim.toInt),
      parameters.get("maxBytesPerTrigger").map(
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes))
}

/** Structured Streaming source over the versioned sink: offsets ARE
  * commit versions, batches are served straight from append dirs
  * ([[VersionedParquetSink.streamSince]] — O(new data), compactions
  * transparent, data-changing commits stop the stream unless
  * `skipChangeCommits`). The schema is pinned at stream start; a
  * mid-stream rename/drop fails the projection loudly — restart the
  * query to adopt the new schema (Delta's contract). With
  * [[AdmissionLimits]] set, each trigger admits at most
  * maxFiles/maxBytes of backlog instead of jumping to latest
  * (`latestOffset(start, limit)` — the KafkaSource V1 admission-control
  * shape, so the engine hands us the floor and restarts stay capped for
  * free); under Trigger.AvailableNow the drain goal pins at query start
  * and the backlog drains as a sequence of capped batches. */
private final class GraftStreamSource(sqlContext: SQLContext,
    sink: VersionedParquetSink, table: String, pinned: StructType,
    startingVersion: Long, skipChangeCommits: Boolean,
    limits: AdmissionLimits) extends Source
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {

  private val spark = sqlContext.sparkSession

  private var availableEnd: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableEnd = sink.latestVersion(spark, table)

  override def getDefaultReadLimit:
      org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit):
      org.apache.spark.sql.connector.read.streaming.Offset =
    sink.latestVersion(spark, table)
      .map(l => availableEnd.fold(l)(math.min(l, _)))
      .filter(_ > startingVersion).map { l =>
        val floor = Option(start)
          .map(o => ver(o.asInstanceOf[V1Offset]))
          .getOrElse(startingVersion)
        if (!limits.defined || l <= floor) LongOffset(l)
        else LongOffset(limits.admit(
          sink.admissionSizes(spark, table, floor)
            .takeWhile(_._1 <= l), l))
      }.orNull

  override def schema: StructType = pinned

  private def ver(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.toLong
  }

  override def getOffset: Option[V1Offset] =
    throw new IllegalStateException(
      "latestOffset(Offset, ReadLimit) should be called instead of this")

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val fromV = start.map(ver).getOrElse(startingVersion)
    val relation = sink.streamBatchRelation(spark, table, fromV, ver(end),
      skipChangeCommits)
    // the planner requires a STREAMING leaf for a microbatch plan — the
    // same LogicalRelation(isStreaming = true) wrap FileStreamSource uses
    val df = org.apache.spark.sql.graft.SqlBridge.streamingFrame(
      spark, relation)
    try df.select(pinned.fieldNames.map(org.apache.spark.sql.functions.col)
      .toIndexedSeq: _*)
    catch { case e: org.apache.spark.sql.AnalysisException =>
      throw new IllegalStateException(
        s"schema of '$table' changed under a running stream " +
          s"(pinned: ${pinned.simpleString}); restart the query to adopt " +
          "the new schema", e)
    }
  }

  override def commit(end: V1Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Streaming change-data-feed source (Delta's `readChangeFeed` on
  * `readStream`): offsets are commit versions like the plain source,
  * but each batch serves [[VersionedParquetSink.changesBetween]] over
  * its version range — appends arrive as `insert` rows straight from
  * their commit dirs (O(new data)), and data-changing commits
  * (delete/merge/update/restore) arrive as tagged `delete`/`insert`
  * rows instead of stopping the stream, which is the whole point of a
  * CDC consumer. Ranges across a schema evolution project to the
  * pinned (stream-start) schema. */
private final class GraftChangeFeedSource(sqlContext: SQLContext,
    sink: VersionedParquetSink, table: String, pinned: StructType,
    startingVersion: Long, limits: AdmissionLimits) extends Source
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {

  private val spark = sqlContext.sparkSession

  // see GraftStreamSource: pin the drain goal so AvailableNow + rate
  // limits serve the WHOLE backlog in capped batches, then stop
  private var availableEnd: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableEnd = sink.latestVersion(spark, table)

  override def getDefaultReadLimit:
      org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit):
      org.apache.spark.sql.connector.read.streaming.Offset =
    sink.latestVersion(spark, table)
      .map(l => availableEnd.fold(l)(math.min(l, _)))
      .filter(_ >= startingVersion).map { l =>
        val floor = Option(start)
          .map(o => ver(o.asInstanceOf[V1Offset]))
          .getOrElse(startingVersion - 1)
        if (!limits.defined || l <= floor) LongOffset(l)
        else LongOffset(limits.admit(
          sink.admissionSizes(spark, table, floor, cdf = true)
            .takeWhile(_._1 <= l), l))
      }.orNull

  override def schema: StructType = pinned

  private def ver(o: V1Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json.toLong
  }

  override def getOffset: Option[V1Offset] =
    throw new IllegalStateException(
      "latestOffset(Offset, ReadLimit) should be called instead of this")

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val fromV = start.map(ver).getOrElse(startingVersion - 1)
    val df = sink.changesBetween(spark, table, fromV, ver(end))
    val have = df.columns.toSet
    val aligned = df.select(pinned.fields.toSeq.map { f =>
      if (have.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    // the diff is a derived plan, not a relation — rebind its rows as a
    // streaming frame for the micro-batch planner
    org.apache.spark.sql.graft.SqlBridge.streamingRebind(aligned)
  }

  override def commit(end: V1Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Structured Streaming sink into the versioned table: every micro-batch
  * is ONE ACID keyed append ([[VersionedParquetSink.appendOnce]] on
  * `(appId, batchId)`), so a crash-replayed batch commits exactly once —
  * the same txn-version idempotence Delta's streaming sink uses. All
  * write governance applies per batch (schema check, CHECK constraints,
  * generated columns). Complete output mode (`replace`) turns each
  * batch into a keyed logged REWRITE instead: the epoch's rows
  * atomically replace the table (streaming aggregations into a table),
  * still exactly-once on replay. */
private final class GraftStreamSink(sink: VersionedParquetSink,
    table: String, appId: String, mergeSchema: Boolean,
    replace: Boolean = false) extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // `data` is bound to the streaming plan and cannot be written
    // directly; rebind its rows as a batch frame (ForeachBatchSink's
    // recipe, via the SqlBridge seam)
    val batch = org.apache.spark.sql.graft.SqlBridge.rebindBatch(data)
    if (replace) sink.overwrite(batch, table, Some(s"$appId#$batchId"))
    else { sink.appendOnce(batch, table, s"$appId#$batchId", mergeSchema); () }
  }
  override def toString: String = s"GraftSink[$table]"
}
