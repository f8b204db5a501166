package graft.engine

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Expression}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.BaseRelation
import org.apache.spark.sql.types.StructType

import graft.engine.VersionedParquetSink.{ColumnMapping, Commit}

/** The `spark.read.format("graft")` integration, assembled the way
  * Delta integrates its own log with Spark's scan planning: a custom
  * [[FileIndex]] whose `listFiles` applies the commit-log's per-file
  * min/max stats to the PLANNER'S OWN data filters, wrapped in a
  * [[HadoopFsRelation]] over [[ParquetFileFormat]]. Everything
  * downstream is stock Spark: vectorized parquet reading, whole-stage
  * codegen, column pruning via `requiredSchema`, parquet row-group
  * pushdown (`PushedFilters` in explain) — the engine only decides
  * WHICH FILES the scan may open, which is exactly the part the commit
  * log knows and Spark cannot.
  *
  * Column mapping composes: the relation exposes the LOGICAL schema,
  * and [[GraftParquetFileFormat]] translates the reader's schemas and
  * pushed filters to PHYSICAL names at the parquet boundary (Delta's
  * own trick — `InternalRow` is positional, so only the file-side
  * lookup needs names).
  */
object GraftRelation {

  /** Masks beyond this total size abort planning (compact first): the
    * per-file positions ride the serialized scan function to executors,
    * and a mask this large means a materializing rewrite is overdue
    * anyway. Delta's own DV descriptors ride the scan the same way. */
  private[engine] val MaxPlannedMaskBytes: Long = 64L * 1024 * 1024

  /** Build the relation for `table` as of `version` (Long.MaxValue =
    * latest). Live deletion vectors / merge-on-read updates COMPOSE:
    * their (path, row-position) masks are loaded at plan time (bounded
    * by [[MaxPlannedMaskBytes]]) and applied inside the parquet reader
    * per file (see [[GraftParquetFileFormat]]) — stats-based file
    * skipping, column pruning and the full-predicate re-check above the
    * scan all still engage; only pushed-down parquet filters and
    * columnar batches are disabled, and only while a mask is live
    * (row positions must be counted in file order, so masked files
    * read every row group). */
  def apply(spark: SparkSession, tableDir: String, entries: Seq[Commit],
      table: String): BaseRelation = {
    require(entries.nonEmpty, s"no committed versions for $table")
    val live = VersionedParquetSink.liveEntries(entries)
    val dvs = live.filter(VersionedParquetSink.isMergeOnRead)
    val masks: Map[String, Array[Long]] =
      if (dvs.isEmpty) Map.empty
      else {
        val fs = new Path(tableDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val dirs = dvs.map(e =>
          s"$tableDir/${VersionedParquetSink.maskDir(e)}")
        val bytes = dirs.map { d =>
          val p = new Path(d)
          if (fs.exists(p)) fs.listStatus(p).filter(_.isFile).map(_.getLen).sum
          else 0L
        }.sum
        require(bytes <= MaxPlannedMaskBytes,
          s"table '$table' carries $bytes bytes of live deletion-vector " +
            s"masks (planning bound $MaxPlannedMaskBytes); compact() to " +
            "materialize them, or read via the sink API")
        spark.read.schema("path STRING, pos BIGINT").parquet(dirs: _*)
          .groupBy("path")
          .agg(org.apache.spark.sql.functions.collect_list("pos").as("ps"))
          .collect()
          .map(r => r.getString(0) ->
            r.getSeq[Long](1).toArray.sorted)
          .toMap
      }
    forDirs(spark, tableDir, entries,
      live.filterNot(VersionedParquetSink.isDv), table, masks)
  }

  /** Relation over an explicit scan set (schema/mapping still from the
    * full `entries` snapshot) — the streaming source's per-batch form,
    * scoped to one version range's append dirs. */
  def forDirs(spark: SparkSession, tableDir: String, entries: Seq[Commit],
      scan: Seq[Commit], table: String,
      masks: Map[String, Array[Long]] = Map.empty): BaseRelation = {
    require(entries.nonEmpty, s"no committed versions for $table")
    val logical = entries.lastOption.flatMap(_.schemaDdl) match {
      case Some(ddl) => StructType(
        StructType.fromDDL(ddl).fields.map(_.copy(nullable = true)))
      case None => throw new IllegalStateException(
        s"table '$table' predates schema-bearing markers")
    }
    val mapping = ColumnMapping.parse(entries.lastOption.flatMap(_.mapping))
    HadoopFsRelation(
      location = new GraftFileIndex(spark, tableDir, scan, logical, mapping),
      partitionSchema = StructType(Nil),
      dataSchema = logical,
      bucketSpec = None,
      fileFormat = new GraftParquetFileFormat(
        mapping.map { case (l, e) => l -> e.physical }.toMap, masks),
      options = Map.empty)(spark)
  }
}

/** Commit-log-backed file listing with stats-based skipping: the
  * planner hands `listFiles` its data filters (already-resolved
  * catalyst expressions over the logical schema); files whose min/max
  * ranges cannot satisfy them are never opened. The snapshot is pinned
  * at construction — a DataFrame keeps reading the versions it was
  * planned against, like Delta's snapshot isolation. */
final class GraftFileIndex(spark: SparkSession, tableDir: String,
    dataEntries: Seq[Commit], logical: StructType,
    mapping: Seq[(String, ColumnMapping.Entry)]) extends FileIndex {

  private val mappingMap: Map[String, String] =
    mapping.map { case (l, e) => l -> e.physical }.toMap
  private val physSchema = ColumnMapping.physicalSchema(logical, mapping)
  private def fs = new Path(tableDir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def listDir(e: Commit): Seq[FileStatus] = {
    val p = new Path(s"$tableDir/${e.dir}")
    if (!fs.exists(p)) Seq.empty // metadata-only commits have no files
    else fs.listStatus(p).toSeq.filter(st =>
      st.isFile && st.getPath.getName.endsWith(".parquet"))
  }

  override def rootPaths: Seq[Path] = Seq(new Path(tableDir))
  override def partitionSchema: StructType = StructType(Nil)
  override def refresh(): Unit = () // snapshot semantics: never refreshes

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // stats key on physical names; the planner's filters use logical
    val physPred = dataFilters.reduceOption(And).map(_.transform {
      case a: AttributeReference if mappingMap.contains(a.name) =>
        a.withName(mappingMap(a.name))
    })
    val kept = dataEntries.flatMap { e =>
      val files = listDir(e)
      (e.stats, physPred) match {
        case (Some(json), Some(p)) =>
          val perFile = FileStats.parse(json)
          files.filter(f => perFile.get(f.getPath.getName)
            .forall(pf => FileStats.mayMatch(p, physSchema, pf)))
        case _ => files
      }
    }
    Seq(PartitionDirectory(InternalRow.empty, kept.toArray))
  }

  override def inputFiles: Array[String] =
    dataEntries.flatMap(listDir).map(_.getPath.toString).toArray

  override def sizeInBytes: Long = dataEntries.flatMap(listDir)
    .map(_.getLen).sum
}

/** [[ParquetFileFormat]] that reads files written under column mapping:
  * the relation's schemas use LOGICAL names, the files use PHYSICAL —
  * this translates `dataSchema`/`requiredSchema` and the pushed
  * filters at the reader boundary and lets stock parquet machinery
  * (vectorized reader, row-group pushdown) do everything else. With an
  * empty mapping it is byte-identical to its parent.
  *
  * `maskedFiles` carries any live deletion-vector masks as
  * table-relative path -> sorted masked row positions (the Delta DV
  * shape: positions within the immutable file, in row order). While
  * nonempty, files become non-splittable and parquet filter pushdown
  * is withheld for MASKED files only — a pushed filter would skip row
  * groups and break position counting; the scan's own Filter node
  * still applies the full predicate above — and columnar batch output
  * is disabled scan-wide (position filtering is per row). Unmasked
  * files in the same scan keep their pushed filters. */
final class GraftParquetFileFormat(mappingMap: Map[String, String],
    maskedFiles: Map[String, Array[Long]] = Map.empty)
    extends ParquetFileFormat {

  private def phys(n: String): String = mappingMap.getOrElse(n, n)
  private def trans(s: StructType): StructType =
    if (mappingMap.isEmpty) s
    else StructType(s.fields.map(f => f.copy(name = phys(f.name))))

  /** sources.Filter attribute names logical -> physical; a shape we
    * don't model is DROPPED (filters here are a row-group-pruning
    * optimization — the scan re-applies the full predicate above). */
  private def transFilter(f: sources.Filter): Option[sources.Filter] =
    if (mappingMap.isEmpty) Some(f)
    else f match {
      case sources.EqualTo(a, v) => Some(sources.EqualTo(phys(a), v))
      case sources.EqualNullSafe(a, v) =>
        Some(sources.EqualNullSafe(phys(a), v))
      case sources.GreaterThan(a, v) =>
        Some(sources.GreaterThan(phys(a), v))
      case sources.GreaterThanOrEqual(a, v) =>
        Some(sources.GreaterThanOrEqual(phys(a), v))
      case sources.LessThan(a, v) => Some(sources.LessThan(phys(a), v))
      case sources.LessThanOrEqual(a, v) =>
        Some(sources.LessThanOrEqual(phys(a), v))
      case sources.In(a, vs) => Some(sources.In(phys(a), vs))
      case sources.IsNull(a) => Some(sources.IsNull(phys(a)))
      case sources.IsNotNull(a) => Some(sources.IsNotNull(phys(a)))
      case sources.StringStartsWith(a, v) =>
        Some(sources.StringStartsWith(phys(a), v))
      case sources.StringEndsWith(a, v) =>
        Some(sources.StringEndsWith(phys(a), v))
      case sources.StringContains(a, v) =>
        Some(sources.StringContains(phys(a), v))
      case sources.And(l, r) => for {
        lt <- transFilter(l); rt <- transFilter(r)
      } yield sources.And(lt, rt)
      case sources.Or(l, r) => for {
        lt <- transFilter(l); rt <- transFilter(r)
      } yield sources.Or(lt, rt)
      case sources.Not(c) => transFilter(c).map(sources.Not)
      case _ => None
    }

  /** A direct file write through the relation (INSERT INTO the catalog
    * table) would drop parquet into the table dir OUTSIDE the commit
    * log — files no reader would ever see. Fail loudly instead. */
  override def prepareWrite(sparkSession: SparkSession,
      job: org.apache.hadoop.mapreduce.Job,
      options: Map[String, String], dataSchema: StructType):
      org.apache.spark.sql.execution.datasources.OutputWriterFactory =
    throw new UnsupportedOperationException(
      "INSERT INTO a graft table would bypass its commit log; write with " +
        "df.write.format(\"graft\").mode(\"append\").save(<path>) instead")

  /** Masked files must map 1:1 to read tasks so row positions can be
    * counted from zero in file order. */
  override def isSplitable(sparkSession: SparkSession,
      options: Map[String, String], path: Path): Boolean =
    maskedFiles.isEmpty && super.isSplitable(sparkSession, options, path)

  /** Columnar batches bypass per-row iteration; while a mask is live
    * the scan returns rows (the vectorized reader still runs
    * underneath — only the batch hand-off is disabled). */
  override def supportBatch(sparkSession: SparkSession,
      schema: StructType): Boolean =
    maskedFiles.isEmpty && super.supportBatch(sparkSession, schema)

  override def buildReaderWithPartitionValues(
      sparkSession: SparkSession, dataSchema: StructType,
      partitionSchema: StructType, requiredSchema: StructType,
      filters: Seq[sources.Filter], options: Map[String, String],
      hadoopConf: org.apache.hadoop.conf.Configuration):
      org.apache.spark.sql.execution.datasources.PartitionedFile =>
        Iterator[InternalRow] = {
    val withFilters = super.buildReaderWithPartitionValues(sparkSession,
      trans(dataSchema), partitionSchema, trans(requiredSchema),
      filters.flatMap(transFilter(_)), options, hadoopConf)
    if (maskedFiles.isEmpty) withFilters
    else {
      // masked files read with NO pushed filters: predicate pushdown
      // skips row groups, which would desynchronize position counting
      val noFilters = super.buildReaderWithPartitionValues(sparkSession,
        trans(dataSchema), partitionSchema, trans(requiredSchema),
        Nil, options, hadoopConf)
      val masks = maskedFiles
      file => {
        // mask paths are `<commitDir>/<file>.parquet`, relative to the
        // table dir — recover that suffix from the task's file path
        val rel = file.urlEncodedPath.split('/').takeRight(2).mkString("/")
        masks.get(rel) match {
          case None => withFilters(file)
          case Some(positions) =>
            assert(file.start == 0,
              s"masked graft file $rel arrived as a split; " +
                "isSplitable must return false while masks are live")
            val dead = new java.util.HashSet[java.lang.Long](
              math.max(16, positions.length * 2))
            positions.foreach(p => dead.add(p))
            var idx = -1L
            noFilters(file).filter { _ => idx += 1; !dead.contains(idx) }
        }
      }
    }
  }

  override def toString: String = "GraftParquet"
}
