package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, IntegerType, LongType, MapType, ShortType, StructField, StructType}

/** Append-time schema enforcement, mirroring Delta's append-mode check
  * (the reference's write_deltalake(..., mode='append') rejects drifting
  * schemas, collector.py:219-226). Names and types must match exactly and
  * in order; nullability is ignored — appending stricter data is always
  * safe. Without this check a drifted append silently produces a
  * union-schema mess at read time. */
object SchemaCheck {
  /** Lossless type promotions (Delta type-widening set that Spark's
    * parquet readers upcast natively): the integral chain and
    * float->double. Transitive by construction. */
  private[engine] def widens(from: DataType, to: DataType): Boolean =
    (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType) => true
      case (FloatType, DoubleType) => true
      case _ => false
    }

  /** Nullability-normalized copy (recursively nullable everywhere). */
  private def norm(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      StructField(f.name, norm(f.dataType), nullable = true)))
    case a: ArrayType => ArrayType(norm(a.elementType), containsNull = true)
    case m: MapType => MapType(norm(m.keyType), norm(m.valueType),
      valueContainsNull = true)
    case other => other
  }

  def enforceAppend(table: String, existing: Option[StructType],
      incoming: StructType, allowEvolution: Boolean = false): Unit =
    existing.foreach { cur =>
      if (allowEvolution) {
        // mergeSchema parity: new columns may be ADDED, and an existing
        // column may WIDEN (Delta type widening: byte->short->int->long,
        // float->double — lossless promotions Spark's parquet reader
        // upcasts natively, so pre-widening files stay readable under
        // the new schema); any other retype or a drop is never an
        // evolution, it is a different table
        val in = incoming.fields.map(f => f.name -> norm(f.dataType)).toMap
        val broken = cur.fields.filterNot(f =>
          in.get(f.name).exists(t =>
            t == norm(f.dataType) || widens(norm(f.dataType), t)))
        if (broken.nonEmpty)
          throw new IllegalArgumentException(
            s"schema evolution appending to '$table' may only add columns " +
              "or widen types (byte->short->int->long, float->double); " +
              s"missing/narrowed/retyped: ${broken.map(_.name).mkString(", ")}\n" +
              s"  table:  ${cur.toDDL}\n  append: ${incoming.toDDL}")
      } else if (norm(cur) != norm(incoming))
        throw new IllegalArgumentException(
          s"schema mismatch appending to '$table':\n  table:  ${cur.toDDL}\n  append: ${incoming.toDDL}\n" +
            "(names and types must match; rewrite with overwrite() to change the schema, " +
            "or append(df, table, allowEvolution = true) to add columns)")
    }

  /** Check for hive-partitioned appends: a read-back schema re-types
    * partition columns (directory values are re-inferred) and reorders
    * them to the end, so partition columns get a name-only check — but
    * DATA columns keep their parquet types and are type-checked like a
    * plain append (a name-only check would wave through id:STRING vs
    * id:DOUBLE and corrupt the table). */
  def enforceAppendPartitioned(table: String, existing: Option[StructType],
      incoming: StructType, partitionCols: Seq[String]): Unit =
    existing.foreach { cur =>
      if (cur.fieldNames.toSet != incoming.fieldNames.toSet)
        throw new IllegalArgumentException(
          s"schema mismatch appending to '$table': column sets differ\n" +
            s"  table:  ${cur.fieldNames.sorted.mkString(", ")}\n" +
            s"  append: ${incoming.fieldNames.sorted.mkString(", ")}")
      val pc = partitionCols.toSet
      def dataCols(s: StructType) = StructType(
        s.fields.filterNot(f => pc.contains(f.name)).sortBy(_.name))
      enforceAppend(table, Some(dataCols(cur)), dataCols(incoming))
    }
}

/** Append-mode table storage, the Delta-semantics shim of SURVEY.md §7.4.
  *
  * The reference appends Arrow tables into Delta Lake
  * (write_deltalake(path, table, mode='append'), collector.py:219-226).
  * This environment ships no Delta jars, so the default implementation is
  * parquet append — atomic per job via Spark's commit protocol, which
  * covers the reference's semantics (append + re-readable table; no
  * time travel). The trait is deliberately narrow so `format("delta")`
  * could slot in unchanged on a cluster that has the connector.
  */
trait TableSink {
  def append(df: DataFrame, table: String): Unit

  /** Append with hive-style partition directories — the 100 TB layout:
    * a reader filtering on the partition columns scans only matching
    * directories (partition pruning), and retention/compaction operate
    * per partition. Typical keys: event date, feed/category. */
  def appendPartitioned(df: DataFrame, table: String,
      partitionCols: Seq[String]): Unit

  def overwrite(df: DataFrame, table: String): Unit
  def read(spark: SparkSession, table: String): DataFrame
  def exists(spark: SparkSession, table: String): Boolean

  /** Append at most once per `commitKey` (e.g. a streaming batchId).
    * Returns false if a commit with this key already exists. The base
    * implementation is NOT idempotent (plain parquet has nowhere durable
    * to record the key) — a replayed foreachBatch double-appends, i.e.
    * at-least-once. VersionedParquetSink overrides this with a real
    * keyed commit, upgrading the streaming fan-out to exactly-once. */
  def appendOnce(df: DataFrame, table: String, commitKey: String): Boolean = {
    append(df, table)
    true
  }

  /** Append one logical batch to SEVERAL tables under one key. The base
    * implementation is per-table [[appendOnce]] in order: each table is
    * individually keyed, so a crash between tables leaves a partial
    * batch that HEALS table-by-table on replay (eventually-all, never
    * atomic). [[VersionedParquetSink]] overrides this with a real
    * cross-table transaction — every table lands or none does. Returns
    * true iff this call landed data in at least one table. */
  def multiAppendOnce(writes: Seq[(DataFrame, String)],
      txnKey: String): Boolean =
    writes.map { case (df, t) => appendOnce(df, t, txnKey) }
      .exists(identity)
}

final class ParquetTableSink(basePath: String) extends TableSink {
  private def path(table: String) = s"$basePath/$table"

  private def existingSchema(df: DataFrame, table: String) =
    if (exists(df.sparkSession, table))
      Some(df.sparkSession.read.parquet(path(table)).schema)
    else None

  override def append(df: DataFrame, table: String): Unit = {
    SchemaCheck.enforceAppend(table, existingSchema(df, table), df.schema)
    df.write.mode(SaveMode.Append).parquet(path(table))
  }

  override def appendPartitioned(df: DataFrame, table: String,
      partitionCols: Seq[String]): Unit = {
    SchemaCheck.enforceAppendPartitioned(table, existingSchema(df, table),
      df.schema, partitionCols)
    df.write.mode(SaveMode.Append)
      .partitionBy(partitionCols: _*)
      .parquet(path(table))
  }

  override def overwrite(df: DataFrame, table: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path(table))

  override def read(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(path(table))

  override def exists(spark: SparkSession, table: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(table))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
