package graft.engine

import org.apache.spark.sql.SparkSession

/** Programmatic-access surface (SURVEY.md §3.3): the reference exposes its
  * tables for ad-hoc analysis via `DeltaTable(path).to_pandas()`; the
  * Spark equivalent is temp-view registration so the whole engine is
  * reachable from `spark.sql(...)` — including `graft_dot`, which is
  * registered alongside.
  */
object Views {

  /** Register every testdata table under its name for `spark.sql`. */
  def registerTestdata(spark: SparkSession, sfDir: String): Unit = {
    graft.GraftExtensions.ensureRegistered(spark)
    Tables.names.foreach { name =>
      Tables.load(spark, sfDir, name).createOrReplaceTempView(name)
    }
  }

  /** Time travel surfaced through SQL: register `table` AS OF `version`
    * as the temp view `<table>_v<version>` — the Spark face of the
    * reference's Delta time-travel read (README.md:12). Returns the view
    * name.
    * {{{
    *   val v = Views.registerSnapshot(spark, sink, "curated", 3)
    *   spark.sql(s"SELECT category, count(*) FROM $v GROUP BY 1")
    * }}} */
  def registerSnapshot(spark: SparkSession, sink: VersionedParquetSink,
      table: String, version: Long): String = {
    graft.GraftExtensions.ensureRegistered(spark)
    val name = s"${table}_v$version"
    sink.readAt(spark, table, version).createOrReplaceTempView(name)
    name
  }

  /** Timestamp time travel through SQL (Delta's `timestampAsOf`):
    * register `table` as of wall-clock `ts` as the temp view
    * `<table>_asof_<epochMillis>`. Returns the view name. */
  def registerSnapshotAt(spark: SparkSession, sink: VersionedParquetSink,
      table: String, ts: java.time.Instant): String = {
    graft.GraftExtensions.ensureRegistered(spark)
    val name = s"${table}_asof_${ts.toEpochMilli}"
    sink.readAsOf(spark, table, ts).createOrReplaceTempView(name)
    name
  }

  /** Register the pipeline's output tables (raw/curated/actors/state)
    * from a sink for ad-hoc SQL. */
  def registerPipeline(spark: SparkSession, sink: TableSink): Unit = {
    graft.GraftExtensions.ensureRegistered(spark)
    Seq("raw", "curated", "actors", "state").foreach { t =>
      if (sink.exists(spark, t))
        sink.read(spark, t).createOrReplaceTempView(t)
    }
  }
}
