package graft.sources

import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider}

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
  * `load(path)` addresses `<basePath>/<table>`; an explicit
  * `option("table", ...)` overrides the last path segment. Reads plan
  * through [[graft.engine.GraftRelation]] — commit-log stats pruning in
  * `FileIndex.listFiles`, stock vectorized parquet + codegen below, the
  * logical schema under column mapping. Writes commit through the
  * sink's optimistic log: `append` is an ACID append (schema-checked,
  * CHECK constraints enforced, generated columns computed/validated),
  * `overwrite` replaces the table, `ignore` no-ops when the table
  * exists, `errorifexists` throws. Registered via
  * `META-INF/services`, so the short name works with zero imports. */
final class GraftDataSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister {

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
    sink.baseRelation(spark, table,
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
    mode match {
      case SaveMode.Append => sink.append(data, table, evolve)
      case SaveMode.Overwrite => sink.overwrite(data, table)
      case SaveMode.ErrorIfExists =>
        if (sink.exists(spark, table)) throw new IllegalStateException(
          s"table '$table' already exists at $base (mode=errorifexists)")
        else sink.append(data, table, evolve)
      case SaveMode.Ignore =>
        if (!sink.exists(spark, table)) sink.append(data, table, evolve)
    }
    sink.baseRelation(spark, table)
  }
}
