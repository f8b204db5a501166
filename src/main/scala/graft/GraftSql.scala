package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-only entry point: run ANSI SQL over the testdata tables without
  * touching the Scala API — the `spark.sql` face of the engine
  * (SURVEY.md §3.3; the reference's ad-hoc `DeltaTable(...).to_pandas()`
  * analysis surface).
  *
  * Registers every table in `sfDir` as a temp view (idempotent;
  * createOrReplace) plus the graft extensions (`graft_dot`), then runs
  * the statement:
  * {{{
  *   GraftSql.run(spark, "/root/testdata/sf0.01",
  *     "SELECT event_type, count(*) FROM events GROUP BY 1")
  * }}}
  */
object GraftSql {
  def run(spark: SparkSession, sfDir: String, sql: String): DataFrame = {
    engine.Views.registerTestdata(spark, sfDir)
    spark.sql(sql)
  }
}
