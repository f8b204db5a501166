package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Flattens all query groups into the driver-facing maps. */
object Registry {
  private def groups: Seq[Q] =
    CoreQueries.all ++ NorthStarQueries.all ++ ExtendedQueries.all ++
      TrainingQueries.all ++ CurationQueries.all ++ CorpusStatsQueries.all ++
      PqQueries.all ++ LexStatsQueries.all ++ TemporalQueries.all ++
      AuditQueries.all ++ GraphQueries.all ++ TokenizerQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    groups.map(q => q.name -> q.impl).toMap

  def oracleSql: Map[String, String] =
    groups.flatMap(q => q.oracle.map(o => q.name -> normalize(o))).toMap

  /** Collapse multi-line SQL literals to single-line for the JSON dump. */
  private def normalize(sql: String): String =
    sql.linesIterator.map(_.trim).filter(_.nonEmpty).mkString(" ")
}
