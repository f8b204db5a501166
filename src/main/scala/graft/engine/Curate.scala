package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Curation stage: the reference's Acero `project` node selecting the 7
  * curated columns (collector.py:136-154). In Spark this is a plain
  * select — Catalyst's ColumnPruning pushes it into the scan, so the
  * explicit projection is schema hygiene, not an optimization we must
  * hand-build (SURVEY.md §4.1).
  */
object Curate {
  def apply(news: DataFrame): DataFrame =
    news.select(Schemas.curatedColumns.map(col): _*)
}
