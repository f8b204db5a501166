package graft.engine

import java.sql.Date

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The dashboard's query set (visualizer.py:53-188) as parameterized
  * DataFrame functions — the read path of the reference re-expressed
  * declaratively so Catalyst gets predicate pushdown and join planning
  * the pandas version never had (SURVEY.md §3.2).
  */
object Analytics {

  /** Category + date-range filter (visualizer.py:87-91, P3+P4). */
  def filterNews(news: DataFrame, categories: Seq[String],
      from: Date, to: Date): DataFrame =
    news.filter(col("category").isin(categories: _*) &&
      to_date(col("published_time")).between(lit(from), lit(to)))

  /** Actors of the filtered articles (visualizer.py:93, J1 semi-join),
    * minus BBC self-mentions and reporters — the null-safe negated
    * case-insensitive contains of visualizer.py:96-99 (`na=False`). */
  def relevantActors(actors: DataFrame, filteredNews: DataFrame): DataFrame = {
    val semi = actors.join(filteredNews.select(col("id")),
      actors("news_id") === col("id"), "left_semi")
    def notContains(c: String, needle: String) =
      !coalesce(lower(col(c)).contains(needle), lit(false))
    semi.filter(notContains("actor_name", "bbc") &&
      notContains("actor_role", "reporter"))
  }

  /** Headline metrics A1-A3 (visualizer.py:105-112), one pass. */
  def metrics(filteredNews: DataFrame, actors: DataFrame): DataFrame = {
    val n = filteredNews.agg(count(lit(1)).as("n_articles"))
    val a = actors.agg(
      countDistinct(col("actor_name")).as("n_unique_actors"),
      count(when(col("is_main_actor"), 1)).as("n_main_actors"))
    n.crossJoin(a)
  }

  /** Articles per day for the timeline chart (visualizer.py:115, A4). */
  def timeline(filteredNews: DataFrame): DataFrame =
    filteredNews
      .groupBy(to_date(col("published_time")).as("day"))
      .agg(count(lit(1)).as("n"))
      .orderBy("day")

  /** Top-k most-mentioned actors with deterministic tie-break
    * (visualizer.py:136, A5/A10). */
  def topActors(actors: DataFrame, k: Int): DataFrame =
    actors.groupBy("actor_name")
      .agg(count(lit(1)).as("mentions"))
      .orderBy(desc("mentions"), asc("actor_name"))
      .limit(k)

  /** Mentions per (actor, role) restricted to the top-k set
    * (visualizer.py:139-140, A6+A7): semi-join against the broadcast
    * top-k — never a driver-side collect of the key set. */
  def topActorRoles(actors: DataFrame, k: Int): DataFrame =
    actors
      .join(broadcast(topActors(actors, k).select("actor_name")),
        Seq("actor_name"), "left_semi")
      .groupBy("actor_name", "actor_role")
      .agg(count(lit(1)).as("mentions"))
      .orderBy(desc("mentions"), asc("actor_name"), asc("actor_role"))

  /** Category distribution for the pie chart (visualizer.py:160-161, A8). */
  def categoryDistribution(filteredNews: DataFrame): DataFrame =
    filteredNews.groupBy("category").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("category"))

  /** Date bounds for the filter widget (visualizer.py:77-78, A9). */
  def dateBounds(news: DataFrame): DataFrame =
    news.agg(min(col("published_time")).as("lo"),
      max(col("published_time")).as("hi"))

  /** Detail view: news left-joined with its actors (visualizer.py:175-184,
    * J3). The actors side is the smaller table in the reference's data;
    * Spark's planner picks broadcast-hash automatically under AQE. */
  def detailView(news: DataFrame, actors: DataFrame): DataFrame =
    news.join(actors, news("id") === actors("news_id"), "left")
      .select(news("id"), col("title"), col("published_time"),
        col("category"), col("actor_name"), col("actor_role"),
        col("is_main_actor"))
      // total order, like every other multi-row result here — join output
      // order is partitioning-dependent
      .orderBy(news("id"), col("actor_name").asc_nulls_first,
        col("actor_role").asc_nulls_first)
}
