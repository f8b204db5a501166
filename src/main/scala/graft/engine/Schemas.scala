package graft.engine

import org.apache.spark.sql.types._

/** Declared schemas for the news-pipeline tables — fixed and explicit at
  * construction, as in the reference (collector.py:103-111 builds typed
  * Arrow arrays; Delta enforces them on append, collector.py:223).
  */
object Schemas {

  /** Raw == curated news schema (collector.py:103-111). thumbnail_url is
    * the only nullable column (missing media_thumbnail -> None,
    * collector.py:98). */
  val news: StructType = StructType(Seq(
    StructField("title", StringType, nullable = false),
    StructField("published_time", TimestampType, nullable = false),
    StructField("description", StringType, nullable = false),
    StructField("link", StringType, nullable = false),
    StructField("id", StringType, nullable = false),
    StructField("thumbnail_url", StringType, nullable = true),
    StructField("category", StringType, nullable = false)))

  /** The 7 curated columns the project node selects (collector.py:142-150). */
  val curatedColumns: Seq[String] = news.fieldNames.toSeq

  /** Flattened actors table (collector.py:208-213). */
  val actors: StructType = StructType(Seq(
    StructField("news_id", StringType, nullable = false),
    StructField("actor_name", StringType, nullable = false),
    StructField("actor_role", StringType, nullable = false),
    StructField("is_main_actor", BooleanType, nullable = false)))

  /** Nested analyzer output (processor.py:18-35): array-of-struct actor
    * lists + enum-constrained category; null when analysis fails
    * (processor.py:110-121). */
  val actorStruct: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("role", StringType, nullable = false)))

  val analysis: StructType = StructType(Seq(
    StructField("main_actors", ArrayType(actorStruct), nullable = false),
    StructField("other_actors", ArrayType(actorStruct), nullable = false),
    StructField("category", StringType, nullable = false)))

  /** The 5-value category enum (processor.py:31-35). */
  val categories: Seq[String] = Seq(
    "Political Turmoil", "New Product Announced", "Leadership Change",
    "Housing Issues", "Others")

  /** Feed-entry shape as fetched (collector.py:96-100): RSS fields before
    * Arrow table construction. */
  val feedEntry: StructType = StructType(Seq(
    StructField("title", StringType, nullable = false),
    StructField("published", StringType, nullable = false), // RFC-1123 text
    StructField("description", StringType, nullable = false),
    StructField("link", StringType, nullable = false),
    StructField("guid", StringType, nullable = false),
    StructField("media_thumbnail", StringType, nullable = true),
    StructField("feed", StringType, nullable = false))) // source feed name

  /** Processed-ID state table (collector.py:45-63's JSON state file). */
  val state: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false)))
}
