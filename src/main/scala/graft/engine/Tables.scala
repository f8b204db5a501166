package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (TESTDATA.md).
  *
  * All tables are plain parquet; `events.ts` is physically
  * `timestamp[ns]`, which Spark's parquet reader rejects
  * (PARQUET_TYPE_ILLEGAL). We read it as raw nanos via the
  * `nanosAsLong` legacy conf and truncate to microseconds — the same
  * truncation DuckDB's reader applies — so oracle comparisons line up.
  *
  * Scale notes: readers go through the vectorized parquet reader with
  * filter/column pushdown intact (no schema-mangling `.rdd` hops); at
  * cluster scale the same call works on a directory of many files.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(sfDir: String, name: String): String = s"$sfDir/$name.parquet"

  /** Load one testdata table, normalizing types where needed. */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" =>
        // timestamp[ns] -> LongType nanos; integer `div` keeps full
        // precision (a double round-trip would corrupt ~1.7e18 values).
        // The conf is needed only while the relation is RESOLVED (schema
        // conversion is eager); restore the caller's value afterwards so
        // a shared session's later parquet reads aren't silently switched
        // to raw-long nanos semantics. The set/restore window is
        // serialized against OTHER Tables.load calls by the JVM lock
        // below; a caller racing its own unrelated parquet reads against
        // this load on the SAME session can still observe the flag —
        // hosts that do that should pre-set the conf session-wide (as
        // Verify/Bench/TestSpark do) or load tables single-threaded.
        Tables.nanosConfLock.synchronized {
          val prior = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          try spark.read.parquet(path(sfDir, name))
            .withColumn("ts", timestamp_micros(expr("ts div 1000")))
          finally prior match {
            case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
            case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
          }
        }
      case _ =>
        spark.read.parquet(path(sfDir, name))
    }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Serializes the nanosAsLong set/restore window in [[load]]. */
  private val nanosConfLock = new Object
}
