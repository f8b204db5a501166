package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (TESTDATA.md).
  *
  * All tables are plain parquet. `events.ts` has shipped in two
  * physical generations: `timestamp[us]` (read natively — as
  * TIMESTAMP_NTZ under Spark 4's default NTZ inference, which is also
  * what DuckDB's reader sees) and `timestamp[ns]`, which Spark's
  * parquet reader rejects (PARQUET_TYPE_ILLEGAL) — that one is read as
  * raw nanos via the `nanosAsLong` legacy conf and truncated to
  * microseconds, the same truncation DuckDB applies. The loader
  * dispatches on the schema it actually finds, so both generations
  * work unmodified.
  *
  * Scale notes: readers go through the vectorized parquet reader with
  * filter/column pushdown intact (no schema-mangling `.rdd` hops); at
  * cluster scale the same call works on a directory of many files.
  * Native-timestamp `ts` keeps parquet min/max pruning for bare
  * comparisons for free; predicates through `to_date`/tz casts are
  * recovered by [[graft.plans.NanosRangePushdown]].
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
        // Dispatch on the physical `ts` type actually present:
        //  - timestamp[us]: read natively (NTZ by default inference) —
        //    zero conversion, parquet pushdown intact;
        //  - LongType: a session with `nanosAsLong` pre-set read a
        //    timestamp[ns] file as raw nanos — integer `div` keeps full
        //    precision (a double round-trip would corrupt ~1.7e18
        //    values);
        //  - a PARQUET_TYPE_ILLEGAL throw: timestamp[ns] WITHOUT the
        //    legacy conf — retry under a locked set/restore window (the
        //    conf is only needed while the relation is RESOLVED; restore
        //    the caller's value so the shared session's later parquet
        //    reads aren't silently switched to raw-long semantics).
        def normalize(df: DataFrame): DataFrame =
          df.schema("ts").dataType match {
            case org.apache.spark.sql.types.LongType =>
              df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
            case _ => df
          }
        // Retry ONLY the illegal-parquet-type rejection — any other read
        // failure (missing path, corrupt footer) must surface as-is, not
        // masked by a redundant second read whose error replaces the
        // original.
        def isNanosRejection(t: Throwable): Boolean =
          Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
            .exists { e =>
              val cond = e match {
                case st: org.apache.spark.SparkThrowable =>
                  Option(st.getCondition).getOrElse("")
                case _ => ""
              }
              cond.contains("PARQUET_TYPE_ILLEGAL") ||
                Option(e.getMessage).exists(m =>
                  m.contains("PARQUET_TYPE_ILLEGAL") ||
                    m.contains("Illegal Parquet type"))
            }
        try normalize(spark.read.parquet(path(sfDir, name)))
        catch { case scala.util.control.NonFatal(e) if isNanosRejection(e) =>
          Tables.nanosConfLock.synchronized {
            val prior = spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            try normalize(spark.read.parquet(path(sfDir, name)))
            finally prior match {
              case Some(v) => spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
              case None => spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
            }
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
