package graft.engine

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Append-only table with a minimal commit log — the Delta-semantics the
  * reference actually relies on (ACID append + "time travel",
  * README.md:12), on plain parquet.
  *
  * Layout per table:
  * {{{
  *   <base>/<table>/d-<uuid>/part-*.parquet  unique dir per append attempt
  *   <base>/<table>/_commits/<n>.commit      {"dir":"d-<uuid>"} — written LAST
  * }}}
  *
  * Protocol (the same shape as Delta's log, minus checkpoints):
  *  1. write the data files into a UNIQUE directory — concurrent writers
  *     can never clobber each other's files;
  *  2. claim the next version number by atomically creating its commit
  *     marker (`FileSystem.create(overwrite=false)`); the marker names
  *     the data directory. A loser of the race just re-claims the next
  *     number — its data files are already safely in place.
  *
  * A version is visible iff its marker exists, so readers never see a
  * half-written append, and a writer that dies before committing leaves
  * only an invisible orphan directory. `readAt(v)` = union of the data
  * dirs referenced by markers <= v (time travel).
  *
  * Scale note: listing grows O(commits); a production variant checkpoints
  * the manifest periodically exactly as Delta does. The TableSink trait
  * stays the same — this is the slot a real Delta/Iceberg writer fills on
  * a cluster with the connector jars.
  */
final class VersionedParquetSink(basePath: String) extends TableSink {
  private def tableDir(table: String) = s"$basePath/$table"
  private def commitDir(table: String) = s"$basePath/$table/_commits"

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Committed version numbers, ascending. */
  def versions(spark: SparkSession, table: String): Seq[Long] = {
    val dir = new Path(commitDir(table))
    val f = fs(spark, commitDir(table))
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".commit"))
      .map(_.stripSuffix(".commit").toLong)
      .sorted
  }

  def latestVersion(spark: SparkSession, table: String): Option[Long] =
    versions(spark, table).lastOption

  private def readMarker(spark: SparkSession, table: String, v: Long): String = {
    val marker = new Path(s"${commitDir(table)}/$v.commit")
    val in = fs(spark, commitDir(table)).open(marker)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private def dataDirOf(spark: SparkSession, table: String, v: Long): String = {
    val body = readMarker(spark, table, v)
    """"dir"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(body) match {
      case Some(m) => s"${tableDir(table)}/${m.group(1)}"
      case None => throw new IllegalStateException(
        s"corrupt commit marker for $table v$v: $body")
    }
  }

  override def append(df: DataFrame, table: String): Unit =
    doAppend(df, table, commitKey = None)

  /** Idempotent keyed append: if any committed marker carries this key,
    * the append is a no-op — the exactly-once contract for replayed
    * streaming micro-batches. The key check re-runs after losing a
    * version race, so two replicas replaying the same batch commit once. */
  override def appendOnce(df: DataFrame, table: String,
      commitKey: String): Boolean =
    doAppend(df, table, Some(commitKey))

  private def committedKeys(spark: SparkSession, table: String): Set[String] =
    versions(spark, table).flatMap { v =>
      """"key"\s*:\s*"([^"]+)"""".r
        .findFirstMatchIn(readMarker(spark, table, v)).map(_.group(1))
    }.toSet

  private def doAppend(df: DataFrame, table: String,
      commitKey: Option[String]): Boolean = {
    val spark = df.sparkSession
    if (commitKey.exists(committedKeys(spark, table).contains)) return false
    val unique = s"d-${UUID.randomUUID()}"
    df.write.mode(SaveMode.ErrorIfExists)
      .parquet(s"${tableDir(table)}/$unique") // step 1: unique data dir
    val f = fs(spark, commitDir(table))
    f.mkdirs(new Path(commitDir(table)))
    var attempt = latestVersion(spark, table).map(_ + 1).getOrElse(0L)
    while (true) {
      val keyField = commitKey.map(k => s""","key":"$k"""").getOrElse("")
      // Write the FULL marker body to a temp file, then atomically rename
      // it to <n>.commit. create-then-write would make an EMPTY marker
      // visible first — readers would throw on it and a same-key
      // committer would see "no key" and double-commit.
      val tmp = new Path(s"${commitDir(table)}/.tmp-${UUID.randomUUID()}")
      val out = f.create(tmp, true)
      try {
        out.write(
          s"""{"version":$attempt,"dir":"$unique"$keyField,"ts":"${java.time.Instant.now}"}"""
            .getBytes(StandardCharsets.UTF_8))
      } finally out.close()
      val marker = new Path(s"${commitDir(table)}/$attempt.commit")
      if (f.rename(tmp, marker)) return true
      f.delete(tmp, false)
      if (!f.exists(marker)) throw new java.io.IOException(
        s"failed to commit marker $marker (rename failed, no competing marker)")
      // lost the race; re-check key, re-claim next number
      if (commitKey.exists(committedKeys(spark, table).contains)) {
        f.delete(new Path(s"${tableDir(table)}/$unique"), true)
        return false
      }
      attempt += 1
    }
    false // unreachable
  }

  override def appendPartitioned(df: DataFrame, table: String,
      partitionCols: Seq[String]): Unit =
    throw new UnsupportedOperationException(
      "VersionedParquetSink versions whole commits; use ParquetTableSink for hive partitioning")

  override def overwrite(df: DataFrame, table: String): Unit = {
    val spark = df.sparkSession
    fs(spark, tableDir(table)).delete(new Path(tableDir(table)), true)
    append(df, table)
  }

  /** Snapshot = union of committed versions (orphan dirs are invisible). */
  override def read(spark: SparkSession, table: String): DataFrame =
    readAt(spark, table, Long.MaxValue)

  /** Time travel: the table as of version `v` (inclusive). */
  def readAt(spark: SparkSession, table: String, v: Long): DataFrame = {
    val vs = versions(spark, table).filter(_ <= v)
    require(vs.nonEmpty, s"no committed versions <= $v for $table")
    spark.read.parquet(vs.map(dataDirOf(spark, table, _)): _*)
  }

  override def exists(spark: SparkSession, table: String): Boolean =
    versions(spark, table).nonEmpty
}
