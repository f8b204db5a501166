package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered layout — the parity feature for
  * Delta's `OPTIMIZE ... ZORDER BY (a, b)`: ONE physical sort order that
  * gives BOTH columns file-level locality, so a predicate on either
  * column touches a bounded subset of files (and parquet row-group
  * min/max stats skip within them). A plain sort gives this to exactly
  * one column; z-ordering interleaves the columns' bits so nearby
  * (a, b) points land in nearby files.
  *
  * Scale shape: the z-value is row-local arithmetic (codegen'd shifts
  * and masks over pre-bucketed ints); the clustering itself is one
  * range-repartition + within-partition sort — the same shuffle an
  * ordinary sorted write pays. The only driver-side work is the 2x2
  * min/max scalars used for bucketing (computed distributed, collected
  * as four numbers).
  */
object ZOrder {

  /** Bit-interleaved z-value of two ALREADY-BUCKETED non-negative ints
    * in [0, 2^bits): bit i of `a` lands at position 2i, bit i of `b` at
    * 2i+1. Bits are disjoint, so OR assembles the value. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    zValueN(Seq(a, b), bits)

  /** N-column round-robin interleave (bit i of column k lands at
    * position i*N + k) — the general OPTIMIZE ZORDER BY (c1..cN) form.
    * Total interleaved width must fit a signed long. */
  def zValueN(cols: Seq[Column], bits: Int = 16): Column = {
    require(cols.nonEmpty, "zValueN requires at least one column")
    require(bits >= 1 && bits * cols.size <= 63,
      s"bits*columns must be in [1,63], got $bits x ${cols.size}")
    val n = cols.size
    (for {
      i <- 0 until bits
      (c, k) <- cols.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), i).bitwiseAND(lit(1L)),
      i * n + k))
      .reduce(_ bitwiseOR _)
  }

  /** Linear min-max bucketing of a numeric column into [0, 2^bits) given
    * its collected bounds: the monotone scale z-ordering needs. A
    * constant column buckets to 0. */
  private def bucketed(c: String, lo: Double, hi: Double, bits: Int): Column = {
    val buckets = 1L << bits // 1 << 31 would overflow Int to negative
    if (hi == lo) lit(0L)
    else least(
      floor((col(c).cast("double") - lit(lo)) / lit(hi - lo) * buckets),
      lit(buckets - 1L)).cast("long")
  }

  /** Write `df` as parquet clustered on the z-order of (`colA`, `colB`):
    * bucket both columns, range-partition on the interleaved z-value into
    * `numFiles` output files, sort within partitions, drop the helper
    * column. Readers filtering on EITHER column touch only the files
    * whose z-range intersects the predicate — the data-skipping layout
    * for a 100 TB fact table queried along two independent dimensions.
    * Null keys bucket lowest (sorted first), matching a sorted write. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String, path: String,
      numFiles: Int = 8, bits: Int = 16): Unit = {
    // ONE aggregate job collects both columns' bounds (four scalars) —
    // a per-column agg would scan the input twice before the write scan
    val row = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    for ((c, i) <- Seq(colA -> 0, colB -> 2))
      require(!row.isNullAt(i) && !row.isNullAt(i + 1),
        s"z-order column '$c' is all-null")
    val z = zValue(
      bucketed(colA, row.getDouble(0), row.getDouble(1), bits),
      bucketed(colB, row.getDouble(2), row.getDouble(3), bits), bits)
    writeByZ(df, z, path, numFiles)
  }

  /** Equi-depth (quantile) variant for SKEWED columns: bucket boundaries
    * come from approxQuantile, so every bucket holds ~equal row counts
    * where min-max scaling would collapse the mass into one bucket and
    * lose that column's locality entirely (e.g. zipfian activity
    * counts). `bits` is small by design (2^bits - 1 boundary literals
    * per column are baked into the bucketing expression); the boundary
    * computation is one distributed approx-quantile pass over both
    * columns. */
  def writeZOrderedQuantile(df: DataFrame, colA: String, colB: String,
      path: String, numFiles: Int = 8, bits: Int = 8,
      relativeError: Double = 0.001): Unit = {
    require(bits >= 1 && bits <= 12, s"quantile bits must be in [1,12], got $bits")
    val nb = 1 << bits
    val probs = (1 until nb).map(_.toDouble / nb).toArray
    val Array(boundsA, boundsB) =
      df.stat.approxQuantile(Array(colA, colB), probs, relativeError)
    def qBucket(c: String, bounds: Array[Double]): Column = {
      val arr = array(bounds.map(lit): _*)
      // bucket = #boundaries <= x; nulls fail every comparison -> bucket 0
      // (lowest, same contract as the min-max variant)
      size(filter(arr, b => col(c).cast("double") >= b)).cast("long")
    }
    val z = zValue(qBucket(colA, boundsA), qBucket(colB, boundsB), bits)
    writeByZ(df, z, path, numFiles)
  }

  private def writeByZ(df: DataFrame, z: Column, path: String,
      numFiles: Int): Unit =
    clusterByZ(df, z, numFiles)
      .write.mode("overwrite").parquet(path) // OPTIMIZE-style rewrite

  private def clusterByZ(df: DataFrame, z: Column, numFiles: Int): DataFrame =
    df.withColumn("_z", z)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")

  /** The layout of [[writeZOrdered]] as a DataFrame (z-clustered into
    * `numFiles` range partitions, helper column dropped) WITHOUT the
    * write — for sinks that own their write path. Appending this
    * through [[VersionedParquetSink]] composes the two halves of data
    * skipping: z-order makes each output file cover a tight range of
    * BOTH columns, and the sink's per-file min/max stats let readWhere
    * open only the intersecting files. */
  def zOrdered(df: DataFrame, colA: String, colB: String,
      numFiles: Int = 8, bits: Int = 16): DataFrame = {
    val row = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    for ((c, i) <- Seq(colA -> 0, colB -> 2))
      require(!row.isNullAt(i) && !row.isNullAt(i + 1),
        s"z-order column '$c' is all-null")
    val z = zValue(
      bucketed(colA, row.getDouble(0), row.getDouble(1), bits),
      bucketed(colB, row.getDouble(2), row.getDouble(3), bits), bits)
    clusterByZ(df, z, numFiles)
  }

  /** [[zOrdered]] for ANY number of columns via [[zValueN]]'s
    * round-robin interleave: per-column min-max bucketing at
    * `min(16, 63/n)` bits (the 63-bit Long budget splits across
    * columns — 2 cols keep 16 bits each, 3 get 16, 4 get 15, ...).
    * One column degenerates to a plain range cluster on it. */
  def zOrderedN(df: DataFrame, cols: Seq[String],
      numFiles: Int = 8): DataFrame = {
    require(cols.nonEmpty, "zOrderedN requires at least one column")
    val bits = math.min(16, 63 / cols.size)
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.foreach { case (c, i) =>
      require(!row.isNullAt(2 * i) && !row.isNullAt(2 * i + 1),
        s"z-order column '$c' is all-null") }
    val z = zValueN(cols.zipWithIndex.map { case (c, i) =>
      bucketed(c, row.getDouble(2 * i), row.getDouble(2 * i + 1), bits)
    }, bits)
    clusterByZ(df, z, numFiles)
  }
}
