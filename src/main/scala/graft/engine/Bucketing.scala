package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table layout — the shuffle-elimination story for repeated
  * big-big joins at 100 TB. Writing both sides bucketed (and sorted) on
  * the join key with the same bucket count lets Spark plan a
  * SortMergeJoin with NO Exchange on either side: the shuffle is paid
  * once at write time and amortized over every subsequent join/agg on
  * that key. (Delta/Iceberg express the same idea as clustered layouts;
  * plain parquet + the session catalog is enough for Spark's bucketing
  * metadata.)
  *
  * The reference has no analog (single-process pandas), but any
  * fact-to-fact join of its tables at scale — e.g. raw news to actors on
  * news id — wants exactly this layout.
  */
object Bucketing {

  /** Save `df` as a managed bucketed table, bucketed AND sorted by `key`
    * into `buckets` files per partition — sorted buckets also give
    * streaming-friendly merge reads and better min/max skipping. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
