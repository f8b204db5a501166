package graft.engine

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Sorted-run export: write a frame as `runs` NON-OVERLAPPING,
  * individually-sorted parquet files on a key, plus a JSON manifest of
  * per-run key ranges — the layout external tooling wants when it
  * cannot shuffle: k-way external merges, tokenizer shards that need
  * contiguous id ranges, bisection lookups over cold storage
  * ("which file can hold key K?" answered from the manifest alone).
  *
  * Scale shape: `repartitionByRange` samples the key (one lightweight
  * job) and gives every run a contiguous, disjoint key range — equal
  * keys land in ONE run, so range boundaries never split a key;
  * `sortWithinPartitions` orders each run with a per-partition sort
  * (no global sort, no single-partition funnel — this is exactly the
  * shape a 1000-executor export keeps); the manifest is ONE
  * aggregation over the written files (grouped by `input_file_name`,
  * the FileStats recipe). At 100 TB the export is a full shuffle of
  * the data — unavoidable for this layout — but nothing ever
  * concentrates on one node.
  */
object SortedExport {

  /** One exported run: its file name (relative to the export dir), its
    * inclusive key range, and its row count. */
  final case class Run(file: String, min: String, max: String, rows: Long)

  /** Export and return the manifest (also written to
    * `<outDir>/_runs.json`, runs in ascending key order). */
  def export(df: DataFrame, keyCol: String, outDir: String,
      runs: Int): Seq[Run] = {
    require(runs >= 1, "need at least one run")
    val spark = df.sparkSession
    df.repartitionByRange(runs, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode(SaveMode.ErrorIfExists).parquet(outDir)
    // manifest pass: per-file min/max/count in one aggregation (files
    // are still hot in page cache)
    // min/max in the KEY's native ordering (a string cast first would
    // order "10" < "9"); cast to string only for the manifest rendering
    val rows = spark.read.parquet(outDir)
      .groupBy(input_file_name().as("f"))
      .agg(min(col(keyCol)).as("lo"), max(col(keyCol)).as("hi"),
        count(lit(1)).as("n"))
      .orderBy("lo")
      .select(col("f"), col("lo").cast("string"),
        col("hi").cast("string"), col("n"))
      .collect()
      .map(r => Run(r.getString(0).split('/').last, r.getString(1),
        r.getString(2), r.getLong(3)))
      .toSeq
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val arr = mapper.createArrayNode()
    rows.foreach { r =>
      val n = arr.addObject()
      n.put("file", r.file); n.put("min", r.min); n.put("max", r.max)
      n.put("rows", r.rows)
    }
    val p = new Path(s"$outDir/_runs.json")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(mapper.writeValueAsString(arr)
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    rows
  }
}
