package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch end-to-end wiring (SURVEY.md §3.1): the reference's
  * `main.py` -> `process_feeds()` flow as one lazy Spark job graph.
  *
  * ingest -> anti-join state -> write raw -> curate -> write curated ->
  * analyze -> explode -> write actors, all through the TableSink.
  *
  * The reference executes the source graph twice (raw at collector.py:234,
  * curated at 235-236); here the ingested batch is cached once and fanned
  * out to the three sinks (SURVEY.md §7.4 risk 5). Re-running on the same
  * snapshots appends nothing: the state anti-join (T1/T2) makes the
  * pipeline idempotent at the batch level.
  */
object Pipeline {

  case class Result(newArticles: Long,
      quality: Map[String, Any] = Map.empty)

  def run(spark: SparkSession, feedsDir: String, sink: TableSink,
      analyzer: Analyze.TextAnalyzer = Analyze.RuleBasedAnalyzer): Result = {
    // quality observes the RAW entries, BEFORE toNews filters null
    // ids/times away — observing after the filter would report
    // null_keys=0 forever, hiding exactly the feed regressions the
    // metric exists to surface (same placement as the streaming path)
    val (entries, obs) = Quality.observeIngest(
      Ingest.readFeedSnapshots(spark, feedsDir),
      keyCol = "guid", tsCol = "published",
      // min/max freshness over the PARSED time — the raw RFC-1123 string
      // starts with the weekday name, so its lexicographic bounds are
      // meaningless; null counters stay on the raw column
      tsRange = Some(Ingest.parsePublished(
        org.apache.spark.sql.functions.col("published"))))
    val news = Ingest.toNews(entries)
    val state = Ingest.loadState(spark, sink)
    // dropDuplicates(id): the SAME new guid can appear in two snapshot
    // files of one run (normal RSS-poll overlap) — the state anti-join
    // only removes PREVIOUSLY seen ids (streaming path handles this with
    // dropDuplicatesWithinWatermark)
    val fresh = Ingest.newEntries(news, state).dropDuplicates("id").cache()
    try {
      // one materialization: empty-batch guard AND the action that fires
      // the observe() accumulators — quality comes for free with it
      val n = fresh.count()
      if (n == 0) return Result(0, obs.get) // T3 empty-batch short-circuit
      // Content-derived batch key: a crash between the appends and the
      // state write re-runs the same logical batch (same fresh-id set ->
      // same key), and appendOnce makes the re-appends no-ops on a
      // versioned sink — exactly-once. On the plain parquet sink
      // appendOnce degrades to at-least-once (documented on the trait),
      // which matches the reference's own crash window
      // (collector.py:113-115 writes state after storing).
      // 60-bit md5-derived id-set digest (order-independent sum): crc32
      // sums collide at birthday-of-2^16 rates, enough to silently no-op
      // a real batch via appendOnce; md5 prefix sums push that to ~2^30
      val sig = fresh.agg(
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.expr(
            "cast(conv(substr(md5(cast(id as binary)), 1, 15), 16, 10) as decimal(20,0))")))
        .head().getDecimal(0)
      val batchKey = s"ingest-$n-$sig"
      val curated = Curate(fresh)
      val analyzed = Analyze.withAnalysis(spark, curated, analyzer)
      // ONE cross-table commit for the whole batch: on the versioned
      // sink the four tables land all-or-none (a crash between table
      // writes can no longer leave raw ahead of curated); on the plain
      // parquet sink this degrades to the per-table at-least-once the
      // reference itself has (collector.py:113-115)
      sink.multiAppendOnce(Seq(
        fresh -> "raw",
        curated -> "curated",
        Analyze.explodeActors(analyzed) -> "actors",
        fresh.select("id") -> "state"), batchKey)
      Result(n, obs.get)
    } finally fresh.unpersist()
  }
}
