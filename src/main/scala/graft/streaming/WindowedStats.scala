package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming aggregation operators generalizing the reference's batch
  * analytics (SURVEY.md §2.2 note): the dashboard's group-by-day timeline
  * (visualizer.py:115) as an incremental event-time window, and a
  * mapGroupsWithState counter for custom per-key state — the construct
  * the reference approximates with its JSON state file.
  */
object WindowedStats {

  /** Articles per tumbling event-time day, incrementally maintained.
    * Watermark bounds the open-window state; late rows beyond it are
    * dropped rather than accumulating (vs the reference's unbounded
    * state file, README.md:111). Append mode: a day emits once its
    * watermark passes — the exactly-once streaming version of A4. */
  def dailyCounts(news: DataFrame, watermark: String = "2 days"): DataFrame =
    news
      .withWatermark("published_time", watermark)
      .groupBy(window(col("published_time"), "1 day").as("w"),
        col("category"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("day"), col("category"), col("n"))

  /** Event-time session windows: activity bursts per user separated by
    * `gap` of silence — the incremental version of q_sessionize's batch
    * lag/running-sum form, but with the engine maintaining (and merging)
    * open sessions in the state store. A session emits once the
    * watermark passes its close; state is bounded by watermark + gap.
    * At scale this is one stateful shuffle keyed on user_id, identical
    * topology to the batch query. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Hopping (sliding) event-time windows: each event lands in
    * `size`/`slide` overlapping windows — the incremental version of the
    * batch q_hopping. Same scale shape as [[dailyCounts]] (one stateful
    * shuffle on window start); the engine generates the per-event window
    * list row-locally, and the watermark closes `size`/`slide` open
    * windows per grid step. */
  def hoppingCounts(events: DataFrame, size: String = "60 minutes",
      slide: String = "30 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), size, slide).as("w"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total"))
      .select(col("w.start").as("w_start"), col("n"), col("total"))

  case class FeedProgress(category: String, articles: Long, lastSeen: Long)

  /** Custom keyed state via mapGroupsWithState: running per-feed article
    * counters — the typed state-store construct (KeyValueGroupedDataset)
    * for logic windowed aggs can't express.
    *
    * `ttl=Some(d)` evicts idle feeds after a processing-time timeout
    * (bounding state, unlike the reference's ever-growing file). Note the
    * operational trade-off: registered processing-time timeouts make the
    * engine schedule continuous no-data micro-batches to fire them, so
    * `processAllAvailable()` never quiesces — use TTL with a real
    * ProcessingTime trigger, not in drain-and-stop tests. */
  def feedProgress(spark: SparkSession, news: DataFrame,
      ttl: Option[String] = None): Dataset[FeedProgress] = {
    import spark.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    news.select(col("category"), col("published_time").cast("long").as("ts"))
      // a null key or time would kill the STREAM at encoder
      // deserialization (non-nullable tuple fields) — drop, don't die
      .filter(col("category").isNotNull && col("ts").isNotNull)
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(timeoutConf) {
        (category: String, rows: Iterator[(String, Long)],
         state: GroupState[FeedProgress]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            last
          } else {
            val batch = rows.toSeq
            val prev = state.getOption.getOrElse(FeedProgress(category, 0L, 0L))
            val next = FeedProgress(category,
              prev.articles + batch.size,
              math.max(prev.lastSeen, if (batch.isEmpty) 0L else batch.map(_._2).max))
            state.update(next)
            ttl.foreach(state.setTimeoutDuration)
            next
          }
      }
  }
}
