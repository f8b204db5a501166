package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel tracking — the incremental form of q_funnel: a
  * per-user stage machine over the event stream that emits a transition
  * row the moment a user completes the next funnel stage in strict time
  * order. Downstream, `groupBy(stage).count()` is the live conversion
  * dashboard the batch query recomputes from scratch.
  *
  * This is the flatMapGroupsWithState construct (variable number of
  * output rows per group per batch — a user can complete several stages
  * in one micro-batch): state is one (stage, lastTs) pair per user,
  * BOUNDED by user cardinality and dropped via TTL once a user has been
  * idle past `ttl` (a completed or stalled funnel holds state forever
  * otherwise — the unbounded-state trap).
  *
  * Ordering contract: rows WITHIN a micro-batch are sorted by event
  * time before advancing the machine, so intra-batch disorder is
  * handled; an event arriving in a LATER batch than a younger event
  * (cross-batch disorder) cannot rewind the machine — it is skipped,
  * exactly like a watermark-late row in a windowed aggregation. The
  * batch q_funnel over the same data is the exact-order reference.
  */
object Funnel {

  /** (stage reached so far, event-time of that stage's completion). */
  case class FunnelState(stage: Int, lastTs: Long)

  /** One emitted stage completion. `stage` is 1-based (stage 1 = first
    * funnel step done); `ts` is the completing event's epoch micros. */
  case class Transition(user_id: Long, stage: Int, ts: Long)

  /** One emitted (user, cohort-week, week-index) retention fact. */
  case class WeekActive(user_id: Long, cohort: String, week_k: Long)

  /** Streaming cohort retention — the incremental form of q_retention:
    * per-user state holds the FIRST-activity week (the cohort) and the
    * weeks already emitted, so each (user, week) activity fact flows
    * downstream exactly once; `groupBy(cohort, week_k).count()` is the
    * live retention triangle. Late events from before a user's known
    * cohort cannot rewind it (same late-row contract as the funnel —
    * the batch q_retention is the exact reference). State is one week
    * list per user, growing one entry per ACTIVE week, TTL-evicted. */
  def weeklyRetention(spark: SparkSession, events: DataFrame,
      ttl: Option[String] = None): Dataset[WeekActive] = {
    import spark.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .select(col("user_id").cast("long"),
        unix_seconds(date_trunc("week", col("ts"))).as("w"))
      .filter(col("user_id").isNotNull && col("w").isNotNull)
      .as[(Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (user: Long, rows: Iterator[(Long, Long)],
         state: GroupState[RetentionState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val weeks = rows.map(_._2).toSeq.distinct.sorted
            val prev = state.getOption
            // first batch pins the cohort; later batches can only add
            // weeks AT or AFTER it (late pre-cohort rows are skipped)
            val cohort = prev.map(_.cohort).getOrElse(weeks.head)
            val seen = prev.map(_.seen).getOrElse(Seq.empty)
            val fresh = weeks.filter(w => w >= cohort && !seen.contains(w))
            state.update(RetentionState(cohort, seen ++ fresh))
            ttl.foreach(state.setTimeoutDuration)
            val cohortDay = java.time.Instant.ofEpochSecond(cohort)
              .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString
            fresh.iterator.map(w =>
              WeekActive(user, cohortDay, (w - cohort) / 604800L))
          }
      }
  }

  /** (cohort week epoch-seconds, weeks already emitted). */
  case class RetentionState(cohort: Long, seen: Seq[Long])

  /** Transform an event stream (user_id, event_type, ts) into the
    * stream of stage completions for the ordered `stages` list. */
  def stageTransitions(spark: SparkSession, events: DataFrame,
      stages: Seq[String], ttl: Option[String] = None): Dataset[Transition] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    import spark.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .select(col("user_id").cast("long"), col("event_type"),
        unix_micros(col("ts")).as("t"))
      .filter(col("user_id").isNotNull && col("event_type").isNotNull &&
        col("t").isNotNull)
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (user: Long, rows: Iterator[(Long, String, Long)],
         state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle user: funnel abandoned, state reclaimed
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
            val out = Seq.newBuilder[Transition]
            // intra-batch disorder handled by sorting on event time;
            // ties advance in stage order (deterministic)
            rows.toSeq.sortBy(_._3).foreach { case (_, tpe, t) =>
              if (st.stage < stages.size && tpe == stages(st.stage) &&
                  t > st.lastTs) {
                st = FunnelState(st.stage + 1, t)
                out += Transition(user, st.stage, t)
              }
            }
            state.update(st)
            ttl.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }
}
