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
  * BOUNDED by user cardinality and dropped via an EVENT-TIME TTL once a
  * user has been idle past `ttl` of stream time. Event-time (not
  * processing-time) eviction is what makes replays deterministic: a
  * reprocessed stream ages state at identical points because the
  * watermark is derived from the data, not the wall clock. The TTL
  * DEFAULTS ON — unbounded per-user state is the trap, so holding state
  * forever is the explicit opt-out (`ttl = None`).
  *
  * Ordering contract: rows WITHIN a micro-batch are sorted by event
  * time before advancing the machine, so intra-batch disorder is
  * handled; an event arriving in a LATER batch than a younger event
  * (cross-batch disorder) cannot rewind the machine — it is skipped,
  * exactly like a watermark-late row in a windowed aggregation. The
  * batch q_funnel over the same data is the exact-order reference.
  */
object Funnel {

  /** The default idle-eviction horizon: long enough that ordinary
    * retention/funnel analytics never lose a live user, finite so state
    * is bounded by ACTIVE users, not all users ever seen. */
  val DefaultTtl = "90 days"

  /** (stage reached so far, event-time of that stage's completion,
    * max event-time micros EVER seen for this user — the TTL anchor).
    * `maxTs` (not the batch max) arms the timeout, so a late but
    * within-watermark batch can never move the eviction point backward
    * and evict a user who was active within the TTL.
    *
    * STATE-SCHEMA VERSIONING: `maxTs` was added to this encoding (and
    * to [[RetentionState]]) after the first release; Spark pins the
    * state encoder schema inside each streaming checkpoint, so a
    * checkpoint written BEFORE the field existed cannot be restored by
    * this version — the restore fails loudly at state deserialization
    * (it cannot silently misread: the row widths differ). Restart such
    * queries from a fresh checkpoint and replay the source (offsets are
    * commit versions, so a full replay is exact). Any FUTURE field
    * must follow the same rule: append-with-default + note here, never
    * reorder — and breaks old checkpoints the same way. */
  case class FunnelState(stage: Int, lastTs: Long,
      maxTs: Long = Long.MinValue)

  /** One emitted stage completion. `stage` is 1-based (stage 1 = first
    * funnel step done); `ts` is the completing event's epoch micros. */
  case class Transition(user_id: Long, stage: Int, ts: Long)

  /** One emitted (user, cohort-week, week-index) retention fact. */
  case class WeekActive(user_id: Long, cohort: String, week_k: Long)

  /** Per-user retention state: the cohort week (epoch seconds), its
    * label AS RENDERED IN THE SPARK PLAN (session timezone — the batch
    * q_retention's date_format path, so streaming and batch labels agree
    * in any session timezone), and the emitted weeks as a BITSET indexed
    * by week-since-cohort. A decade-active user costs ~65 bytes and O(1)
    * membership per week — vs the previous Seq[Long] (8 bytes per active
    * week forever plus an O(n) `contains` per batch). */
  case class RetentionState(cohort: Long, label: String, bits: Array[Byte],
      maxTs: Long = Long.MinValue)

  /** Data-quality guard: a week index beyond this (≈1900 years past the
    * cohort) is a corrupt timestamp, not activity — dropped rather than
    * letting one garbage row inflate the bitset. */
  private val MaxWeekIndex = 100000L

  private[graft] def bitGet(bits: Array[Byte], k: Int): Boolean =
    (k >> 3) < bits.length && ((bits(k >> 3) >> (k & 7)) & 1) == 1

  private[graft] def bitSet(bits: Array[Byte], k: Int): Array[Byte] = {
    val need = (k >> 3) + 1
    val out =
      if (need <= bits.length) bits.clone()
      else java.util.Arrays.copyOf(bits, need)
    out(k >> 3) = (out(k >> 3) | (1 << (k & 7))).toByte
    out
  }

  /** Pure per-batch state transition (unit-tested directly): fold one
    * batch of (week-epoch, week-label) observations into the state;
    * returns the new state plus the week indices to emit. The first
    * batch pins the cohort to its EARLIEST week; later batches can only
    * add weeks at or after it (late pre-cohort rows are skipped, not a
    * rewind); an already-emitted week is never re-emitted. */
  private[graft] def advanceRetention(prev: Option[RetentionState],
      weekRows: Seq[(Long, String)]): (RetentionState, Seq[Long]) = {
    val sorted = weekRows.distinct.sortBy(_._1)
    val (cohort, label) = prev.map(s => (s.cohort, s.label))
      .getOrElse(sorted.head)
    var bits = prev.map(_.bits).getOrElse(Array.emptyByteArray)
    val fresh = Seq.newBuilder[Long]
    sorted.foreach { case (w, _) =>
      if (w >= cohort) {
        val k = (w - cohort) / 604800L
        if (k <= MaxWeekIndex && !bitGet(bits, k.toInt)) {
          bits = bitSet(bits, k.toInt)
          fresh += k
        }
      }
    }
    (RetentionState(cohort, label, bits,
      prev.map(_.maxTs).getOrElse(Long.MinValue)), fresh.result())
  }

  /** Day-time TTL string → millis (month-bearing intervals are not a
    * fixed duration and are rejected). */
  private def ttlMillis(s: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(s))
    require(iv.months == 0, s"TTL '$s' must be a day/time duration")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  /** Event-time timeout: strictly after the watermark (Spark rejects a
    * timeout at or before it — a user whose newest event is already
    * older than watermark-minus-ttl times out at the next possible
    * point). Callers pass the max event time seen ACROSS ALL batches
    * (held in state), never just the current batch's max, so the
    * timeout is monotone and late batches cannot shorten a live user's
    * TTL. */
  private def armTimeout[S](state: GroupState[S], maxEventMs: Long,
      ttlMs: Long): Unit =
    state.setTimeoutTimestamp(
      math.max(maxEventMs + ttlMs, state.getCurrentWatermarkMs() + 1))

  /** Streaming cohort retention — the incremental form of q_retention:
    * per-user state holds the FIRST-activity week (the cohort) and the
    * emitted weeks as a bitset, so each (user, week) activity fact flows
    * downstream exactly once; `groupBy(cohort, week_k).count()` is the
    * live retention triangle. Late events from before a user's known
    * cohort cannot rewind it (same late-row contract as the funnel —
    * the batch q_retention is the exact reference). With the default
    * TTL the input gets `withWatermark(ts, ttl)` and state is evicted
    * on EVENT time, so a replay evicts at the same points. */
  def weeklyRetention(spark: SparkSession, events: DataFrame,
      ttl: Option[String] = Some(DefaultTtl)): Dataset[WeekActive] = {
    import spark.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    val ttlMs = ttl.map(ttlMillis)
    val src = ttl.fold(events)(d => events.withWatermark("ts", d))
    src
      .select(col("user_id").cast("long"),
        unix_seconds(date_trunc("week", col("ts")).cast("timestamp")).as("w"),
        // cohort label rendered HERE so it follows the session timezone
        // exactly like the batch q_retention's date_format path
        date_format(date_trunc("week", col("ts")), "yyyy-MM-dd").as("wl"),
        // the RAW watermarked column must reach the stateful operator —
        // a derived projection drops the event-time metadata and Spark
        // rejects EventTimeTimeout without it
        col("ts"))
      .filter(col("user_id").isNotNull && col("w").isNotNull)
      .as[(Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (user: Long, rows: Iterator[(Long, Long, String, java.sql.Timestamp)],
         state: GroupState[RetentionState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val batch = rows.toSeq
            val (st0, fresh) = advanceRetention(state.getOption,
              batch.map(r => (r._2, r._3)))
            val st = st0.copy(maxTs =
              math.max(st0.maxTs, batch.map(_._4.getTime).max))
            state.update(st)
            ttlMs.foreach(armTimeout(state, st.maxTs, _))
            fresh.iterator.map(k => WeekActive(user, st.label, k))
          }
      }
  }

  /** Transform an event stream (user_id, event_type, ts) into the
    * stream of stage completions for the ordered `stages` list. */
  def stageTransitions(spark: SparkSession, events: DataFrame,
      stages: Seq[String],
      ttl: Option[String] = Some(DefaultTtl)): Dataset[Transition] = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    import spark.implicits._
    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    val ttlMs = ttl.map(ttlMillis)
    val src = ttl.fold(events)(d => events.withWatermark("ts", d))
    src
      .select(col("user_id").cast("long"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("t"),
        col("ts")) // raw watermarked column, see weeklyRetention
      .filter(col("user_id").isNotNull && col("event_type").isNotNull &&
        col("t").isNotNull)
      .as[(Long, String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf) {
        (user: Long, rows: Iterator[(Long, String, Long, java.sql.Timestamp)],
         state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle user: funnel abandoned, state reclaimed
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
            val out = Seq.newBuilder[Transition]
            // intra-batch disorder handled by sorting on event time;
            // ties advance in stage order (deterministic)
            val batch = rows.toSeq
            batch.sortBy(_._3).foreach { case (_, tpe, t, _) =>
              if (st.stage < stages.size && tpe == stages(st.stage) &&
                  t > st.lastTs) {
                st = FunnelState(st.stage + 1, t, st.maxTs)
                out += Transition(user, st.stage, t)
              }
            }
            st = st.copy(maxTs = math.max(st.maxTs, batch.map(_._3).max))
            state.update(st)
            ttlMs.foreach(armTimeout(state, st.maxTs / 1000L, _))
            out.result().iterator
          }
      }
  }
}
