package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.functions.OracleSafe._

/** Structured Streaming shapes for the incremental behaviors in SURVEY
  * §2.7. Every transform here is plan-identical between a batch frame
  * and a `readStream` frame — the specs run them on MemoryStream and
  * the registry runs the batch equivalent, which is exactly Spark's
  * unified-engine contract.
  */
object EventStreams {

  /** Tumbling event-time window counts with lateness tolerance. On a
    * streaming input the watermark bounds state; on batch it's a no-op.
    */
  def tumblingCounts(events: DataFrame, windowLen: String,
                     watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Stateful dedup-on-ingest (S5's streaming form): one row per id,
    * watermark-bounded state.
    */
  def streamingDedup(events: DataFrame, watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicates("event_id")

  /** Content dedup with a bounded state TTL:
    * `dropDuplicatesWithinWatermark` guarantees dedup of any two rows
    * whose event times land inside the watermark delay of each other,
    * while letting the state store EVICT keys once the watermark
    * passes them. Plain `dropDuplicates(key)` on a key column that is
    * not the watermark column keeps state forever — the unbounded-
    * state leak that kills a 100 TB ingest; this form is the
    * scale-safe default when duplicates arrive close in time (retry
    * storms, at-least-once sources).
    */
  def streamingDedupTtl(events: DataFrame, keyCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCol)

  case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class UserTotal(user_id: Long, total: Double, n: Long, alert: Boolean)

  /** Custom per-key state the built-in aggregates can't express:
    * running per-user totals emitted on every event, with an alert flag
    * once the lifetime total crosses `alertAt`. State survives across
    * micro-batches in the state store; events within a batch are
    * applied in (ts, value) order for determinism.
    */
  def runningTotals(events: Dataset[UserEvent], alertAt: Double): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Double, Long), UserTotal](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[UserEvent], state: GroupState[(Double, Long)]) =>
          val (t0, n0) = state.getOption.getOrElse((0.0, 0L))
          var t = t0
          var n = n0
          val out = it.toSeq.sortBy(e => (e.ts.getTime, e.value)).map { e =>
            t += e.value; n += 1
            UserTotal(uid, t, n, t >= alertAt)
          }
          state.update((t, n))
          out.iterator
      }
  }

  case class TotalState(total: Double, n: Long)

  /** [[runningTotals]] on the Spark-4 arbitrary-stateful API
    * (`transformWithState` / state v2): a [[StatefulProcessor]] with a
    * named [[ValueState]] replaces the GroupState closure. Semantics
    * are IDENTICAL to the flatMapGroupsWithState form (spec-pinned
    * batch-for-batch) — what the new API buys at scale is operational:
    * typed named state vars a future version can add to without a
    * state-format break, per-state TTL configs enforced by the store
    * itself (no timeout plumbing in user code), event/processing-time
    * timers decoupled from data arrival, and first-class RocksDB
    * backing (the API REQUIRES the RocksDB provider — the off-heap
    * backend a 100 TB ingest runs anyway, per RocksDbStateSpec).
    */
  def runningTotalsTws(events: Dataset[UserEvent], alertAt: Double): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalProcessor(alertAt),
        TimeMode.None(), OutputMode.Append())
  }

  /** Per-user running-total processor: one ValueState slot per key,
    * in-batch rows applied in (ts, value) order — the same determinism
    * rule as the GroupState form.
    */
  class RunningTotalProcessor(alertAt: Double)
      extends StatefulProcessor[Long, UserEvent, UserTotal] {
    @transient private var state: ValueState[TotalState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TotalState]("totals",
        Encoders.product[TotalState], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[UserEvent],
        timers: TimerValues): Iterator[UserTotal] = {
      val prev = if (state.exists()) state.get() else TotalState(0.0, 0L)
      var t = prev.total
      var n = prev.n
      val out = rows.toSeq.sortBy(e => (e.ts.getTime, e.value)).map { e =>
        t += e.value; n += 1
        UserTotal(uid, t, n, t >= alertAt)
      }
      state.update(TotalState(t, n))
      out.iterator
    }
  }

  /** Stream–stream inner join with an event-time bound: each click
    * attributes to any view by the same user within `window` BEFORE
    * it. Watermarks on both sides plus the time-range condition let
    * the state store evict matched-out rows — the bounded-state
    * contract a stream–stream join needs at scale (without the bound,
    * both sides' state grows without limit). Inner-join matches emit
    * as soon as both sides arrive; plan-identical to the batch join.
    */
  def attributionJoin(views: DataFrame, clicks: DataFrame,
                      window: String = "1 hour",
                      watermarkDelay: String = "2 hours"): DataFrame = {
    val v = views.withWatermark("view_ts", watermarkDelay)
    val c = clicks.withWatermark("click_ts", watermarkDelay)
    v.join(c,
      v("user_id") === c("user_id") &&
        c("click_ts") >= v("view_ts") &&
        c("click_ts") <= v("view_ts") + expr(s"INTERVAL $window"))
      .select(v("view_id"), c("click_id"), v("user_id"))
  }

  /** Left-outer form of [[attributionJoin]]: every view eventually
    * emits — matched rows as soon as both sides arrive, UNMATCHED
    * views once the watermark passes their join window (the state
    * store can then prove no future click can match, evicts the row,
    * and emits it with a null click). This is the "conversion OR
    * abandonment" feed; the outer side is only correct BECAUSE the
    * watermark bounds it — an unbounded outer join would never know
    * when to give up on a row.
    */
  def attributionJoinLeftOuter(views: DataFrame, clicks: DataFrame,
                               window: String = "1 hour",
                               watermarkDelay: String = "2 hours"): DataFrame = {
    val v = views.withWatermark("view_ts", watermarkDelay)
    val c = clicks.withWatermark("click_ts", watermarkDelay)
    v.join(c,
      v("user_id") === c("user_id") &&
        c("click_ts") >= v("view_ts") &&
        c("click_ts") <= v("view_ts") + expr(s"INTERVAL $window"),
      "left_outer")
      .select(v("view_id"), c("click_id"), v("user_id"))
  }

  /** Gap-based sessionization via `session_window` — merged state on a
    * stream, a plain aggregation on batch. A new session starts when
    * the gap to the previous event is ≥ `gap`.
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", gap)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), decSum(col("value")).as("total_value"))
      .select(
        col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        col("n_events"), col("total_value"))
}
