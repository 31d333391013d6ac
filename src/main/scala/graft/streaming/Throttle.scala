package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming greedy cooldown dedup — the stateful counterpart of
  * `Timeseries.cooldownDedup` (qA4): per (user, type) key, emit an event
  * only if at least `cooldown` has elapsed since the last EMITTED event.
  *
  * State is one long per key (the last kept event-time in micros) — never
  * an event list — and it self-expires on an event-time timeout of
  * `cooldown` past the last kept event: once the cooldown has fully
  * elapsed, "no state" and "state older than cooldown" decide
  * identically (the next event is kept either way), so expiry is
  * semantically free. Streaming state is therefore bounded by |keys
  * active within one cooldown window|, not |keys ever seen|.
  *
  * Batch/stream duality: on a batch Dataset each group is processed once
  * in (ts, id) order — exactly the greedy fold qA4's oracle checks. On a
  * stream, events are folded in per-micro-batch (ts, id) order; arrivals
  * later than the last kept timestamp minus cooldown are judged against
  * the same state, so a replay in event-time order reproduces the batch
  * output (InfraSpec asserts this agreement).
  */
object Throttle {

  final case class Ev(user_id: Long, event_type: String, ts: Timestamp,
      event_id: Long)

  /** Event time in exact integer microseconds — the same grain
    * `Timeseries.cooldownDedup` folds on, so batch and stream agree to
    * the microsecond (ms truncation could flip a boundary decision).
    */
  private def tsMicros(ts: Timestamp): Long =
    // floorDiv: getTime truncates toward zero but getNanos is always
    // non-negative, so pre-epoch instants need floor semantics to land
    // on the same micros grain as unix_micros
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos.toLong / 1000L

  def keptEvents(ds: Dataset[Ev], cooldownSec: Long): Dataset[Ev] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val cdUs = cooldownSec * 1000000L
    val streaming = ds.isStreaming

    def fn(key: (Long, String), it: Iterator[Ev], state: GroupState[Long])
        : Iterator[Ev] = {
      if (state.hasTimedOut) {
        state.remove() // past-cooldown state decides like no state
        Iterator.empty
      } else {
        val incoming = it.toVector.sortBy(e => (tsMicros(e.ts), e.event_id))
        var last: Option[Long] = state.getOption
        var kept = Vector.empty[Ev]
        incoming.foreach { e =>
          val t = tsMicros(e.ts)
          if (last.forall(l => t - l >= cdUs)) {
            kept :+= e
            last = Some(t)
          }
        }
        if (streaming) last.foreach { l =>
          state.update(l)
          // a key whose cooldown already expired per the watermark gets
          // watermark+1 (Spark rejects timeouts behind the watermark);
          // its state is decision-free at that point anyway
          state.setTimeoutTimestamp(math.max(l / 1000L + cdUs / 1000L,
            state.getCurrentWatermarkMs() + 1L))
        }
        kept.iterator
      }
    }

    val timeout =
      if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[Long, Ev](OutputMode.Append, timeout)(fn)
  }

  /** DataFrame adapter over the events table shape. */
  def keptEventsDf(events: DataFrame, cooldownSec: Long): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    keptEvents(
      events.select(col("user_id"), col("event_type"), col("ts"),
        col("event_id")).as[Ev],
      cooldownSec).toDF()
  }
}
