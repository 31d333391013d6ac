package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via `KeyValueGroupedDataset
  * .flatMapGroupsWithState` — the typed arbitrary-state API (the builder
  * contract's named streaming extension; SURVEY §2.9).
  *
  * Semantics: per-user session windows closed by an inactivity gap.
  * State is one open-session aggregate per user (constant size — never
  * the event list), so streaming state grows with |active users|, not
  * event volume.
  *
  * Batch/stream duality: on a batch Dataset each group is processed once
  * and every session (incl. the trailing one) is emitted; on a stream the
  * trailing open session stays in GroupState with an event-time timeout of
  * `gap` past the last event, emitting when the watermark passes it.
  * The batch path is oracle-checked (q45) against the classic SQL
  * gaps-and-islands formulation — same output, two very different
  * execution models.
  */
object Sessionize {

  final case class Ev(user_id: Long, event_id: Long, ts: Timestamp,
      value: Double)

  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Int, total_value: Double)

  private def merged(cur: Session, e: Ev): Session =
    Session(cur.user_id, cur.session_start, e.ts, cur.n_events + 1,
      cur.total_value + e.value)

  private def fresh(e: Ev): Session =
    Session(e.user_id, e.ts, e.ts, 1, e.value)

  def sessions(ds: Dataset[Ev], gapMinutes: Int): Dataset[Session] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60000L
    val streaming = ds.isStreaming

    def fn(uid: Long, it: Iterator[Ev], state: GroupState[Session])
        : Iterator[Session] = {
      if (state.hasTimedOut) {
        val open = state.get
        state.remove()
        Iterator.single(open)
      } else {
        // ts is the session key; event_id breaks exact-timestamp ties so
        // fold order (and thus total accumulation) is deterministic.
        val incoming = it.toVector.sortBy(e => (e.ts.getTime, e.event_id))
        var closed = Vector.empty[Session]
        var open: Option[Session] = state.getOption
        incoming.foreach { e =>
          open = open match {
            case Some(cur) if e.ts.getTime - cur.session_end.getTime <= gapMs =>
              Some(merged(cur, e))
            case Some(cur) =>
              closed :+= cur
              Some(fresh(e))
            case None => Some(fresh(e))
          }
        }
        if (streaming) {
          open.foreach { cur =>
            state.update(cur)
            state.setTimeoutTimestamp(cur.session_end.getTime + gapMs)
          }
          closed.iterator
        } else {
          (closed ++ open).iterator
        }
      }
    }

    val timeout =
      if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[Session, Session](OutputMode.Append, timeout)(fn)
  }

  /** DataFrame adapter over the events table shape. */
  def sessionsDf(events: DataFrame, gapMinutes: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    sessions(
      events.select(col("user_id"), col("event_id"), col("ts"), col("value"))
        .as[Ev],
      gapMinutes).toDF()
  }
}
