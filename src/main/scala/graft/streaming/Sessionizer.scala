package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event record for sessionization (events table shape). */
final case class SessionEvent(user_id: Long, ts: Timestamp, value: Double)

/** Emitted session (same semantics as the batch q_events_sessionize). */
final case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
                         n_events: Long, total_value: Double)

/** Open-session state kept per user between micro-batches. */
final case class SessionState(start: Long, last: Long, n: Long, total: Double)

/** Structured Streaming sessionizer (SURVEY.md §2.7): 30-minute-gap
  * sessions via `flatMapGroupsWithState` with event-time timeout, sharing
  * semantics with the batch `q_events_sessionize` query.
  *
  * Scale: state is one small record per active user, bounded by the
  * watermark + gap timeout; the only shuffle is the groupByKey on
  * user_id.
  */
object Sessionizer {

  val GapUs: Long = 30L * 60 * 1000000

  private def micros(ts: Timestamp): Long = ts.getTime * 1000 + (ts.getNanos / 1000) % 1000

  /** Fold sorted events of one user into closed sessions + open state. */
  def foldEvents(events: Seq[SessionEvent], open: Option[SessionState]):
      (Seq[Session], Option[SessionState]) = {
    val sorted = events.sortBy(e => micros(e.ts))
    var state = open
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val t = micros(e.ts)
      state match {
        case Some(s) if t - s.last <= GapUs =>
          state = Some(SessionState(s.start, math.max(s.last, t), s.n + 1, s.total + e.value))
        case Some(s) =>
          closed += toSession(e.user_id, s)
          state = Some(SessionState(t, t, 1, e.value))
        case None =>
          state = Some(SessionState(t, t, 1, e.value))
      }
    }
    (closed.result(), state)
  }

  private def toSession(userId: Long, s: SessionState): Session =
    Session(userId, new Timestamp(s.start / 1000), new Timestamp(s.last / 1000), s.n, s.total)

  /** Streaming sessionization: emits a session once the 30-min gap elapses
    * past the watermark. */
  def sessionizeStream(spark: SparkSession, events: Dataset[SessionEvent]): Dataset[Session] = {
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(s => toSession(userId, s))
            state.remove()
            out.iterator
          } else {
            val (closed, open) = foldEvents(it.toSeq, state.getOption)
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last / 1000 + GapUs / 1000)
            }
            closed.iterator
          }
      }
  }

  /** Batch reference implementation over a typed Dataset (same fold). */
  def sessionizeBatch(spark: SparkSession, events: Dataset[SessionEvent]): Dataset[Session] = {
    import spark.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (uid, it) =>
      val (closed, open) = foldEvents(it.toSeq, None)
      (closed ++ open.map(s => toSession(uid, s))).iterator
    }
  }
}
