package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event record for sessionization (events table shape). `value` is an
  * Option so a dirty feed's NULL values flow through the typed encoder
  * instead of dying in it — the batch query's null-skipping sum is the
  * semantics to mirror. */
final case class SessionEvent(user_id: Long, ts: Timestamp, value: Option[Double])

/** Emitted session (same semantics as the batch q_events_sessionize).
  * `total_value` is None when every value in the session was NULL-cast
  * (NaN/±Inf/NULL) — the batch DECIMAL sum's NULL, never 0.0. */
final case class Session(user_id: Long, session_start: Timestamp, session_end: Timestamp,
                         n_events: Long, total_value: Option[Double])

/** Open-session state kept per user between micro-batches. `totalU` is
  * the running sum as an exact scale-6 unscaled long (the batch
  * DECIMAL(25,6) arithmetic — a plain double accumulator would drift
  * from the SQL window by FP error); `hasVal` distinguishes an all-NULL
  * session from a zero-sum one. */
final case class SessionState(start: Long, last: Long, n: Long, totalU: Long, hasVal: Boolean)

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

  private def micros(ts: Timestamp): Long = {
    if (ts == null) throw new IllegalArgumentException(
      "Sessionizer: event ts must be non-null — an event-time fold cannot order a null timestamp")
    ts.getTime * 1000 + (ts.getNanos / 1000) % 1000
  }

  /** value → exact scale-6 long, mirroring the batch DECIMAL(25,6)
    * cast's measured edges: NULL/NaN/±Inf → None (no sum term; the row
    * still counts in n_events, as the batch COUNT(*) does). Values past
    * the scale-6 LONG envelope (~4.6e12) fail loud rather than wrap —
    * the Rolling convention; the batch window covers the wider range. */
  private def v6(v: Option[Double]): Option[Long] = v.flatMap { d =>
    if (d.isNaN || d.isInfinite) None
    else {
      val u = java.math.BigDecimal.valueOf(d)
        .setScale(6, java.math.RoundingMode.HALF_UP).unscaledValue()
      if (u.bitLength > 62) throw new IllegalArgumentException(
        s"Sessionizer: value $d exceeds the streaming scale-6 long envelope (|v| <= ~4.6e12); " +
          "replay through the batch q_events_sessionize window (DECIMAL(25,6)) instead")
      Some(u.longValue)
    }
  }

  private def addVal(s: SessionState, v: Option[Long]): (Long, Boolean) = v match {
    case Some(u) =>
      try (math.addExact(s.totalU, u), true)
      catch { case _: ArithmeticException =>
        throw new ArithmeticException(
          "Sessionizer: session total overflows the scale-6 long accumulator; " +
            "replay through the batch q_events_sessionize (widening DECIMAL sum) instead")
      }
    case None => (s.totalU, s.hasVal)
  }

  /** Fold sorted events of one user into closed sessions + open state. */
  def foldEvents(events: Seq[SessionEvent], open: Option[SessionState]):
      (Seq[Session], Option[SessionState]) = {
    val sorted = events.sortBy(e => micros(e.ts))
    var state = open
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      val t = micros(e.ts)
      val u = v6(e.value)
      state match {
        case Some(s) if t - s.last <= GapUs =>
          val (nt, hv) = addVal(s, u)
          state = Some(SessionState(s.start, math.max(s.last, t), s.n + 1, nt, hv))
        case Some(s) =>
          closed += toSession(e.user_id, s)
          state = Some(SessionState(t, t, 1, u.getOrElse(0L), u.isDefined))
        case None =>
          state = Some(SessionState(t, t, 1, u.getOrElse(0L), u.isDefined))
      }
    }
    (closed.result(), state)
  }

  /** Micros → Timestamp WITHOUT dropping the sub-millisecond part (the
    * Funnel convention — `new Timestamp(us / 1000)` alone would emit
    * session bounds truncated to ms where the batch MIN(ts)/MAX(ts)
    * carry full microseconds). */
  private def toTs(us: Long): Timestamp = {
    // floorDiv/floorMod, not / and %: a pre-epoch position must keep a
    // non-negative sub-second part or setNanos throws
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  private def toSession(userId: Long, s: SessionState): Session =
    Session(userId, toTs(s.start), toTs(s.last), s.n,
      if (s.hasVal) Some(java.math.BigDecimal.valueOf(s.totalU, 6).doubleValue) else None)

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
