package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** `value` is an Option so a dirty feed's NULL values flow through the
  * typed encoder: a NULL value counts in n_1h (the batch COUNT(*)) and
  * contributes no sum term (the batch null-skipping SUM). */
final case class RollingEvent(user_id: Long, ts: Timestamp, event_id: Long, value: Option[Double])

final case class RollingOut(event_id: Long, user_id: Long, ts: Timestamp,
                            n_1h: Long, sum_1h: Option[Double])

/** Per-user buffer of (micros, scale-6 value) pairs inside the trailing
  * horizon — TIME-horizon-bounded (one hour of that user's events), not
  * history-bounded. */
final case class RollingState(items: List[(Long, Long)])

/** Streaming trailing-time window — the streaming twin of
  * `q_rolling_time` (pandas rolling(on=time)): every purchase is emitted
  * the moment it arrives, carrying the user's trailing 1-hour count and
  * exact decimal sum, via `flatMapGroupsWithState` whose per-user state
  * is only the events INSIDE the horizon.
  *
  * Semantics mirror the batch `rangeBetween(-horizonUs, currentRow)`
  * window exactly, including the RANGE frame's peer rule: rows at the
  * SAME microsecond are peers, so each same-instant event counts the
  * others — the fold ingests a whole same-micros tick before emitting
  * any of its rows.
  *
  * Determinism/parity contract (the Enrich convention): within a
  * micro-batch events fold in (micros, event_id) order, so intra-batch
  * arrival order never matters; ACROSS batches the contract assumes
  * per-user event-time order, and same-micros peers must arrive in one
  * batch (an equal-timestamp peer in a later batch cannot retro-update
  * an emitted row in append mode — the batch window is the replayable
  * source of truth for late data).
  *
  * Scale: state per user is the trailing hour's (long, long) pairs —
  * bounded by per-user event RATE × horizon, pruned on every fold;
  * values enter as exact scale-6 longs so the emitted sum is
  * bit-identical to the batch DECIMAL(25,6) sum emission. */
object Rolling {

  private def micros(ts: Timestamp): Long = {
    if (ts == null) throw new IllegalArgumentException(
      "Rolling: event ts must be non-null — an event-time fold cannot order a null timestamp")
    ts.getTime * 1000 + (ts.getNanos / 1000) % 1000
  }

  /** value → exact scale-6 long, mirroring the batch DECIMAL(25,6)
    * cast's measured edges (ANSI session): NaN and ±Inf cast to NULL
    * batch-side — here None, a row that still counts in n_1h (the
    * batch COUNT(*) counts it) but contributes no sum term. valueOf,
    * not `new BigDecimal`: Spark's double→decimal cast uses
    * Double.toString shortest-decimal semantics, and the
    * exact-binary-expansion constructor can round a HALF_UP
    * half-boundary the other way (see streaming.Ewma.v6).
    *
    * Envelope: the streaming state quantizes to a scale-6 LONG, so
    * |value| is capped at 2^62·1e-6 ≈ 4.6e12 — narrower than the batch
    * DECIMAL(25,6)'s ~1e19. A value past the long envelope FAILS LOUD
    * (the FixedDot convention: visible, never silently wrong) rather
    * than wrapping; the batch window is the source of truth for the
    * wider range. bitLength > 62, not 63: it keeps Long.MinValue
    * unreachable, so it can serve as the in-state NULL sentinel. */
  private def v6(v: Double): Option[Long] = {
    if (v.isNaN || v.isInfinite) return None
    val u = java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).unscaledValue()
    if (u.bitLength > 62) throw new IllegalArgumentException(
      s"Rolling: value $v exceeds the streaming scale-6 long envelope (|v| <= ~4.6e12); " +
        "replay through the batch q_rolling_time window (DECIMAL(25,6)) instead")
    Some(u.longValue)
  }

  /** In-state sentinel for a NULL-cast (NaN/±Inf) value — unreachable
    * from v6 (the bitLength guard caps magnitudes below it), kept as a
    * plain Long so RollingState stays a flat List[(Long, Long)]. */
  private val NullSlot = Long.MinValue

  /** Fold one user's batch (any order) into emitted rows + advanced
    * state. `horizonUs` is the trailing window in microseconds. */
  def foldRolling(events: Seq[RollingEvent], st: Option[RollingState],
                  horizonUs: Long = 3600000000L): (Seq[RollingOut], RollingState) = {
    var items = st.map(_.items).getOrElse(Nil)
    val out = Seq.newBuilder[RollingOut]
    // same-micros events are RANGE-frame peers: ingest the whole tick,
    // then emit every row of the tick against the full buffer
    val byTick = events.sortBy(e => (micros(e.ts), e.event_id))
      .groupBy(e => micros(e.ts)).toSeq.sortBy(_._1)
    byTick.foreach { case (t, tick) =>
      items = (items ++ tick.map(e => (t, e.value.flatMap(v6).getOrElse(NullSlot))))
        .filter(_._1 >= t - horizonUs)
      val n = items.size.toLong
      // checked accumulation: a wrapped Long sum would be silently
      // wrong where the batch DECIMAL sum just widens — fail loud
      var acc = 0L; var any = false
      try items.foreach { case (_, v) =>
        if (v != NullSlot) { acc = math.addExact(acc, v); any = true }
      } catch { case _: ArithmeticException =>
        throw new ArithmeticException(
          "Rolling: trailing-window sum overflows the scale-6 long accumulator; " +
            "replay through the batch q_rolling_time window (widening DECIMAL sum) instead")
      }
      // an all-NULL (or empty-value) window sums to NULL batch-side,
      // never 0.0; one correctly-rounded decimal→double conversion
      // otherwise, as the batch DECIMAL→DOUBLE emission does
      val sum = if (any) Some(java.math.BigDecimal.valueOf(acc, 6).doubleValue) else None
      tick.foreach(e => out += RollingOut(e.event_id, e.user_id, e.ts, n, sum))
    }
    (out.result(), RollingState(items))
  }

  /** Streaming form: append-mode rolling stats as each event arrives. */
  def rollingStream(spark: SparkSession, events: Dataset[RollingEvent],
                    horizonUs: Long = 3600000000L): Dataset[RollingOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[RollingState, RollingOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[RollingEvent], state: GroupState[RollingState]) =>
          val (out, next) = foldRolling(it.toSeq, state.getOption, horizonUs)
          state.update(next)
          out.iterator
      }
  }

  /** Batch reference over a typed Dataset (same fold). */
  def rollingBatch(spark: SparkSession, events: Dataset[RollingEvent],
                   horizonUs: Long = 3600000000L): Dataset[RollingOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (_, it) =>
      foldRolling(it.toSeq, None, horizonUs)._1.iterator
    }
  }
}
