package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class RollingEvent(user_id: Long, ts: Timestamp, event_id: Long, value: Double)

final case class RollingOut(event_id: Long, user_id: Long, ts: Timestamp,
                            n_1h: Long, sum_1h: Double)

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

  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000 + (ts.getNanos / 1000) % 1000

  /** value → exact scale-6 long (the batch side's DECIMAL(25,6) cast
    * keeps 6 fractional digits; summing the quantized longs is the same
    * exact arithmetic). valueOf, not `new BigDecimal`: Spark's
    * double→decimal cast uses Double.toString shortest-decimal
    * semantics, and the exact-binary-expansion constructor can round a
    * HALF_UP half-boundary the other way (see streaming.Ewma.v6). */
  private def v6(v: Double): Long =
    java.math.BigDecimal.valueOf(v).setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

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
      items = (items ++ tick.map(e => (t, v6(e.value)))).filter(_._1 >= t - horizonUs)
      val n = items.size.toLong
      // one correctly-rounded decimal→double conversion, as the batch
      // side's DECIMAL(25,6)→DOUBLE emission does
      val sum = java.math.BigDecimal.valueOf(items.map(_._2).sum, 6).doubleValue
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
