package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class EwmaEvent(user_id: Long, ts: Timestamp, event_id: Long, value: Double)

final case class EwmaOut(user_id: Long, event_id: Long, ts: Timestamp, ewma: Double)

/** Per-user history of the last `Lags − 1` scale-6 values, most recent
  * first — CONSTANT-size state (15 longs per user, ~the smallest state
  * a stateful operator can carry). */
final case class EwmaState(recent: List[Long])

/** Streaming exponential smoothing — the streaming twin of
  * `q_events_ewma` (α = 1/2 decayed moving average over the last 16
  * events, normalized by the present-weight sum): every event is
  * emitted the moment it arrives carrying the user's smoothed value,
  * via `flatMapGroupsWithState` whose per-user state is the last 15
  * quantized values.
  *
  * Arithmetic mirrors the batch side's decimal contract bit-for-bit:
  * values quantize to scale-6 decimals (the DECIMAL(18,6) cast),
  * weights 0.5^k are exact scale-15 decimals, term products are exact
  * (scale 21), the numerator rounds to 6dp before ONE decimal→double
  * conversion, and the final quotient re-rounds to 6dp — so streamed
  * rows equal the batch window's rows exactly, not approximately.
  *
  * Determinism/parity contract (the Rolling convention): within a
  * micro-batch a user's events fold in (micros, event_id) order, so
  * intra-batch arrival order never matters; ACROSS batches the
  * contract assumes per-user event-time order (the batch window is the
  * replayable source of truth for late data).
  *
  * Scale: state per user is 15 longs — constant, not rate- or
  * horizon-bounded. No timeout is set DELIBERATELY: the lag window is
  * count-based, so no amount of idle time makes a user's history
  * irrelevant — evicting it would restart the smoother on return,
  * changing semantics. Total state is O(#users) × ~200 bytes; a
  * deployment that caps the user universe below that budget adds an
  * EventTimeTimeout at its own retention horizon. */
object Ewma {

  /** Lag terms the EWMA unrolls — must match q_events_ewma's EwmaLags
    * (α^16 < 2e-5, below the 6dp emit precision). */
  val Lags = 16

  private def micros(ts: Timestamp): Long =
    ts.getTime * 1000 + (ts.getNanos / 1000) % 1000

  /** value → exact scale-6 long (the batch DECIMAL(18,6) cast). */
  private def v6(v: Double): Long =
    new java.math.BigDecimal(v).setScale(6, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  /** 0.5^k as the exact scale-15 decimal the batch side casts to. */
  private val wk: IndexedSeq[java.math.BigDecimal] = (0 until Lags).map(k =>
    new java.math.BigDecimal(0.5).pow(k).setScale(15))

  /** Fold one user's batch (any order) into emitted rows + advanced
    * state. */
  def foldEwma(events: Seq[EwmaEvent], st: Option[EwmaState]): (Seq[EwmaOut], EwmaState) = {
    var recent = st.map(_.recent).getOrElse(Nil)
    val out = Seq.newBuilder[EwmaOut]
    events.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
      val window = v6(e.value) :: recent // k = 0 is the current event
      var num = java.math.BigDecimal.ZERO
      var den = java.math.BigDecimal.ZERO
      window.iterator.zipWithIndex.foreach { case (v, k) =>
        num = num.add(java.math.BigDecimal.valueOf(v, 6).multiply(wk(k)))
        den = den.add(wk(k))
      }
      // one 6dp numerator round + one decimal→double conversion per
      // side of the quotient, exactly as the batch emission does
      val ewma = graft.util.D.rDriver(
        num.setScale(6, java.math.RoundingMode.HALF_UP).doubleValue / den.doubleValue)
      out += EwmaOut(e.user_id, e.event_id, e.ts, ewma)
      recent = window.take(Lags - 1)
    }
    (out.result(), EwmaState(recent))
  }

  /** Streaming form: append-mode smoothed values as each event arrives. */
  def ewmaStream(spark: SparkSession, events: Dataset[EwmaEvent]): Dataset[EwmaOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[EwmaEvent], state: GroupState[EwmaState]) =>
          val (out, next) = foldEwma(it.toSeq, state.getOption)
          state.update(next)
          out.iterator
      }
  }

  /** Batch reference over a typed Dataset (same fold). */
  def ewmaBatch(spark: SparkSession, events: Dataset[EwmaEvent]): Dataset[EwmaOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (_, it) =>
      foldEwma(it.toSeq, None)._1.iterator
    }
  }
}
