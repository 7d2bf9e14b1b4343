package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)

final case class Conversion(user_id: Long, signup_ts: Timestamp,
                            first_purchase_ts: Timestamp, us_to_convert: Long)

/** (earliest signup micros or Long.MaxValue, already emitted) */
final case class FunnelState(signupUs: Long, converted: Boolean)

/** Streaming signup→purchase funnel — the streaming twin of
  * `q_events_funnel` (reference semantics: earliest signup, then the
  * first purchase at or after it). A conversion is emitted the moment
  * the first qualifying purchase arrives; users who never convert
  * emit nothing (the batch query reports them with a NULL purchase —
  * parity is asserted on the converted set).
  *
  * Determinism: per micro-batch, events fold in (micros, is-purchase)
  * order, so a same-instant signup+purchase converts (ts >= signup —
  * matching the batch SQL's inequality) regardless of arrival order
  * within the batch. With in-event-time-order feeding the emitted set
  * equals the batch fold exactly (StreamingSpec asserts).
  *
  * Scale: state is 17 bytes per user — the standing conversion table
  * any funnel system maintains; it is NOT watermark-bounded (a user
  * may convert years after signup), so the state store grows with
  * user cardinality, not stream length. Callers who want a bounded
  * conversion window set an EventTimeTimeout at signup time instead.
  */
object Funnel {

  private def micros(ts: Timestamp): Long = {
    if (ts == null) throw new IllegalArgumentException(
      "Funnel: event ts must be non-null — an event-time fold cannot order a null timestamp")
    ts.getTime * 1000 + (ts.getNanos / 1000) % 1000
  }

  /** Micros → Timestamp WITHOUT dropping the sub-millisecond part (the
    * events table is microsecond-resolution; `new Timestamp(us/1000)`
    * alone would truncate to ms and break parity with the SQL form).
    * floorDiv/floorMod, not / and %: a pre-epoch position must keep a
    * non-negative sub-second part or setNanos throws. */
  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Fold one user's events (any order) into an optional newly-emitted
    * conversion plus the advanced state. */
  def foldFunnel(events: Seq[FunnelEvent], st: Option[FunnelState]):
      (Option[Conversion], FunnelState) = {
    val sorted = events.sortBy(e => (micros(e.ts), e.event_type == "purchase"))
    var state = st.getOrElse(FunnelState(Long.MaxValue, converted = false))
    var out: Option[Conversion] = None
    sorted.foreach { e =>
      val t = micros(e.ts)
      e.event_type match {
        case "signup" if t < state.signupUs =>
          state = state.copy(signupUs = t)
        case "purchase" if !state.converted && t >= state.signupUs =>
          out = Some(Conversion(e.user_id, toTs(state.signupUs),
            toTs(t), t - state.signupUs))
          state = state.copy(converted = true)
        case _ => ()
      }
    }
    (out, state)
  }

  /** Streaming form: append-mode conversions as they happen. */
  def funnelStream(spark: SparkSession, events: Dataset[FunnelEvent]): Dataset[Conversion] = {
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, Conversion](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          val (out, next) = foldFunnel(it.toSeq, state.getOption)
          state.update(next)
          out.iterator
      }
  }

  /** Batch reference over a typed Dataset (same fold; converted users
    * only — the SQL form's non-NULL rows). */
  def funnelBatch(spark: SparkSession, events: Dataset[FunnelEvent]): Dataset[Conversion] = {
    import spark.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (_, it) =>
      foldFunnel(it.toSeq, None)._1.iterator
    }
  }
}
