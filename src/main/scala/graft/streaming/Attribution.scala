package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** `value` is an Option so a dirty feed's NULL purchase values flow
  * through the typed encoder (the batch join carries them as NULL). */
final case class AttrEvent(user_id: Long, ts: Timestamp, event_id: Long,
                           event_type: String, value: Option[Double])

/** One row per purchase: its touch counts inside the trailing horizon —
  * the pre-aggregation table `q_events_attribution` divides credit
  * from. `value` passes through untouched (NULL stays NULL). */
final case class AttrOut(purchase_id: Long, user_id: Long, ts: Timestamp,
                         value: Option[Double], n_view: Long, n_click: Long)

/** Per-user touch buffer: (micros, isView) pairs inside the horizon. */
final case class AttrState(touches: List[(Long, Boolean)])

/** Streaming multi-touch attribution — the streaming twin of
  * `q_events_attribution`'s per-purchase join: each purchase is emitted
  * the moment it arrives, carrying the user's view/click touch counts
  * from the preceding hour, via `flatMapGroupsWithState` whose per-user
  * state is ONLY the touches inside the horizon (bounded by per-user
  * touch rate × horizon, pruned on every fold — the Rolling contract).
  *
  * Semantics mirror the batch join exactly: a touch counts iff
  * `t − horizon ≤ touch_ts < t` (strictly before the purchase — a
  * same-microsecond touch never counts, so intra-tick order is
  * irrelevant and purchases read the pre-tick state). Within a
  * micro-batch events fold in (micros, event_id) order; across batches
  * the contract assumes per-user event-time order (late data is the
  * batch join's to replay — the Enrich convention). */
object Attribution {

  private def micros(ts: Timestamp): Long = {
    if (ts == null) throw new IllegalArgumentException(
      "Attribution: event ts must be non-null — an event-time fold cannot order a null timestamp")
    ts.getTime * 1000 + (ts.getNanos / 1000) % 1000
  }

  /** Fold one user's batch into emitted purchase rows + advanced state. */
  def foldAttr(events: Seq[AttrEvent], st: Option[AttrState],
               horizonUs: Long = 3600000000L): (Seq[AttrOut], AttrState) = {
    var touches = st.map(_.touches).getOrElse(Nil)
    val out = Seq.newBuilder[AttrOut]
    val byTick = events.sortBy(e => (micros(e.ts), e.event_id))
      .groupBy(e => micros(e.ts)).toSeq.sortBy(_._1)
    byTick.foreach { case (t, tick) =>
      // purchases read the PRE-tick buffer (strictly-before rule)
      tick.filter(_.event_type == "purchase").foreach { p =>
        val live = touches.filter(x => x._1 >= t - horizonUs && x._1 < t)
        out += AttrOut(p.event_id, p.user_id, p.ts, p.value,
          live.count(_._2).toLong, live.count(!_._2).toLong)
      }
      touches = (touches ++ tick.collect {
        case e if e.event_type == "view" => (t, true)
        case e if e.event_type == "click" => (t, false)
      }).filter(_._1 >= t - horizonUs)
    }
    (out.result(), AttrState(touches))
  }

  /** Streaming form: append-mode per-purchase touch counts on arrival.
    *
    * State eviction: event-time timeout at (last touch + horizon) — once
    * the watermark passes that point no future purchase can count any
    * retained touch, so the user's entry is dropped. Idle users
    * therefore cost state only for one horizon past their last touch,
    * keeping total state bounded by (active users × touch rate ×
    * horizon) rather than all users ever seen. */
  def attrStream(spark: SparkSession, events: Dataset[AttrEvent],
                 horizonUs: Long = 3600000000L): Dataset[AttrOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AttrState, AttrOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, it: Iterator[AttrEvent], state: GroupState[AttrState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastTouch + horizon: no future purchase
            // can see these touches — evict.
            state.remove()
            Iterator.empty
          } else {
            val (out, next) = foldAttr(it.toSeq, state.getOption, horizonUs)
            if (next.touches.isEmpty) state.remove()
            else {
              state.update(next)
              val lastTouchMs = next.touches.map(_._1).max / 1000
              val expireMs = lastTouchMs + horizonUs / 1000 + 1
              // setTimeoutTimestamp must stay ahead of the watermark
              state.setTimeoutTimestamp(
                math.max(expireMs, state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  /** Batch reference over a typed Dataset (same fold). */
  def attrBatch(spark: SparkSession, events: Dataset[AttrEvent],
                horizonUs: Long = 3600000000L): Dataset[AttrOut] = {
    import spark.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (_, it) =>
      foldAttr(it.toSeq, None, horizonUs)._1.iterator
    }
  }
}
