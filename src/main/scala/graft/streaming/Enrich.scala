package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class AsOfEvent(user_id: Long, ts: Timestamp, event_type: String, event_id: Long)

final case class Enriched(event_id: Long, user_id: Long, ts: Timestamp,
                          last_signup_ts: Option[Timestamp], us_since_signup: Option[Long])

/** Latest signup micros seen so far (Long.MinValue = none). */
final case class AsOfState(signupUs: Long)

/** Streaming as-of enrichment — the streaming twin of `q_asof_join`:
  * every purchase is emitted the moment it arrives, tagged with the
  * latest signup at-or-before it (merge_asof backward,
  * allow_exact_matches). This is the standing enrichment join a serving
  * pipeline runs against a keyed reference stream: the state is ONE long
  * per user (the latest signup position), not a buffered window.
  *
  * Determinism/parity contract: within a micro-batch, events fold in
  * (micros, is-purchase) order, so a same-instant signup+purchase pair
  * matches (ts >= signup ts) regardless of arrival order inside the
  * batch; StreamingSpec asserts microsecond-exact parity with both the
  * typed batch fold and q_asof_join's SQL rows under in-event-time-order
  * feeding. ACROSS batches the contract assumes per-user event-time
  * order (a signup arriving after a purchase already emitted cannot
  * retro-enrich it in append mode — the batch as-of is the replayable
  * source of truth for late data; re-run it over the corrected log).
  *
  * Scale: state is 8 bytes per user — user-cardinality-bounded, not
  * stream-length-bounded; deliberately not watermark-expired (the
  * standing "last signup" table never goes stale by design).
  */
object Enrich {

  private def micros(ts: Timestamp): Long = {
    if (ts == null) throw new IllegalArgumentException(
      "Enrich: event ts must be non-null — an event-time fold cannot order a null timestamp")
    ts.getTime * 1000 + (ts.getNanos / 1000) % 1000
  }

  /** floorDiv/floorMod, not / and %: a pre-epoch position must keep a
    * non-negative sub-second part or setNanos throws. */
  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Fold one user's batch (any order) into the emitted enrichments and
    * the advanced state. */
  def foldAsOf(events: Seq[AsOfEvent], st: Option[AsOfState]):
      (Seq[Enriched], AsOfState) = {
    val sorted = events.sortBy(e => (micros(e.ts), e.event_type == "purchase", e.event_id))
    var state = st.getOrElse(AsOfState(Long.MinValue))
    val out = Seq.newBuilder[Enriched]
    sorted.foreach { e =>
      val t = micros(e.ts)
      e.event_type match {
        case "signup" =>
          if (t > state.signupUs) state = AsOfState(t)
        case "purchase" =>
          // state.signupUs > t only under cross-batch out-of-order data
          // (outside the documented contract): a later signup already
          // folded in. Emitting it would label a FUTURE signup "last
          // signup at-or-before" — degrade to an unmatched row instead,
          // so contract violations are visibly unmatched, never
          // semantically wrong.
          if (state.signupUs == Long.MinValue || state.signupUs > t)
            out += Enriched(e.event_id, e.user_id, e.ts, None, None)
          else
            out += Enriched(e.event_id, e.user_id, e.ts,
              Some(toTs(state.signupUs)), Some(t - state.signupUs))
        case _ => ()
      }
    }
    (out.result(), state)
  }

  /** Streaming form: append-mode enriched purchases as they arrive. */
  def enrichStream(spark: SparkSession, events: Dataset[AsOfEvent]): Dataset[Enriched] = {
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsOfState, Enriched](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[AsOfEvent], state: GroupState[AsOfState]) =>
          val (out, next) = foldAsOf(it.toSeq, state.getOption)
          state.update(next)
          out.iterator
      }
  }

  /** Batch reference over a typed Dataset (same fold). */
  def enrichBatch(spark: SparkSession, events: Dataset[AsOfEvent]): Dataset[Enriched] = {
    import spark.implicits._
    events.groupByKey(_.user_id).flatMapGroups { (_, it) =>
      foldAsOf(it.toSeq, None)._1.iterator
    }
  }
}
