package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

final case class MergeEvent(ok: Long, seq: Int, op: String,
                            price: Option[Double], prio: String)

/** One row per key — the smallest possible stateful-merge state: the
  * current winner (highest sequence seen). */
final case class MergeState(seq: Int, op: String, price: Option[Double], prio: String)

final case class MergeOut(ok: Long, seq: Int, op: String,
                          price: Option[Double], prio: String)

/** Streaming CDC merge — the streaming twin of `q_upsert_merge`: as
  * changelog rows arrive, each key's CURRENT row (highest-sequence
  * version) is re-emitted once per micro-batch the key appears in,
  * including delete TOMBSTONES (op = 'D') so a downstream sink can
  * retract — the streaming materialized-view maintenance pattern.
  *
  * Semantics mirror the batch window exactly: the winner is the
  * max-sequence row across everything seen so far; a stale row
  * arriving after a higher sequence never wins (idempotent,
  * order-free within the sequence contract — sequence numbers are
  * the ordering, so arrival order NEVER matters here, a strictly
  * stronger determinism than the time-ordered twins).
  *
  * Scale: state per key is ONE row (~40 bytes) — the standing current
  * view, key-cardinality-bounded like the Funnel/Enrich twins; no
  * timeout, because a key's current version stays queryable for the
  * stream's lifetime (the CDC contract). */
object Merge {

  /** Fold one key's batch into the emitted current row + new state.
    * Ties on seq resolve to the later fold input — the fixture never
    * produces them (sequences are unique per key by construction). */
  def foldMerge(ok: Long, events: Seq[MergeEvent], st: Option[MergeState])
    : (Option[MergeOut], MergeState) = {
    var cur = st.getOrElse(MergeState(Int.MinValue, "", None, ""))
    events.foreach { e =>
      if (e.seq >= cur.seq) cur = MergeState(e.seq, e.op, e.price, e.prio)
    }
    val out = if (events.nonEmpty) Some(MergeOut(ok, cur.seq, cur.op, cur.price, cur.prio))
              else None
    (out, cur)
  }

  /** Streaming form: append-mode current-row emissions per micro-batch. */
  def mergeStream(spark: SparkSession, events: Dataset[MergeEvent]): Dataset[MergeOut] = {
    import spark.implicits._
    events
      .groupByKey(_.ok)
      .flatMapGroupsWithState[MergeState, MergeOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (ok: Long, it: Iterator[MergeEvent], state: GroupState[MergeState]) =>
          val (out, next) = foldMerge(ok, it.toSeq, state.getOption)
          state.update(next)
          out.iterator
      }
  }

  /** Batch reference over a typed Dataset (same fold). */
  def mergeBatch(spark: SparkSession, events: Dataset[MergeEvent]): Dataset[MergeOut] = {
    import spark.implicits._
    events.groupByKey(_.ok).flatMapGroups { (ok, it) =>
      foldMerge(ok, it.toSeq, None)._1.iterator
    }
  }
}
