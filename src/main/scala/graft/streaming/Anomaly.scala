package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Streaming hourly spike flagging — the live form of the batch
  * q_events_anomaly operator under the operationally honest split: the
  * per-type (μ, σ) profile is trained BATCH-side on history (the stats
  * half of `operators.Events`' q_events_anomaly), and the stream flags
  * each completed hour against that static profile as the watermark
  * closes it. This is the standard monitoring deployment — the profile
  * updates on a slow cadence (daily rebuild), the flagging is
  * low-latency.
  *
  * Scale/state: the only state is the open hourly windows per event
  * type (watermark-bounded — state size = types × hours inside the
  * lateness horizon, independent of stream lifetime); the stats join is
  * stream-static against a type-cardinality table (broadcast). Append
  * mode emits each (window, type) row exactly once, on window close. */
object Anomaly {

  /** `events`: streaming (ts TIMESTAMP, event_type) — additional
    * columns pass through the aggregation untouched only if grouped,
    * so project first. `stats`: static (event_type, mu, sd) from the
    * batch profile. Emits (window_start, event_type, n, mu, sd,
    * is_spike) per completed hour. */
  def flagStream(events: DataFrame, stats: DataFrame,
      lateness: String = "2 hours"): DataFrame =
    events.withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).cast(LongType).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))
      .join(stats, Seq("event_type"))
      .select(col("event_type"), col("window_start"), col("n"), col("mu"), col("sd"),
        (col("n") > col("mu") + lit(3) * col("sd")).cast("int").as("is_spike"))
}
