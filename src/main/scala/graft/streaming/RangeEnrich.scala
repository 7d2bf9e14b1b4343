package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming point-in-interval enrichment — the streaming twin of
  * `q_range_join` (graft.operators.RangeJoin): events matched against
  * the ±tolerance attribution windows that purchases open.
  *
  * Spark-first: Structured Streaming's stream-stream join REQUIRES an
  * equality predicate (a pure time-range join is rejected at runtime) —
  * and the batch RangeJoin's banding trick supplies exactly that: both
  * sides key on floor(event-time / band) with the window side exploded
  * onto the ≤ 2 bands it covers (band = 2·tolerance = the max window
  * span), the join is an ordinary watermarked equi-join on the band
  * key, and the exact |p.ts − w.wts| ≤ tolerance re-check runs after.
  * A (point, window) pair meets on exactly ONE band (the point's), so
  * no dedup is needed. Same semantics as the banded batch form;
  * StreamingSpec asserts the matched pair sets are identical.
  *
  * Column-name contract (the RangeJoin convention): the two inputs must
  * use DISJOINT column names apart from their event-time columns
  * (`ts` on points, `wts` on windows) — a shared name would make the
  * join output ambiguous.
  *
  * Emission caveat: a match emits only once BOTH sides have arrived —
  * a point can match a future window (up to +tolerance), so results
  * trail the stream by up to tolerance + watermark delay; each side's
  * join state expires at watermark − tolerance. The batch RangeJoin is
  * the replayable source of truth for late data.
  */
object RangeEnrich {

  /** Watermarked banded interval join: points (…, ts) × windows (…, wts),
    * |ts − wts| ≤ `toleranceSec` seconds. Works identically on batch
    * frames (watermarks are no-ops there) — the parity leg the spec
    * uses. */
  def matches(points: DataFrame, windows: DataFrame,
              toleranceSec: Long = 300L,
              watermarkDelay: String = "10 minutes"): DataFrame = {
    val shared = (points.columns.toSet - "ts").intersect(windows.columns.toSet - "wts")
    require(shared.isEmpty,
      s"points/windows must use disjoint column names; shared: ${shared.mkString(", ")}")
    require(toleranceSec > 0, "tolerance must be positive")
    val tolUs = toleranceSec * 1000000L
    val bandUs = 2 * tolUs // max window span -> each window covers <= 2 bands
    val p = points.withWatermark("ts", watermarkDelay)
      .withColumn("__band", floor(unix_micros(col("ts")) / bandUs))
    val w = windows.withWatermark("wts", watermarkDelay)
      .withColumn("__band", explode(sequence(
        floor((unix_micros(col("wts")) - tolUs) / bandUs),
        floor((unix_micros(col("wts")) + tolUs) / bandUs))))
    p.join(w, Seq("__band"))
      .filter(expr(s"ts >= wts - interval $toleranceSec seconds AND " +
        s"ts <= wts + interval $toleranceSec seconds"))
      .drop("__band")
  }
}
