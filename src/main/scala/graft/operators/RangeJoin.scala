package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — the second join shape the reference's
  * pandas substrate reaches with boolean masks (`df[(lo <= x) & (x <= hi)]`
  * row-at-a-time, or `pd.IntervalIndex.contains`) and Spark SQL only plans
  * as a BroadcastNestedLoopJoin / cartesian product when written naively
  * as `a.join(b, lo <= ts && ts <= hi)`.
  *
  * Banded equi-join instead: pick a band width B, key points by
  * `floor(ts / B)` and replicate each interval onto every band it overlaps
  * (`sequence(floor(lo/B), floor(hi/B))` — for spans ≤ B that is at most 2
  * copies), equi-join on the band, then re-check the exact range
  * predicate. The plan is an ordinary shuffled hash/sort-merge join:
  *
  *  - no cartesian: work is `|points| + Σ ceil(span/B + 1)` join inputs,
  *    and each point only meets intervals in ITS band;
  *  - the band key is high-cardinality (time-range / B), so the shuffle
  *    spreads evenly across 1000 executors — no broadcast needed even
  *    when BOTH sides are corpus-sized (the case as-of/broadcast joins
  *    don't cover);
  *  - replication factor is span/B + 1 ≤ 2 when B ≥ max span; an interval
  *    much wider than B pays proportionally to the bands it genuinely
  *    covers — the correct cost model, never quadratic.
  *
  * Inputs are BIGINT positions (e.g. `unix_micros(ts)`) so the banding
  * arithmetic is exact integer division on both engines. Matching is
  * inclusive on both ends: lo ≤ pos ≤ hi, mirroring SQL BETWEEN.
  */
object RangeJoin {

  /** Join `points` (with BIGINT column `posCol`) to every row of
    * `intervals` (with BIGINT columns `loCol`, `hiCol`) whose closed range
    * contains the point. `bandWidth` should be ≥ the typical interval
    * span (2-copy replication); correctness holds for any positive value,
    * but each interval is required to cover at most [[MaxBandsPerInterval]]
    * bands (span/bandWidth + 1) — beyond that the replication `sequence`
    * is approaching Spark's ~2^31 array-length cap and the band width is
    * simply mis-chosen for the data; the precondition fails fast with the
    * offending span instead of dying inside codegen. The two inputs must
    * use DISJOINT column names (the equi-join key `__band` is internal;
    * a shared data column would make every downstream reference
    * ambiguous) — alias one side before calling.
    * Output: all point columns + all interval columns. */
  def pointInInterval(points: DataFrame, posCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bandWidth: Long): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    val shared = points.columns.toSet.intersect(intervals.columns.toSet)
    require(shared.isEmpty,
      s"points/intervals must use disjoint column names (shared: ${shared.mkString(", ")}) — alias one side")
    // exact long floor-division: plain `/` on longs goes through double
    // (loses precision beyond 2^52) and `div` alone truncates toward zero
    // (wrong band for negative positions) — subtracting the nonnegative
    // pmod first makes the integral `div` exact for every long
    def fdiv(c: String): Column =
      expr(s"(`$c` - pmod(`$c`, ${bandWidth}L)) div ${bandWidth}L")
    val pts = points.withColumn("__band", fdiv(posCol))
    // fail fast (with the offending span) on an interval covering more
    // than MaxBandsPerInterval bands, instead of letting sequence() blow
    // past Spark's array cap or silently replicating one row millions of
    // times. The guard wraps the sequence's OWN upper bound (the
    // Guard.scala contract: a column the plan must evaluate — a separate
    // guard column would be dropped by column pruning).
    val cap = MaxBandsPerInterval
    val nBands = fdiv(hiCol) - fdiv(loCol) + 1
    val hiBand = when(nBands <= cap, fdiv(hiCol))
      .otherwise(raise_error(concat(
        lit(s"RangeJoin: interval spans more than $cap bands ("),
        nBands.cast("string"), lit(s" at bandWidth=$bandWidth; lo="),
        col(loCol).cast("string"), lit(", hi="), col(hiCol).cast("string"),
        lit(") — raise bandWidth, split the interval, or raise " +
          "graft.operators.RangeJoin.MaxBandsPerInterval"))).cast("long"))
    val ivs = intervals
      .filter(col(loCol) <= col(hiCol)) // empty ranges match nothing
      .withColumn("__band", explode(sequence(fdiv(loCol), hiBand)))
    pts.join(ivs, "__band")
      .filter(col(loCol) <= col(posCol) && col(posCol) <= col(hiCol))
      .drop("__band")
  }

  /** Per-interval replication bound: an interval wider than this many
    * bands indicates a mis-chosen bandWidth (each band is one join-input
    * copy; 1M copies of one row is a data-shape bug, not a plan). Raise
    * deliberately if ultra-wide intervals are intentional. */
  @volatile var MaxBandsPerInterval: Long = 1000000L
}
