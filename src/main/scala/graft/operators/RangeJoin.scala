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
    * span (2-copy replication); correctness holds for any positive value.
    * Output: all point columns + all interval columns. */
  def pointInInterval(points: DataFrame, posCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      bandWidth: Long): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    // exact long floor-division: plain `/` on longs goes through double
    // (loses precision beyond 2^52) and `div` alone truncates toward zero
    // (wrong band for negative positions) — subtracting the nonnegative
    // pmod first makes the integral `div` exact for every long
    def fdiv(c: String): Column =
      expr(s"(`$c` - pmod(`$c`, ${bandWidth}L)) div ${bandWidth}L")
    val pts = points.withColumn("__band", fdiv(posCol))
    val ivs = intervals
      .filter(col(loCol) <= col(hiCol)) // empty ranges match nothing
      .withColumn("__band", explode(sequence(fdiv(loCol), fdiv(hiCol))))
    pts.join(ivs, "__band")
      .filter(col(loCol) <= col(posCol) && col(posCol) <= col(hiCol))
      .drop("__band")
  }
}
