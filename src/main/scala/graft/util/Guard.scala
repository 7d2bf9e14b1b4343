package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fail-fast guards for documented cardinality contracts.
  *
  * The single-pass explainer rewrites gather a whole group's cells into
  * one row via collect_list (GroupByExplain.zdev, Fedex.attrCells,
  * MetaInsight.catPatternsKeyed). That is sized for explanation-grade
  * groupings — bins and low-cardinality dimensions — and the contract
  * "don't feed ID-like grouping keys" used to be documentation only: a
  * violating caller got an executor OOM on one task with no hint of the
  * cause. [[cellCap]] turns the violation into an immediate, diagnosable
  * error at negligible cost (one comparison per group row, evaluated
  * executor-side next to the gathered array itself).
  */
object Guard {

  /** Max cells a single gathered group row may hold before the query
    * fails. Explanation-grade groupings sit orders of magnitude below
    * this; a group this size (~10 MB of struct cells in ONE row) means
    * the grouping key is ID-like and the result would be meaningless
    * noise even if it survived memory. Mutable so a caller who truly
    * wants huge groups can raise it knowingly. */
  @volatile var MaxGatheredCells: Long = 100000L

  /** Max label centroids the many_to_one dist-pruning ranking may pull
    * to the driver (ManyToOne.distLabels). The reference's semantics
    * bound label cardinality at dozens; the cap turns an ID-like label
    * column (which would otherwise collect one centroid row per
    * distinct value, unboundedly) into an immediate, diagnosable error.
    * The collect itself is limit()-bounded to cap+1 rows, so driver
    * memory is protected even before the check fires. */
  @volatile var MaxRankedLabels: Int = 1024

  /** Returns `value`, but evaluating it raises a diagnosable error when
    * `n` (the group's gathered cell count) exceeds [[MaxGatheredCells]].
    * Wrap a column the plan is guaranteed to evaluate (the count itself,
    * or a stat derived from it) — the guard must not sit in a column
    * that column pruning can drop. */
  def cellCap(n: Column, value: Column, site: String): Column = {
    val cap = MaxGatheredCells
    when(n > cap, raise_error(concat(
      lit(s"$site: a single group gathered "), n.cast("string"),
      lit(s" cells (bound $cap). The grouping key looks ID-like — this " +
        "operator is sized for explanation-grade groupings (bins / " +
        "low-cardinality dimensions). Re-group on a coarser key, or " +
        "raise graft.util.Guard.MaxGatheredCells if the group size is " +
        "intentional."))))
      .otherwise(value)
  }
}
