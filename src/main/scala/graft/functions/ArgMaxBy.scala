package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, GreaterThan, If, IsNotNull, IsNull, LessThan, Literal, Or}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Codegen'd argmax: the long `id` with the maximum double `score`,
  * ties broken toward the SMALLEST id — exactly
  * `max_by(id, struct(score, -id))` / the oracle's
  * `ROW_NUMBER() OVER (ORDER BY score DESC, id ASC) = 1`.
  *
  * Why not max_by itself: its aggregation buffer holds the struct
  * ordering key, and struct buffer slots are not mutable-buffer types,
  * so Spark plans the whole aggregation as SortAggregate — for the IVF
  * centroid assignment that meant per-partition SORTS of the N×K scored
  * table (at sf1, 169M rows) just to take a per-vector maximum.
  *
  * A DECLARATIVE aggregate (two fixed-width buffer slots, pure
  * expression update/merge), NOT a TypedImperativeAggregate: the
  * declarative form runs inside codegen'd HashAggregateExec with
  * UnsafeRow buffers at ANY group cardinality, while the previous
  * TypedImperativeAggregate ran in ObjectHashAggregateExec, whose
  * sort-based fallback fires at 128 hash-map keys by default — the
  * per-vector assignment (one group per vector) silently degraded to
  * per-partition sorts of the scored table (q_ann_ivf at sf10: 177 s
  * object-hash-fallback vs 7 s hash; the declarative form needs no
  * fallback-threshold tuning at all).
  *
  * Score comparison is Spark SQL's numeric comparison (codegen uses
  * SQLOrderingUtil: -0.0 == 0.0 so that "tie" breaks toward the
  * smaller id exactly as the SQL mirror's ORDER BY does; NaN compares
  * largest-and-equal-to-NaN, out of this aggregate's domain — cosines
  * are NaN-free by construction). Rows with a NULL id or score are
  * skipped; an all-NULL group evaluates to NULL (max_by over a struct
  * ordering would instead tie-break among the null-score rows — the
  * SQL mirrors never rank NULL scores, so skipping matches the
  * oracle). */
case class ArgMaxBy(id: Expression, score: Expression)
  extends DeclarativeAggregate with BinaryLike[Expression] {

  override def left: Expression = id
  override def right: Expression = score

  override def checkInputDataTypes(): TypeCheckResult =
    if (id.dataType != LongType) TypeCheckResult.TypeCheckFailure(
      s"argmax_by requires a BIGINT id, got ${id.dataType.simpleString}")
    else if (score.dataType != DoubleType) TypeCheckResult.TypeCheckFailure(
      s"argmax_by requires a DOUBLE score, got ${score.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val bestScore = AttributeReference("bestScore", DoubleType)()
  private lazy val bestId = AttributeReference("bestId", LongType)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(bestScore, bestId)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(null, DoubleType), Literal(null, LongType))

  override lazy val updateExpressions: Seq[Expression] = {
    val better = Or(GreaterThan(score, bestScore),
      And(EqualTo(score, bestScore), LessThan(id, bestId)))
    val win = And(And(IsNotNull(score), IsNotNull(id)),
      Or(IsNull(bestScore), better))
    Seq(If(win, score, bestScore), If(win, id, bestId))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val better = Or(GreaterThan(bestScore.right, bestScore.left),
      And(EqualTo(bestScore.right, bestScore.left),
        LessThan(bestId.right, bestId.left)))
    val win = And(IsNotNull(bestScore.right),
      Or(IsNull(bestScore.left), better))
    Seq(If(win, bestScore.right, bestScore.left),
      If(win, bestId.right, bestId.left))
  }

  override lazy val evaluateExpression: Expression = bestId

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgMaxBy =
    copy(id = newLeft, score = newRight)

  override def prettyName: String = "argmax_by"
}

object ArgMaxBy {
  /** id of the max score; ties to the smallest id. */
  def argmax(id: Column, score: Column): Column =
    GraftShims.column(
      ArgMaxBy(GraftShims.expression(id), GraftShims.expression(score)).toAggregateExpression())
}
