package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two pre-scaled long arrays.
  *
  * Long addition is associative, so the result is bit-identical to the
  * interpreted `aggregate(zip_with(...))` fixed-point path (see
  * graft.sim.Ann) while running as a tight whole-stage-codegen loop —
  * this is the oracle-exact hot path for pairwise similarity at scale.
  *
  * Overflow contract: Math.multiplyExact/addExact, so an
  * out-of-envelope vector FAILS LOUD exactly like the oracle's BIGINT
  * arithmetic (DuckDB errors on BIGINT overflow) — a raw `*` would
  * silently wrap in Spark only, a cross-engine divergence instead of a
  * crash. Envelope at the 1e8 fixed-point scale: Σ|x_i·y_i| < 9.2e18,
  * i.e. Σ|x_i||y_i| < 920 in vector units — unit-norm embeddings
  * (|Σ| ≤ 1) have three orders of headroom, and the exact intrinsics
  * cost nothing measurable on the hot path (never-taken, well-predicted
  * overflow branches). */
case class FixedDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc = Math.addExact(acc, Math.multiplyExact(x.getLong(i), y.getLong(i))); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc = Math.addExact($acc, Math.multiplyExact($a.getLong($i), $b.getLong($i)));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FixedDot {
  def apply(a: Column, b: Column): Column =
    GraftShims.column(FixedDot(GraftShims.expression(a), GraftShims.expression(b)))
}
