package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native fixed-point vector scaling: each float/double component →
  * `round(x·1e8)` as a long, replacing the interpreted
  * `transform(e, x -> round(x·1e8, 0)::long)` HOF that ran per element
  * on every embedding scan (HOFs are CodegenFallback).
  *
  * Exactness contract: Spark's `round(double, 0)` is HALF_UP on the
  * SHORTEST-DECIMAL rendering of the double (`BigDecimal.valueOf`), not
  * on its exact binary value — the two can differ only when the value
  * sits within half an ulp of a .5 boundary. The fast path therefore
  * takes `floor(v + 0.5)` only when the fractional part is provably far
  * from .5 (the same 16×-ulp margin [[graft.explain.Correlation]]'s
  * quantizer uses); boundary values fall back to the identical
  * `BigDecimal.valueOf(v).setScale(0, HALF_UP)` call Spark's Round
  * makes, so results are bit-identical on every input. Non-finite or
  * out-of-long-range components (impossible for unit-scale embeddings)
  * fail loud, mirroring the ANSI cast. */
object FixedScaleHelper {

  private val Scale = 1e8

  def scale(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) {
        out(i) = null
      } else {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val v = x * Scale
        if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v) || math.abs(v) >= 9.0e18)
          throw new ArithmeticException(
            s"fixed_scale: component $x does not fit the fixed-point range")
        val d = v - math.floor(v)
        out(i) =
          if (math.abs(d - 0.5) > math.abs(v) * 1.8e-15 + 1e-12) math.floor(v + 0.5).toLong
          else java.math.BigDecimal.valueOf(v)
            .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** array<long> fixed-point form of a float/double vector (see
  * [[FixedScaleHelper]]); pairs with [[FixedDot]] for exact dots. */
case class FixedScale(child: Expression) extends UnaryExpression {

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // SQL-reachable (fixed_scale in GraftFunctions), so reject non-
  // float/double arrays at analysis time: ArrayData.getDouble on 4-byte
  // elements would otherwise read garbage under UnsafeArrayData.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fixed_scale requires ARRAY<FLOAT> or ARRAY<DOUBLE>, got ${other.simpleString}")
  }

  override def dataType: DataType = child.dataType match {
    case ArrayType(_, containsNull) => ArrayType(LongType, containsNull)
    case _ => ArrayType(LongType, containsNull = false)
  }

  override protected def nullSafeEval(input: Any): Any =
    FixedScaleHelper.scale(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FixedScaleHelper.scale($c, $isFloat)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FixedScale {
  def apply(c: Column): Column = GraftShims.column(FixedScale(GraftShims.expression(c)))
}
