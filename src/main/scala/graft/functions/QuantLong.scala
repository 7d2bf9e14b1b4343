package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Native scale-6 half-up quantizer: `halfup(x·1e6)` as a long — the
  * hot inner step of [[graft.explain.Correlation]]'s exact moment sums,
  * moved OUT of the generated projection code.
  *
  * The Column form of this logic (`when(fastGuard, floor(y+0.5))
  * .otherwise((x.cast(DECIMAL(30,6))·1e6).cast(LONG))`) is bit-exact but
  * its decimal fallback branch — although executed with probability
  * ~1e-5 — inflates the generated projection past JIT-friendly size: a
  * 9-moment quantizer projection ran ~2× slower purely from the dead
  * branch's code mass (measured r7; same finding as the rejected
  * decimal side-sums documented in Correlation.scala). Here the
  * generated code is ONE static call; the helper replicates the exact
  * same decision and both branch semantics verbatim:
  *  - fast path `(long) floor(y + 0.5)` taken only when the fractional
  *    part is provably far from the .5 boundary (the 16×-ulp margin);
  *  - boundary path = Spark's double→DECIMAL(30,6) cast semantics
  *    (HALF_UP on the SHORTEST-DECIMAL rendering, i.e.
  *    `new BigDecimal(Double.toString(x))`, the same route Scala's
  *    `BigDecimal(d)` takes inside Spark's Cast), ×1e6, exact long —
  *    raising on overflow exactly where the ANSI decimal→long cast
  *    would (message carries "overflow", the QuantizeSpec contract).
  * The range guard lives INSIDE the helper: NaN/±Inf/|x·1e6| ≥ 9.3e18
  * raise the same loud ArithmeticException the ANSI cast branch used
  * to (r11: the guard was previously an outer `when(abs(y) < 9.3e18,
  * quant_long(x)).otherwise(ansi cast)` per MOMENT in the caller's
  * projection — one extra multiply+abs+branch per row per moment and
  * 9× the CASE code mass in the 9-moment matrix projection, for a
  * branch whose whole job was to raise; the raising set and every
  * non-raising value are IDENTICAL with the internal check, oracle
  * hash-verified). Values in [9.0e18, 9.3e18) keep taking the exact
  * decimal path below, raising iff ≥ 2^63 — unchanged. */
object QuantHelper {
  def quant6(x: Double): Long = {
    val y = x * 1e6
    if (y != y || math.abs(y) >= 9.3e18) // NaN or past the long range
      throw new ArithmeticException(
        s"quant6: overflow — |${x}·1e6| exceeds the long range (the ANSI decimal→long cast contract)")
    val d = y - math.floor(y)
    if (math.abs(d - 0.5) > math.abs(y) * 1.8e-15 + 1e-12) math.floor(y + 0.5).toLong
    else {
      try new java.math.BigDecimal(java.lang.Double.toString(x))
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .movePointRight(6).longValueExact()
      catch {
        case _: ArithmeticException => throw new ArithmeticException(
          s"quant6: overflow — |${x}·1e6| exceeds the long range (the ANSI decimal→long cast contract)")
      }
    }
  }
}

/** `halfup(x·1e6)` as LONG (see [[QuantHelper]]). */
case class QuantLong(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"quant_long requires DOUBLE, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    QuantHelper.quant6(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.QuantHelper.quant6($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantLong {
  def apply(c: Column): Column = GraftShims.column(QuantLong(GraftShims.expression(c)))
}
