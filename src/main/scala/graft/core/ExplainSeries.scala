package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BooleanType

/** Column-with-provenance analog of the reference's ExpSeries
  * (/root/reference/src/pd_explain/core/explainable_series.py).
  *
  * The reference's central idiom is the COMPOSABLE MASK: comparisons on a
  * series produce boolean series that remember their source frame and
  * predicate, `&`/`|`/`~` combine them (explainable_series.py:233-288),
  * and applying the composed mask yields a frame whose filter operation
  * is explainable. Here a mask is an [[ExplainSeries]] holding the lazy
  * predicate Column; `apply()` materializes an [[ExplainFrame]] whose
  * FilterOp carries the composed predicate, so every downstream
  * `.explain*` works exactly as after `filter` — including the one-scan
  * conditional-count fast path.
  *
  * Series-level explain (explainable_series.py:103-220 routes a series
  * back to its parent operation's explainer): [[explain]] applies the
  * mask and explains it in one call.
  */
final case class ExplainSeries(source: DataFrame, expr: Column, desc: String, frameName: String) {

  private def mask(other: ExplainSeries, combined: Column, d: String): ExplainSeries = {
    // alignment check (the reference requires same-index series): two
    // sources are compatible when their analyzed plans produce the same
    // result, not merely when they are the same object
    require((source eq other.source) ||
      source.queryExecution.analyzed.sameResult(other.source.queryExecution.analyzed),
      "mask series can only be combined when derived from the same dataframe")
    ExplainSeries(source, combined, d, frameName)
  }

  // ---- comparisons: series -> mask series ------------------------------
  def >(v: Any): ExplainSeries = ExplainSeries(source, expr > lit(v), s"$desc > $v", frameName)
  def >=(v: Any): ExplainSeries = ExplainSeries(source, expr >= lit(v), s"$desc >= $v", frameName)
  def <(v: Any): ExplainSeries = ExplainSeries(source, expr < lit(v), s"$desc < $v", frameName)
  def <=(v: Any): ExplainSeries = ExplainSeries(source, expr <= lit(v), s"$desc <= $v", frameName)
  def ===(v: Any): ExplainSeries = ExplainSeries(source, expr === lit(v), s"$desc == $v", frameName)
  def =!=(v: Any): ExplainSeries = ExplainSeries(source, expr =!= lit(v), s"$desc != $v", frameName)
  def isin(vs: Any*): ExplainSeries =
    ExplainSeries(source, expr.isin(vs: _*), s"$desc isin (${vs.mkString(",")})", frameName)

  // ---- boolean algebra on masks (the reference's __and__/__or__/__invert__)
  def &&(other: ExplainSeries): ExplainSeries =
    mask(other, expr && other.expr, s"($desc) & (${other.desc})")
  def ||(other: ExplainSeries): ExplainSeries =
    mask(other, expr || other.expr, s"($desc) | (${other.desc})")
  def unary_! : ExplainSeries = ExplainSeries(source, !expr, s"~($desc)", frameName)

  private def isMask: Boolean =
    source.select(expr).schema.head.dataType == BooleanType

  /** Apply a mask: the filtered frame with full filter provenance. */
  def apply(): ExplainFrame = {
    require(isMask, s"only a boolean mask series can be applied; '$desc' is not boolean")
    val res = source.filter(expr)
    new ExplainFrame(res, Some(FilterOp(source, res, desc, Some(expr))), frameName)
  }

  /** One-call mask explanation (series.explain() in the reference). */
  def explain(attributes: Seq[String] = Nil, topK: Int = 3,
              useSampling: Boolean = true, sampleSize: Int = 5000): DataFrame =
    apply().explainFedex(attributes, topK, useSampling = useSampling, sampleSize = sampleSize)

  /** Plain value stats of the series (non-mask surface). */
  def describe(): DataFrame = {
    val name = source.select(expr).schema.head.name
    ExplainFrame(source.select(expr.as(name)), frameName).describeStats(Seq(name))
  }
}

object ExplainSeries {
  /** Entry point: `ExplainSeries(frame, "l_quantity")`. */
  def apply(frame: ExplainFrame, colName: String): ExplainSeries =
    ExplainSeries(frame.df, col(colName), colName, frame.name)
}
