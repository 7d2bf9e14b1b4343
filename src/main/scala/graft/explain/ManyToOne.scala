package graft.explain

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Many-to-one (cluster-explorer style) rule explanations (reference:
  * /root/reference/src/pd_explain/explainers/many_to_one_explainer.py).
  *
  * For each label (group) and each candidate single-attribute condition
  * (categorical `attr = v`, or numeric `attr ∈ bin_b` over 10 equal-width
  * bins), compute
  *   coverage       = |cond ∧ label| / |label|
  *   separation_err = |cond ∧ ¬label| / |cond|
  * and flag rules passing the documented thresholds
  * (coverage ≥ 0.3, separation_err ≤ 0.7 — the reference defaults 0.7/0.3
  * find nothing on uniform synthetic data, so the demo thresholds are
  * relaxed; both engines apply the same ones).
  *
  * Scale: one scan explodes rows into (label, attribute, val) pairs
  * (map-side combined counts); the metric math joins three tiny count
  * tables.
  */
object ManyToOne {

  def explain(src: DataFrame, labelCol: String,
              catAttrs: Seq[String], numAttrs: Seq[String],
              covTh: Double = 0.3, sepTh: Double = 0.7, nb: Int = 10): DataFrame = {
    val attrs = catAttrs.map(Fedex.Attr(_, numeric = false)) ++ numAttrs.map(Fedex.Attr(_, numeric = true))
    val stats = Fedex.statsDf(src, attrs)
    val structs = attrs.map { a =>
      val v =
        if (a.numeric) Fedex.binExpr(col(a.name), col(s"lo_${a.name}"), col(s"hi_${a.name}"), nb).cast("string")
        else col(a.name).cast("string")
      struct(lit(a.name).as("attribute"), v.as("val"))
    }
    val base = stats.map(st => src.crossJoin(broadcast(st))).getOrElse(src)
    val pairs = base
      .select(col(labelCol).cast("string").as("label"), explode(array(structs: _*)).as("av"))
      .select(col("label"), col("av.attribute").as("attribute"), col("av.val").as("val"))
      .filter(col("val").isNotNull)

    val lc = pairs.groupBy("label", "attribute", "val").agg(count(lit(1)).as("n_match"))
    val lt = pairs.filter(col("attribute") === attrs.head.name)
      .groupBy("label").agg(count(lit(1)).as("n_label"))
    val ct = pairs.groupBy("attribute", "val").agg(count(lit(1)).as("n_cond"))

    lc.join(lt, Seq("label")).join(ct, Seq("attribute", "val"))
      .select(col("label"), col("attribute"), col("val"), col("n_match"),
        graft.util.D.r(col("n_match").cast("double") / col("n_label"), 6).as("coverage"),
        graft.util.D.r((col("n_cond") - col("n_match")).cast("double") / col("n_cond"), 6).as("separation_err"))
      .withColumn("passes", (col("coverage") >= covTh && col("separation_err") <= sepTh).cast("int"))
      .orderBy("label", "attribute", "val")
  }

  /** Length-2 conjunction rules (reference max_explanation_length > 1):
    * one condition from `attrA` × one from binned `attrB`, scored with the
    * same coverage/separation metrics. The co-occurrence counts come from
    * ONE groupBy over (label, valA, valB) — no pairwise join. */
  def explainConj(src: DataFrame, labelCol: String, attrA: String, attrB: String,
                  covTh: Double = 0.2, sepTh: Double = 0.8, nb: Int = 10): DataFrame = {
    val stats = Fedex.statsDf(src, Seq(Fedex.Attr(attrB, numeric = true))).get
    val base = src.crossJoin(broadcast(stats))
      .select(col(labelCol).cast("string").as("label"),
        col(attrA).cast("string").as("val_a"),
        Fedex.binExpr(col(attrB), col(s"lo_$attrB"), col(s"hi_$attrB"), nb).cast("string").as("val_b"))
      .filter(col("val_a").isNotNull && col("val_b").isNotNull)
    val lc = base.groupBy("label", "val_a", "val_b").agg(count(lit(1)).as("n_match"))
    val lt = base.groupBy("label").agg(count(lit(1)).as("n_label"))
    val ct = base.groupBy("val_a", "val_b").agg(count(lit(1)).as("n_cond"))
    lc.join(lt, Seq("label")).join(ct, Seq("val_a", "val_b"))
      .select(col("label"), col("val_a"), col("val_b"), col("n_match"),
        graft.util.D.r(col("n_match").cast("double") / col("n_label"), 6).as("coverage"),
        graft.util.D.r((col("n_cond") - col("n_match")).cast("double") / col("n_cond"), 6).as("separation_err"))
      .withColumn("passes", (col("coverage") >= covTh && col("separation_err") <= sepTh).cast("int"))
      .orderBy("label", "val_a", "val_b")
  }

  def conjSql(table: String, labelCol: String, attrA: String, attrB: String,
              covTh: Double = 0.2, sepTh: Double = 0.8, nb: Int = 10): String =
    s"""WITH st AS (SELECT MIN($attrB) AS lo_$attrB, MAX($attrB) AS hi_$attrB FROM $table),
       |base AS (SELECT CAST($labelCol AS VARCHAR) AS label,
       |    CAST($attrA AS VARCHAR) AS val_a,
       |    CAST(${Fedex.binSql(attrB, s"lo_$attrB", s"hi_$attrB", nb)} AS VARCHAR) AS val_b
       |  FROM $table, st WHERE $attrA IS NOT NULL AND $attrB IS NOT NULL),
       |lc AS (SELECT label, val_a, val_b, COUNT(*) AS n_match FROM base GROUP BY 1, 2, 3),
       |lt AS (SELECT label, COUNT(*) AS n_label FROM base GROUP BY 1),
       |ct AS (SELECT val_a, val_b, COUNT(*) AS n_cond FROM base GROUP BY 1, 2)
       |SELECT label, val_a, val_b, n_match, coverage, separation_err,
       |  CAST(CASE WHEN coverage >= $covTh AND separation_err <= $sepTh THEN 1 ELSE 0 END AS INT) AS passes
       |FROM (
       |  SELECT lc.label, lc.val_a, lc.val_b, lc.n_match,
       |    ROUND(CAST(lc.n_match AS DOUBLE) / lt.n_label * 1000000) / 1000000 AS coverage,
       |    ROUND(CAST(ct.n_cond - lc.n_match AS DOUBLE) / ct.n_cond * 1000000) / 1000000 AS separation_err
       |  FROM lc JOIN lt ON lc.label = lt.label
       |  JOIN ct ON lc.val_a = ct.val_a AND lc.val_b = ct.val_b)
       |ORDER BY label, val_a, val_b""".stripMargin

  def sql(table: String, labelCol: String,
          catAttrs: Seq[String], numAttrs: Seq[String],
          covTh: Double = 0.3, sepTh: Double = 0.7, nb: Int = 10): String = {
    val statCols = numAttrs.map(a => s"MIN($a) AS lo_$a, MAX($a) AS hi_$a").mkString(", ")
    val stTable = if (numAttrs.nonEmpty) s"$table, st" else table
    val branches =
      catAttrs.map(a =>
        s"SELECT CAST($labelCol AS VARCHAR) AS label, '$a' AS attribute, CAST($a AS VARCHAR) AS val FROM $table WHERE $a IS NOT NULL") ++
      numAttrs.map(a =>
        s"SELECT CAST($labelCol AS VARCHAR), '$a', CAST(${Fedex.binSql(a, s"lo_$a", s"hi_$a", nb)} AS VARCHAR) FROM $stTable WHERE $a IS NOT NULL")
    val headAttr = (catAttrs ++ numAttrs).head
    val st = if (numAttrs.nonEmpty) s"st AS (SELECT $statCols FROM $table),\n" else ""
    s"""WITH $st
       |pairs AS (${branches.mkString("\nUNION ALL\n")}),
       |lc AS (SELECT label, attribute, val, COUNT(*) AS n_match FROM pairs GROUP BY 1,2,3),
       |lt AS (SELECT label, COUNT(*) AS n_label FROM pairs WHERE attribute = '$headAttr' GROUP BY 1),
       |ct AS (SELECT attribute, val, COUNT(*) AS n_cond FROM pairs GROUP BY 1,2)
       |SELECT label, attribute, val, n_match, coverage, separation_err,
       |  CAST(CASE WHEN coverage >= $covTh AND separation_err <= $sepTh
       |       THEN 1 ELSE 0 END AS INT) AS passes
       |FROM (
       |  SELECT lc.label, lc.attribute, lc.val, lc.n_match,
       |    ROUND(CAST(lc.n_match AS DOUBLE) / lt.n_label, 6) AS coverage,
       |    ROUND(CAST(ct.n_cond - lc.n_match AS DOUBLE) / ct.n_cond, 6) AS separation_err
       |  FROM lc JOIN lt ON lc.label = lt.label
       |  JOIN ct ON lc.attribute = ct.attribute AND lc.val = ct.val)
       |ORDER BY label, attribute, val""".stripMargin
  }
}
