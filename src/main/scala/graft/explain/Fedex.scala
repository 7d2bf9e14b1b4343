package graft.explain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** FEDEx-style deviation/exceptionality explanations, Spark-first.
  *
  * Semantics (documented here, mirrored exactly in the DuckDB oracles —
  * see SURVEY.md §2.2). Reference surface:
  * /root/reference/src/pd_explain/explainers/fedex_explainer.py (a wrapper
  * over the fedex-generator measures from the FEDEx paper, VLDB'22).
  *
  * - Attributes are binned: numeric → 10 equal-width bins over the SOURCE
  *   min/max; categorical → the value itself. Bins are strings.
  * - Filter/join deviation of attribute A:
  *   KL(result ‖ source) over A's bins with +0.5 smoothing:
  *   p_b=(ns_b+0.5)/(Ns+0.5k), q_b=(nr_b+0.5)/(Nr+0.5k),
  *   score = Σ_b q_b ln(q_b/p_b).
  * - Bin influence: score(A) − score(A without bin b), where "without"
  *   drops the bin from both sides and renormalizes (k−1 bins).
  * - GroupBy exceptionality of measure m: max_g |v_g − μ| / σ over the
  *   per-group aggregated values; per-group influence = that standardized
  *   deviation.
  *
  * Scale: ONE scan of source + ONE of result produce the (attribute, bin)
  * count table (exploded attr→bin pairs, map-side combined). Everything
  * after operates on that KB-sized table; the leave-one-out is a self-join
  * on it, never a rescan. Cross-engine float determinism: ln terms are
  * rounded to DECIMAL(18,9) before the (exact) sum — see util.D.emit6.
  */
object Fedex {

  final case class Attr(name: String, numeric: Boolean)

  private val termDec = DecimalType(18, 9)

  def binExpr(c: Column, lo: Column, hi: Column, nb: Int = 10): Column =
    when(hi === lo, lit(0)).otherwise(
      least(floor((c - lo) / ((hi - lo) / nb.toDouble)).cast("int"), lit(nb - 1)))

  def binSql(c: String, lo: String, hi: String, nb: Int = 10): String =
    s"CASE WHEN $hi = $lo THEN 0 ELSE LEAST(CAST(FLOOR(($c - $lo) / (($hi - $lo) / $nb.0)) AS INT), ${nb - 1}) END"

  /** Source min/max per numeric attribute (single 1-row broadcastable agg). */
  def statsDf(src: DataFrame, attrs: Seq[Attr]): Option[DataFrame] = {
    val nums = attrs.filter(_.numeric)
    if (nums.isEmpty) None
    else {
      val aggs = nums.flatMap(a => Seq(min(col(a.name)).as(s"lo_${a.name}"), max(col(a.name)).as(s"hi_${a.name}")))
      Some(src.agg(aggs.head, aggs.tail: _*))
    }
  }

  /** One scan → (attribute, bin) pairs for every row × attribute. */
  def attrBins(df: DataFrame, stats: Option[DataFrame], attrs: Seq[Attr], nb: Int = 10): DataFrame = {
    val base = stats.map(st => df.crossJoin(broadcast(st))).getOrElse(df)
    val structs = attrs.map { a =>
      val bin =
        if (a.numeric) binExpr(col(a.name), col(s"lo_${a.name}"), col(s"hi_${a.name}"), nb).cast("string")
        else col(a.name).cast("string")
      struct(lit(a.name).as("attribute"), bin.as("bin"))
    }
    base.select(explode(array(structs: _*)).as("ab"))
      .select(col("ab.attribute").as("attribute"), col("ab.bin").as("bin"))
      .filter(col("bin").isNotNull)
  }

  /** (attribute, bin, ns, nr) counts; bins are those present in source. */
  def binCounts(src: DataFrame, res: DataFrame, attrs: Seq[Attr], nb: Int = 10): DataFrame = {
    val stats = statsDf(src, attrs)
    val s = attrBins(src, stats, attrs, nb).groupBy("attribute", "bin").agg(count(lit(1)).as("ns"))
    val r = attrBins(res, stats, attrs, nb).groupBy("attribute", "bin").agg(count(lit(1)).as("nr"))
    s.join(r, Seq("attribute", "bin"), "left").na.fill(0L, Seq("nr"))
  }

  /** Fast path of [[binCounts]] when the result is `src.filter(cond)`
    * (the filter-explanation case): ONE scan + ONE aggregation with a
    * conditional count, instead of scanning/exploding source and result
    * separately and joining. Identical output — bins come from the same
    * source stats, and every result row is a source row. */
  def binCountsFiltered(src: DataFrame, cond: Column, attrs: Seq[Attr], nb: Int = 10): DataFrame = {
    val stats = statsDf(src, attrs)
    val base = stats.map(st => src.crossJoin(broadcast(st))).getOrElse(src)
    val structs = attrs.map { a =>
      val bin =
        if (a.numeric) binExpr(col(a.name), col(s"lo_${a.name}"), col(s"hi_${a.name}"), nb).cast("string")
        else col(a.name).cast("string")
      struct(lit(a.name).as("attribute"), bin.as("bin"))
    }
    // when().otherwise(0): a NULL condition means "not in the filter
    // result" (0), and keeps all-excluded groups at nr=0 rather than NULL
    base.select(explode(array(structs: _*)).as("ab"),
        when(cond, 1L).otherwise(0L).as("inres"))
      .select(col("ab.attribute").as("attribute"), col("ab.bin").as("bin"), col("inres"))
      .filter(col("bin").isNotNull)
      .groupBy("attribute", "bin")
      .agg(count(lit(1)).as("ns"), sum(col("inres")).as("nr"))
  }

  /** Enrich counts with per-attribute totals (window over the tiny table). */
  private def enriched(counts: DataFrame): DataFrame = {
    val w = Window.partitionBy("attribute")
    counts.filter(col("ns") > 0)
      .withColumn("n_src", sum("ns").over(w))
      .withColumn("n_res", sum("nr").over(w))
      .withColumn("k", count(lit(1)).over(w))
  }

  private def klTerm(nr: Column, ns: Column, nRes: Column, nSrc: Column, k: Column): Column = {
    val q = (nr + lit(0.5)) / (nRes + lit(0.5) * k)
    val p = (ns + lit(0.5)) / (nSrc + lit(0.5) * k)
    (q * log(q / p)).cast(termDec)
  }

  /** Per-attribute KL deviation: (attribute, n_bins, kl_score). */
  def filterDeviation(counts: DataFrame): DataFrame =
    enriched(counts)
      .withColumn("term", klTerm(col("nr"), col("ns"), col("n_res"), col("n_src"), col("k")))
      .groupBy("attribute")
      .agg(max(col("k")).as("n_bins"), sum(col("term")).cast(DoubleType).as("kl_score"))

  /** Shapley attribution per bin: the deviation measure is additive over
    * bins (score = Σ_b term_b), so the exact Shapley value of bin b IS its
    * own term — no sampling needed (reference explainer='shapley'). */
  def binShapley(counts: DataFrame): DataFrame =
    enriched(counts)
      .select(col("attribute"), col("bin"), col("ns"), col("nr"),
        klTerm(col("nr"), col("ns"), col("n_res"), col("n_src"), col("k"))
          .cast(DoubleType).as("shapley"))

  def shapleySelectSql: String =
    s"""SELECT attribute, bin, ns, nr,
       |  CAST(${klTermSql("nr", "ns", "n_res", "n_src", "k")} AS DOUBLE) AS shapley
       |FROM en ORDER BY attribute, bin""".stripMargin

  /** Leave-one-bin-out influence: (attribute, bin, ns, nr, influence). */
  def binInfluence(counts: DataFrame): DataFrame = {
    val en = enriched(counts)
    val full = filterDeviation(counts).select(col("attribute"), col("kl_score"))
    val e = en.select(col("attribute").as("attribute"), col("bin").as("bin0"),
      col("ns").as("ns0"), col("nr").as("nr0"))
    val excl = en.alias("x").join(e.alias("e"),
        col("x.attribute") === col("e.attribute") && col("x.bin") =!= col("e.bin0"))
      .select(col("x.attribute").as("attribute"), col("e.bin0").as("bin0"),
        col("e.ns0").as("ns0"), col("e.nr0").as("nr0"),
        klTerm(col("x.nr"), col("x.ns"),
          col("x.n_res") - col("e.nr0"), col("x.n_src") - col("e.ns0"),
          col("x.k") - 1).as("term"))
      .groupBy("attribute", "bin0", "ns0", "nr0")
      .agg(sum(col("term")).cast(DoubleType).as("score_excl"))
    excl.join(full, Seq("attribute"))
      .select(col("attribute"), col("bin0").as("bin"), col("ns0").as("ns"), col("nr0").as("nr"),
        (col("kl_score") - col("score_excl")).as("influence"))
  }

  // ---------------------------------------------------------------- SQL --

  /** DuckDB CTE prefix like [[countsSql]], with categorical attributes
    * given as (alias, sqlExpr) pairs — supports derived bins such as the
    * reference's Seasons/Months datetime bins
    * (/root/reference/src/pd_explain/custom_bins/date_time_bin.py). */
  def countsSqlExpr(table: String, srcWhere: String, resWhere: String,
                    num: Seq[String], catExpr: Seq[(String, String)], nb: Int = 10): String = {
    val statCols = num.map(a => s"MIN($a) AS lo_$a, MAX($a) AS hi_$a").mkString(", ")
    def branch(side: String, where: String): Seq[String] = {
      val nbx = num.map(a =>
        s"SELECT '$a' AS attribute, CAST(${binSql(a, s"lo_$a", s"hi_$a", nb)} AS VARCHAR) AS bin, '$side' AS side FROM $table, st WHERE ($where) AND $a IS NOT NULL")
      val cbx = catExpr.map { case (alias, e) =>
        s"SELECT '$alias' AS attribute, CAST($e AS VARCHAR) AS bin, '$side' AS side FROM $table WHERE ($where) AND ($e) IS NOT NULL" }
      nbx ++ cbx
    }
    val st = if (num.nonEmpty) s"st AS (SELECT $statCols FROM $table WHERE ($srcWhere)),\n" else ""
    s"""WITH $st
       |u AS (${(branch("src", srcWhere) ++ branch("res", resWhere)).mkString("\nUNION ALL\n")}),
       |cnt AS (SELECT attribute, bin,
       |  COUNT(*) FILTER (WHERE side = 'src') AS ns,
       |  COUNT(*) FILTER (WHERE side = 'res') AS nr
       |  FROM u GROUP BY attribute, bin),
       |en AS (SELECT attribute, bin, ns, nr,
       |  SUM(ns) OVER (PARTITION BY attribute) AS n_src,
       |  SUM(nr) OVER (PARTITION BY attribute) AS n_res,
       |  COUNT(*) OVER (PARTITION BY attribute) AS k
       |  FROM cnt WHERE ns > 0)""".stripMargin
  }

  /** DuckDB CTE prefix producing the same `en` table as [[enriched]]. */
  def countsSql(table: String, srcWhere: String, resWhere: String,
                num: Seq[String], cat: Seq[String], nb: Int = 10): String = {
    val statCols = num.map(a => s"MIN($a) AS lo_$a, MAX($a) AS hi_$a").mkString(", ")
    def branch(side: String, where: String): Seq[String] = {
      val nbx = num.map(a =>
        s"SELECT '$a' AS attribute, CAST(${binSql(a, s"lo_$a", s"hi_$a", nb)} AS VARCHAR) AS bin, '$side' AS side FROM $table, st WHERE ($where) AND $a IS NOT NULL")
      val cbx = cat.map(a =>
        s"SELECT '$a' AS attribute, CAST($a AS VARCHAR) AS bin, '$side' AS side FROM $table WHERE ($where) AND $a IS NOT NULL")
      nbx ++ cbx
    }
    val st = if (num.nonEmpty) s"st AS (SELECT $statCols FROM $table WHERE ($srcWhere)),\n" else ""
    s"""WITH $st
       |u AS (${(branch("src", srcWhere) ++ branch("res", resWhere)).mkString("\nUNION ALL\n")}),
       |cnt AS (SELECT attribute, bin,
       |  COUNT(*) FILTER (WHERE side = 'src') AS ns,
       |  COUNT(*) FILTER (WHERE side = 'res') AS nr
       |  FROM u GROUP BY attribute, bin),
       |en AS (SELECT attribute, bin, ns, nr,
       |  SUM(ns) OVER (PARTITION BY attribute) AS n_src,
       |  SUM(nr) OVER (PARTITION BY attribute) AS n_res,
       |  COUNT(*) OVER (PARTITION BY attribute) AS k
       |  FROM cnt WHERE ns > 0)""".stripMargin
  }

  /** [[countsSql]] over explicit src/res RELATIONS (the result side of a
    * join explanation is itself a join, not a WHERE on the source). */
  def countsSqlRel(srcRel: String, resRel: String,
                   num: Seq[String], cat: Seq[String], nb: Int = 10): String = {
    val statCols = num.map(a => s"MIN($a) AS lo_$a, MAX($a) AS hi_$a").mkString(", ")
    def branch(side: String, rel: String): Seq[String] = {
      val nbx = num.map(a =>
        s"SELECT '$a' AS attribute, CAST(${binSql(a, s"lo_$a", s"hi_$a", nb)} AS VARCHAR) AS bin, '$side' AS side FROM $rel AS tt, st WHERE $a IS NOT NULL")
      val cbx = cat.map(a =>
        s"SELECT '$a' AS attribute, CAST($a AS VARCHAR) AS bin, '$side' AS side FROM $rel AS tt WHERE $a IS NOT NULL")
      nbx ++ cbx
    }
    val st = if (num.nonEmpty) s"st AS (SELECT $statCols FROM $srcRel AS ss),\n" else ""
    s"""WITH $st
       |u AS (${(branch("src", srcRel) ++ branch("res", resRel)).mkString("\nUNION ALL\n")}),
       |cnt AS (SELECT attribute, bin,
       |  COUNT(*) FILTER (WHERE side = 'src') AS ns,
       |  COUNT(*) FILTER (WHERE side = 'res') AS nr
       |  FROM u GROUP BY attribute, bin),
       |en AS (SELECT attribute, bin, ns, nr,
       |  SUM(ns) OVER (PARTITION BY attribute) AS n_src,
       |  SUM(nr) OVER (PARTITION BY attribute) AS n_res,
       |  COUNT(*) OVER (PARTITION BY attribute) AS k
       |  FROM cnt WHERE ns > 0)""".stripMargin
  }

  /** Combined deviation + per-bin influence select, ranked and capped —
    * the SQL mirror of ExplainFrame.deviationTopK. */
  def deviationTopKSql(topK: Int): String =
    s""", ex AS (
       |  SELECT x.attribute AS attribute, e.bin AS bin, e.ns AS ns, e.nr AS nr,
       |    CAST(SUM(${klTermSql("x.nr", "x.ns", "(x.n_res - e.nr)", "(x.n_src - e.ns)", "(x.k - 1)")}) AS DOUBLE) AS score_excl
       |  FROM en x JOIN en e ON x.attribute = e.attribute AND x.bin <> e.bin
       |  GROUP BY x.attribute, e.bin, e.ns, e.nr),
       |fl AS (SELECT attribute,
       |  CAST(SUM(${klTermSql("nr", "ns", "n_res", "n_src", "k")}) AS DOUBLE) AS kl_score
       |  FROM en GROUP BY attribute)
       |SELECT fl.attribute, fl.kl_score, ex.bin, ex.ns, ex.nr,
       |  (fl.kl_score - ex.score_excl) AS influence
       |FROM ex JOIN fl ON ex.attribute = fl.attribute
       |ORDER BY fl.kl_score DESC, influence DESC, fl.attribute, ex.bin
       |LIMIT $topK""".stripMargin

  private def klTermSql(nr: String, ns: String, nRes: String, nSrc: String, k: String): String = {
    val q = s"(($nr + 0.5) / ($nRes + 0.5 * $k))"
    val p = s"(($ns + 0.5) / ($nSrc + 0.5 * $k))"
    s"CAST($q * LN($q / $p) AS DECIMAL(18,9))"
  }

  def deviationSelectSql: String =
    s"""SELECT attribute, MAX(k) AS n_bins,
       |  CAST(SUM(${klTermSql("nr", "ns", "n_res", "n_src", "k")}) AS DOUBLE) AS kl_score
       |FROM en GROUP BY attribute ORDER BY attribute""".stripMargin

  def influenceSelectSql: String =
    s""", ex AS (
       |  SELECT x.attribute AS attribute, e.bin AS bin, e.ns AS ns, e.nr AS nr,
       |    CAST(SUM(${klTermSql("x.nr", "x.ns", "(x.n_res - e.nr)", "(x.n_src - e.ns)", "(x.k - 1)")}) AS DOUBLE) AS score_excl
       |  FROM en x JOIN en e ON x.attribute = e.attribute AND x.bin <> e.bin
       |  GROUP BY x.attribute, e.bin, e.ns, e.nr),
       |fl AS (SELECT attribute,
       |  CAST(SUM(${klTermSql("nr", "ns", "n_res", "n_src", "k")}) AS DOUBLE) AS kl_score
       |  FROM en GROUP BY attribute)
       |SELECT ex.attribute, ex.bin, ex.ns, ex.nr,
       |  (fl.kl_score - ex.score_excl) AS influence
       |FROM ex JOIN fl ON ex.attribute = fl.attribute
       |ORDER BY ex.attribute, ex.bin""".stripMargin
}
