package graft.explain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
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
  * count table (exploded attr→bin pairs, map-side combined); a second
  * aggregation gathers each attribute's bins into an array, and every
  * measure — deviation, Shapley, leave-one-out influence — is array math
  * over that single row (no self-join, no second reference to the scan).
  * Cross-engine float determinism: ln terms are rounded to DECIMAL(18,9)
  * and summed as exact long nano-units — see klSumNanos.
  */
object Fedex {

  final case class Attr(name: String, numeric: Boolean)

  private val termDec = DecimalType(18, 9)

  /** NULL-PRESERVING: Spark's least() skips nulls, so an unguarded
    * least(floor(null/...), nb-1) silently bins a NULL value into the
    * TOP bin (and `when(hi = lo, 0)` would bin it 0) — while every SQL
    * mirror filters the raw attribute IS NOT NULL first. A null value
    * has no bin; downstream isNotNull filters then agree with the
    * mirrors on dirty data. */
  def binExpr(c: Column, lo: Column, hi: Column, nb: Int = 10): Column =
    when(c.isNull, lit(null).cast("int")).otherwise(
      when(hi === lo, lit(0)).otherwise(
        least(floor((c - lo) / ((hi - lo) / nb.toDouble)).cast("int"), lit(nb - 1))))

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

  private def klTerm(nr: Column, ns: Column, nRes: Column, nSrc: Column, k: Column): Column = {
    val q = (nr + lit(0.5)) / (nRes + lit(0.5) * k)
    val p = (ns + lit(0.5)) / (nSrc + lit(0.5) * k)
    (q * log(q / p)).cast(termDec)
  }

  /** ONE aggregation gathering each attribute's bins and totals; every
    * downstream measure (deviation, Shapley, leave-one-out influence) is
    * array math over the gathered cells. The earlier form enriched the
    * count table with window totals and re-referenced it per measure
    * (full score + both sides of the leave-one-out self-join), which
    * re-planned the corpus scan per reference — the same duplicated-
    * subtree cost the metainsight rewrite removed. Determinism: terms
    * are DECIMAL(18,9) and decimal sums are exact and associative, so
    * nothing depends on collect_list's arrival order.
    *
    * Cardinality contract: one row holds ALL of an attribute's bins,
    * and the leave-one-out is O(k²) within it — sized for explanation
    * bins (numeric attrs have `nb` bins; categorical attrs are
    * expected to be low-cardinality dimensions, as in the reference,
    * whose per-value binning has the same contract). Do not feed
    * ID-like categorical attributes — enforced fail-fast by
    * [[graft.util.Guard.cellCap]]. */
  private def attrCells(counts: DataFrame): DataFrame =
    counts.filter(col("ns") > 0)
      .groupBy("attribute")
      .agg(collect_list(struct(col("bin"), col("ns"), col("nr"))).as("cells"),
        sum(col("ns")).as("n_src"), sum(col("nr")).as("n_res"), count(lit(1)).as("k"))
      .withColumn("k", graft.util.Guard.cellCap(col("k"), col("k"), "Fedex.attrCells"))

  /** Exact Σ of klTerm over `cells`, accumulated as LONG nano-units:
    * terms are DECIMAL(18,9), so term × 10⁹ is an exact integer
    * (Decimal(18,9) × int literal stays at scale 9 — a LONG multiplier
    * would widen past 38 digits and Spark truncates decimal additions
    * and over-wide products to scale 8, silently losing the 9th
    * decimal). Long addition is exact and associative, so the sum is
    * order-independent and bit-equal to the oracle's decimal SUM;
    * |term| ≤ ~40 and bin counts are bounded, so no overflow. */
  private def klSumNanos(cells: Column, nRes: Column, nSrc: Column, k: Column): Column =
    aggregate(cells, lit(0L),
      (acc, c) => acc +
        (klTerm(c.getField("nr"), c.getField("ns"), nRes, nSrc, k) * lit(1000000000)).cast(LongType))

  /** nano-units → the same double the decimal-sum → double cast gave. */
  private def nanosToDouble(nanos: Column): Column =
    (nanos.cast(DecimalType(28, 0)) * lit(new java.math.BigDecimal("0.000000001")))
      .cast(DoubleType)

  private def klSum(cells: Column, nRes: Column, nSrc: Column, k: Column): Column =
    nanosToDouble(klSumNanos(cells, nRes, nSrc, k))

  /** Per-attribute KL deviation: (attribute, n_bins, kl_score). */
  def filterDeviation(counts: DataFrame): DataFrame =
    attrCells(counts).select(col("attribute"), col("k").as("n_bins"),
      klSum(col("cells"), col("n_res"), col("n_src"), col("k")).as("kl_score"))

  /** Shapley attribution per bin: the deviation measure is additive over
    * bins (score = Σ_b term_b), so the exact Shapley value of bin b IS its
    * own term — no sampling needed (reference explainer='shapley'). */
  def binShapley(counts: DataFrame): DataFrame =
    attrCells(counts)
      .select(col("attribute"), explode(transform(col("cells"), c => struct(
        c.getField("bin").as("bin"), c.getField("ns").as("ns"), c.getField("nr").as("nr"),
        klTerm(c.getField("nr"), c.getField("ns"), col("n_res"), col("n_src"), col("k"))
          .cast(DoubleType).as("shapley")))).as("p"))
      .select(col("attribute"), col("p.bin"), col("p.ns"), col("p.nr"), col("p.shapley"))

  def shapleySelectSql: String =
    s"""SELECT attribute, bin, ns, nr,
       |  CAST(${klTermSql("nr", "ns", "n_res", "n_src", "k")} AS DOUBLE) AS shapley
       |FROM en ORDER BY attribute, bin""".stripMargin

  /** (attribute, kl_score, per-bin influence structs) from the single
    * aggregation — the shared core of [[binInfluence]] and
    * ExplainFrame's combined deviation+influence ranking. Leave-one-out
    * is a nested array pass: for bin e, Σ over the other bins of the
    * term with e's counts removed from the totals — O(k²) on
    * bin-cardinality arrays, no self-join, no second scan. */
  def influenceCells(counts: DataFrame): DataFrame =
    // single-bin attributes have no leave-one-out (removing the only
    // bin leaves nothing): dropped, matching the oracle's self-join on
    // bin <> bin which produces no row for k = 1
    attrCells(counts).filter(col("k") > 1).select(col("attribute"),
      klSum(col("cells"), col("n_res"), col("n_src"), col("k")).as("kl_score"),
      transform(col("cells"), e => struct(
        e.getField("bin").as("bin"), e.getField("ns").as("ns"), e.getField("nr").as("nr"),
        klSum(filter(col("cells"), x => x.getField("bin") =!= e.getField("bin")),
          col("n_res") - e.getField("nr"), col("n_src") - e.getField("ns"), col("k") - 1)
          .as("score_excl"))).as("infl"))

  /** Leave-one-bin-out influence: (attribute, bin, ns, nr, influence). */
  def binInfluence(counts: DataFrame): DataFrame =
    influenceCells(counts)
      .select(col("attribute"), col("kl_score"), explode(col("infl")).as("p"))
      .select(col("attribute"), col("p.bin"), col("p.ns"), col("p.nr"),
        (col("kl_score") - col("p.score_excl")).as("influence"))

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

  /** DuckDB CTE prefix producing the bin counts + per-attribute totals
    * (`en`) that [[attrCells]] gathers on the Spark side. */
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
