package graft.explain

import graft.util.D
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scorpion-style aggregate-outlier explainer (reference:
  * /root/reference/src/pd_explain/explainers/outlier_explainer.py and
  * core/explainable_series.py:103-220 `std_int`/`calc_influence_std`/
  * `explain_outlier`; Scorpion, VLDB'13).
  *
  * Question: in `src.groupBy(g).agg(mean(aggCol))`, why is group `target`
  * a high/low outlier? Search single-attribute bin predicates; for each
  * candidate (attr, bin), remove its rows and measure how much the
  * target's standardized deviation drops, scaled by the kept fraction:
  *
  *   S        = dir · (v_t − μ) / σ          (over per-group means)
  *   S'(a,b)  = same after dropping rows with bin(a)=b
  *   influence(a,b) = (S − S'(a,b)) · (N − n_b) / N
  *
  * Scale: ONE scan builds the (attr, bin, group) → (cnt, sum) cube via an
  * exploded attr array (map-side combined); leave-out aggregates are pure
  * algebra on that cube joined with per-group totals. No per-candidate
  * rescan, no driver loop.
  */
object Outlier {

  import GroupByExplain.{dval, dbig, sigmaExpr, sigmaSql, dvalSql, dbigSql}

  /** @param dir +1 = explain a high outlier, -1 = low. */
  def explain(src: DataFrame, groupCol: String, aggCol: String, target: String,
              dir: Int, attrs: Seq[String], nb: Int = 10): DataFrame = {
    val stats = Fedex.statsDf(src, attrs.map(Fedex.Attr(_, numeric = true))).get

    // (grp, attribute, bin, cnt, sm) — ONE scan, hot path all-int/long:
    //  - posexplode of the INT bin array (the r6 form exploded
    //    struct(attribute STRING, bin STRING) and aggregated on string
    //    keys — string construction + hashing per exploded row was the
    //    measured bulk of a 1.6 s cube job at sf0.1);
    //  - the measure sums use the Correlation chunked-long machinery
    //    (exact Σ of the scale-6 quantization == the former
    //    sum(cast(y AS DECIMAL(25,6))) bit-for-bit; grouped decimal
    //    buffers are the documented 4× slowdown). Envelope: per-value
    //    |y| < 9.2e12 and |Σy| < 10^19, fail-loud beyond (the
    //    Correlation moment contract).
    // Attribute names and string bins re-enter in the tiny post-select.
    val binCols = attrs.map(a => Fedex.binExpr(col(a), col(s"lo_$a"), col(s"hi_$a"), nb))
    // sentinel "__total__" pseudo-attribute with a constant bin: every
    // row contributes to it, so the per-group TOTALS (the oracle's
    // whole-table tot) ride the same single scan even though null
    // attribute values are excluded from the real attributes' bins
    val attrArr = array((attrs :+ "__total__").map(lit): _*)
    val cubePlan = src.crossJoin(broadcast(stats))
      .select(col(groupCol).as("grp"), Correlation.quant6Col(col(aggCol)).as("fy"),
        posexplode(array(binCols :+ lit(0): _*)))
      .withColumnRenamed("pos", "ai").withColumnRenamed("col", "bin")
      // a NULL attribute value has no bin (binExpr is null-preserving);
      // the SQL mirror's per-attribute IS NOT NULL filter is this line
      .filter(col("bin").isNotNull)
      .groupBy("grp", "ai", "bin")
      .agg(count(lit(1)).as("cnt"), Correlation.chunkSumAggs("fy"): _*)
      .select(col("grp"), element_at(attrArr, col("ai") + 1).as("attribute"),
        col("bin").cast("string").as("bin"), col("cnt"),
        Correlation.value6(Correlation.recombineUnscaled("fy")).cast(D.dec25).as("sm"))
    // collect + LocalRelation re-entry: the cube feeds three consumers
    // (cands, tot, and the grid's join side) whose column pruning / join
    // null-filters make the subtrees NON-identical, so runtime exchange
    // reuse does NOT collapse them — the r6 plan executed the exploded
    // corpus scan THREE times (the measured q_outlier_explain
    // regression; an eager localCheckpoint measured slower still). The
    // cube is |groups|·|attrs|·(nb+1) rows — ~100 at any corpus size
    // (the qcut-boundary bounded-collect convention), so it re-enters as
    // a LocalRelation the tiny downstream algebra references freely.
    val cube = src.sparkSession.createDataFrame(
      java.util.Arrays.asList(cubePlan.collect(): _*), cubePlan.schema)

    // per-group totals (tiny) — read from the sentinel rows of the SAME
    // collected cube (all rows contribute to "__total__" regardless of
    // attribute nulls, so this equals the oracle's whole-table tot)
    val tot = cube.filter(col("attribute") === "__total__")
      .groupBy("grp")
      .agg(sum(col("cnt")).as("cnt_g"), sum(col("sm")).as("sm_g"))

    def vCol(sm: Column, cnt: Column): Column = sm.cast(D.dec25).cast(DoubleType) / cnt

    // full outlier score S
    val g0 = tot.select(col("grp"), vCol(col("sm_g"), col("cnt_g")).as("v"))
    // σ can be EXACTLY 0 when every per-group mean quantizes to the
    // same dbig cell (a tiny-magnitude aggCol: v ≈ 0.05 → v² rounds to
    // 0.00 at DECIMAL(24,2), svv = 0, variance clamps to 0 — the
    // Houses-notebook replay found it): the oracle's double (vt−μ)/0
    // is NULL in DuckDB, so the score must be NULL here too, never an
    // ANSI DIVIDE_BY_ZERO (the degenerate-pin divergence class).
    def scoreExpr(vt: Column, sv: Column, svv: Column, k: Column): Column = {
      val sig = sigmaExpr(sv, svv, k)
      when(sig > 0, lit(dir) * (vt - sv / k) / sig)
        .otherwise(lit(null).cast(DoubleType))
    }
    val s0 = g0.agg(count(lit(1)).as("k"),
        sum(col("v").cast(dval)).cast(DoubleType).as("sv"),
        sum((col("v") * col("v")).cast(dbig)).cast(DoubleType).as("svv"),
        max(when(col("grp") === target, col("v"))).as("vt"))
      .select(scoreExpr(col("vt"), col("sv"), col("svv"), col("k")).as("s_full"))

    // candidate grid × groups (left join so groups missing a bin keep all rows)
    val cands = cube.filter(col("attribute") =!= "__total__")
      .select("attribute", "bin").distinct()
    val grid = cands.crossJoin(tot)
      .join(cube, Seq("attribute", "bin", "grp"), "left")
      .na.fill(0L, Seq("cnt"))
      .withColumn("sm", coalesce(col("sm"), lit(0).cast(D.dec25)))
      .withColumn("cnt_kept", col("cnt_g") - col("cnt"))
      // a bin holding ALL of a group's rows has no leave-out mean:
      // NULL like the oracle's x/0, never an ANSI DIVIDE_BY_ZERO
      // (degenerate-pin class); the NULL row drops out of the moment
      // sums below exactly as it does in the SQL mirror
      .withColumn("v",
        when(col("cnt_kept") > 0,
          (col("sm_g") - col("sm")).cast(D.dec25).cast(DoubleType) / col("cnt_kept"))
          .otherwise(lit(null).cast(DoubleType)))

    val per = grid.groupBy("attribute", "bin")
      .agg(count(lit(1)).as("k"),
        sum(col("v").cast(dval)).cast(DoubleType).as("sv"),
        sum((col("v") * col("v")).cast(dbig)).cast(DoubleType).as("svv"),
        max(when(col("grp") === target, col("v"))).as("vt"),
        sum(col("cnt")).as("n_removed"),
        sum(col("cnt_g")).as("n_total"),
        min(col("cnt_kept")).as("min_kept"))

    per.crossJoin(broadcast(s0))
      .filter(col("min_kept") > 0) // drop candidates that empty out a group
      .withColumn("s_excl",
        scoreExpr(col("vt"), col("sv"), col("svv"), col("k")))
      .select(col("attribute"), col("bin"), col("n_removed"),
        graft.util.D.r(col("s_full"), 6).as("s_full"),
        graft.util.D.r((col("s_full") - col("s_excl")) * (col("n_total") - col("n_removed")) / col("n_total"), 6)
          .as("influence"))
      .orderBy("attribute", "bin")
  }

  /** DuckDB mirror of [[explain]]. */
  def sql(table: String, groupCol: String, aggCol: String, target: String,
          dir: Int, attrs: Seq[String], nb: Int = 10): String = {
    val statCols = attrs.map(a => s"MIN($a) AS lo_$a, MAX($a) AS hi_$a").mkString(", ")
    val branches = attrs.map { a =>
      s"""SELECT $groupCol AS grp, '$a' AS attribute,
         |  CAST(${Fedex.binSql(a, s"lo_$a", s"hi_$a", nb)} AS VARCHAR) AS bin,
         |  COUNT(*) AS cnt, SUM(CAST($aggCol AS DECIMAL(25,6))) AS sm
         |FROM $table, st WHERE $a IS NOT NULL GROUP BY 1, 2, 3""".stripMargin
    }.mkString("\nUNION ALL\n")
    val v = "CAST(CAST((t.sm_g - COALESCE(c.sm, 0)) AS DECIMAL(25,6)) AS DOUBLE) / (t.cnt_g - COALESCE(c.cnt, 0))"
    s"""WITH st AS (SELECT $statCols FROM $table),
       |cube0 AS ($branches),
       |tot AS (SELECT $groupCol AS grp, COUNT(*) AS cnt_g, SUM(CAST($aggCol AS DECIMAL(25,6))) AS sm_g
       |  FROM $table GROUP BY 1),
       |g0 AS (SELECT grp, CAST(CAST(sm_g AS DECIMAL(25,6)) AS DOUBLE) / cnt_g AS v FROM tot),
       |s0 AS (SELECT ($dir) * (MAX(CASE WHEN grp = '$target' THEN v END) - ${dvalSql("v")} / COUNT(*)) /
       |    ${sigmaSql(dvalSql("v"), dbigSql("v * v"), "COUNT(*)")} AS s_full FROM g0),
       |grid AS (SELECT ca.attribute, ca.bin, t.grp,
       |    COALESCE(c.cnt, 0) AS cnt, t.cnt_g,
       |    t.cnt_g - COALESCE(c.cnt, 0) AS cnt_kept,
       |    $v AS v
       |  FROM (SELECT DISTINCT attribute, bin FROM cube0) ca
       |  CROSS JOIN tot t
       |  LEFT JOIN cube0 c ON c.attribute = ca.attribute AND c.bin = ca.bin AND c.grp = t.grp),
       |per AS (SELECT attribute, bin, COUNT(*) AS k,
       |    ${dvalSql("v")} AS sv, ${dbigSql("v * v")} AS svv,
       |    MAX(CASE WHEN grp = '$target' THEN v END) AS vt,
       |    CAST(SUM(cnt) AS BIGINT) AS n_removed, CAST(SUM(cnt_g) AS BIGINT) AS n_total, MIN(cnt_kept) AS min_kept
       |  FROM grid GROUP BY 1, 2)
       |SELECT p.attribute, p.bin, p.n_removed,
       |  ROUND(s0.s_full, 6) AS s_full,
       |  ROUND((s0.s_full - ($dir) * (p.vt - p.sv / p.k) / ${sigmaSql("p.sv", "p.svv", "p.k")})
       |        * (p.n_total - p.n_removed) / p.n_total, 6) AS influence
       |FROM per p, s0 WHERE p.min_kept > 0
       |ORDER BY p.attribute, p.bin""".stripMargin
  }
}
