package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.ExplainFrame

/** The EIGHTH degenerate pin: the ExplainFrame API surface on
  * degenerate frames. The registered queries drive these internals on
  * the six oracle fixtures, but the API layer has entry points and
  * group shapes no fixture produces — an empty frame, an all-NULL
  * column, a CONSTANT group (σ exactly 0 with n ≥ 2), a single-row
  * group, NULL group keys. The oracle convention for every division by
  * a data-derived zero is DuckDB's x/0 → NULL (measured: DuckDB yields
  * NULL for 1.0/0.0 in every form), so under ANSI Spark each of these
  * sites needs a when-guard, never a raw `/`.
  *
  * This pin's first run caught: `zscore` on a constant group (sd
  * exactly 0, n ≥ 2) raising ANSI DIVIDE_BY_ZERO where the
  * q_group_zscore DuckDB mirror emits NULL — the same σ=0 class the
  * Houses-notebook replay caught in the outlier explainer. */
class ApiDirtySpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def ef(df: org.apache.spark.sql.DataFrame): ExplainFrame =
    ExplainFrame(df, "degen")

  test("zscore on a constant group emits NULL z (the oracle's x/0), never ANSI DIVIDE_BY_ZERO") {
    val df = Seq(("a", 5.0), ("a", 5.0), ("a", 5.0), ("b", 1.0), ("b", 3.0))
      .toDF("g", "v")
    val out = ef(df).groupBy("g").zscore("v").df
      .select("g", "v", "v_mean", "v_std", "v_zscore").collect()
    val aRows = out.filter(_.getString(0) == "a")
    assert(aRows.length === 3)
    aRows.foreach { r =>
      assert(r.getDouble(3) === 0.0, "constant group sd must be exactly 0")
      assert(r.isNullAt(4), "z on a zero-sd group must be NULL (DuckDB x/0), got " + r.get(4))
    }
    // the healthy group still gets real scores
    val bRows = out.filter(_.getString(0) == "b")
    assert(bRows.forall(r => !r.isNullAt(4)))
  }

  test("single-row and all-NULL groups: std/var/sem are NULL (DuckDB var_samp), mean NULL only when no values") {
    val df = Seq[(String, java.lang.Double)](
      ("one", 7.0),                     // n=1: var_samp NULL
      ("nul", null), ("nul", null))     // all-NULL: every stat NULL
      .toDF("g", "v")
    def one(f: ExplainFrame => ExplainFrame, c: String): Map[String, Option[Double]] =
      f(ef(df)).df.collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val st = one(_.groupBy("g").std("v"), "v_std")
    assert(st("one") === None && st("nul") === None)
    val vr = one(_.groupBy("g").variance("v"), "v_var")
    assert(vr("one") === None && vr("nul") === None)
    val se = one(_.groupBy("g").sem("v"), "v_sem")
    assert(se("one") === None && se("nul") === None)
    val mn = one(_.groupBy("g").mean("v"), "v_mean")
    assert(mn("one") === Some(7.0) && mn("nul") === None)
  }

  test("NULL group keys keep their rows through transform/zscore with NULL stats (pandas NaN alignment)") {
    val df = Seq[(String, java.lang.Double)](
      (null, 1.0), (null, 2.0), ("a", 3.0)).toDF("g", "v")
    val tr = ef(df).groupBy("g").transform("v", "mean").df.collect()
    assert(tr.length === 3, "transform must preserve row count incl. NULL keys")
    assert(tr.filter(_.isNullAt(0)).forall(_.isNullAt(2)),
      "NULL-key rows must carry NULL aggregate")
    val zs = ef(df).groupBy("g").zscore("v").df.collect()
    assert(zs.length === 3)
    assert(zs.filter(_.isNullAt(0)).forall(r => r.isNullAt(4)),
      "NULL-key rows must carry NULL zscore")
  }

  test("empty frame: valueCounts/describeStats/groupBy aggs yield empty or NULL-stat results, no crash") {
    val empty = Seq.empty[(String, java.lang.Double)].toDF("g", "v")
    assert(ef(empty).valueCounts("g").collect().isEmpty)
    val ds = ef(empty).describeStats(Seq("v")).collect()
    assert(ds.length === 1 && ds(0).getLong(1) === 0L && ds(0).isNullAt(2) && ds(0).isNullAt(3))
    assert(ef(empty).groupBy("g").mean("v").df.collect().isEmpty)
    assert(ef(empty).groupBy("g").zscore("v").df.collect().isEmpty)
    val empty2 = Seq.empty[(String, java.lang.Double, java.lang.Double)].toDF("g", "v", "w")
    assert(ef(empty2).groupBy("g").corr(Seq("v", "w")).collect().isEmpty)
    // a one-column matrix request is refused by NAME, not a crash
    val m = intercept[IllegalArgumentException](
      ef(empty).groupBy("g").corr(Seq("v"))).getMessage
    assert(m.contains("at least two numeric columns"))
  }

  test("describeStats on an all-NULL and a constant column: NULL mean/std vs (mean, std=0)") {
    val df = Seq[(java.lang.Double, java.lang.Double)]((null, 4.0), (null, 4.0))
      .toDF("nul", "const")
    val rows = ef(df).describeStats(Seq("nul", "const")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows("nul").getLong(1) === 0L && rows("nul").isNullAt(2) && rows("nul").isNullAt(3))
    assert(rows("const").getDouble(2) === 4.0 && rows("const").getDouble(3) === 0.0)
  }

  test("per-group Pearson r with a constant column is 0.0 BY MIRRORED CONVENTION in both engines") {
    // pearsonBySql / pearsonMatrixBySql write the same CASE WHEN den >
    // 1e-9 THEN num/den ELSE 0.0 the Spark expression computes — the
    // zero-variance cell is a DEFINED 0.0 on both sides, not an
    // engine-dependent NULL/NaN (and not an ANSI division error)
    val df = Seq(("a", 1.0, 5.0), ("a", 2.0, 5.0), ("a", 3.0, 5.0)).toDF("g", "x", "c")
    val r = ef(df).groupBy("g").corr("x", "c").collect()
    assert(r.length === 1 && r(0).getDouble(1) === 0.0,
      s"constant-column r must be the conventioned 0.0, got ${r(0)}")
    val m = ef(df).groupBy("g").corr(Seq("x", "c")).collect()
    assert(m.nonEmpty && m.forall(_.getDouble(3) === 0.0),
      "matrix cells against the constant column must be the conventioned 0.0")
  }

  test("valueCounts on an all-NULL column: one NULL group with share 1.0") {
    val df = Seq[(java.lang.Long, String)]((1L, null), (2L, null)).toDF("id", "s")
    val vc = ef(df).valueCounts("s").collect()
    assert(vc.length === 1 && vc(0).isNullAt(0) && vc(0).getLong(1) === 2L &&
      vc(0).getDouble(2) === 1.0)
  }
}
