package graft.explain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared deterministic small-set statistics + the FEDEx groupby
  * exceptionality explainer (reference:
  * /root/reference/src/pd_explain/core/explainable_group_by_dataframe.py,
  * measure per explainable_series.py:103 `std_int`).
  *
  * Sums over a handful of doubles are order-dependent in IEEE arithmetic;
  * every cross-group sum here goes through a per-term decimal cast so the
  * (exact, associative) decimal sum is engine-independent.
  */
object GroupByExplain {

  /** Per-term decimal for medium-magnitude values (|v| < 1e9). */
  val dval: DecimalType = DecimalType(18, 6)
  /** Per-term decimal for large-magnitude values (|v| < 1e13). */
  val dbig: DecimalType = DecimalType(24, 2)

  def dvalSql(c: String) = s"CAST(SUM(CAST($c AS DECIMAL(18,6))) AS DOUBLE)"
  def dbigSql(c: String) = s"CAST(SUM(CAST($c AS DECIMAL(24,2))) AS DOUBLE)"

  def sigmaExpr(sv: Column, svv: Column, k: Column): Column =
    sqrt(greatest(svv / k - (sv / k) * (sv / k), lit(0.0)))

  def sigmaSql(sv: String, svv: String, k: String): String =
    s"SQRT(GREATEST($svv / $k - ($sv / $k) * ($sv / $k), 0))"

  /** Standardized deviation per (measure, grp): z = |v − μ| / σ (0 when
    * σ≈0). ONE aggregation gathers the per-measure groups and the z
    * math runs as array expressions — joining the stats back onto the
    * melt would reference (and re-plan) the source subtree twice.
    * Decimal sums keep the stats order-independent. Cardinality
    * contract: one row holds every group of a measure — sized for
    * explanation-grade groupbys (the exceptionality measure itself is
    * meaningless over ID-like grouping keys); enforced fail-fast by
    * [[graft.util.Guard.cellCap]]. */
  def zdev(m: DataFrame): DataFrame = {
    val g = m.groupBy("measure")
      .agg(count(lit(1)).as("n_groups"),
        sum(col("v").cast(dval)).cast(DoubleType).as("sv"),
        sum((col("v") * col("v")).cast(dbig)).cast(DoubleType).as("svv"),
        collect_list(struct(col("grp"), col("v"))).as("cells"))
      .withColumn("n_groups",
        graft.util.Guard.cellCap(col("n_groups"), col("n_groups"), "GroupByExplain.zdev"))
    val mu = col("sv") / col("n_groups")
    val sigma = sigmaExpr(col("sv"), col("svv"), col("n_groups"))
    g.select(col("measure"), col("n_groups"), explode(transform(col("cells"), c => struct(
        c.getField("grp").as("grp"), c.getField("v").as("value"),
        when(sigma > 1e-12, graft.util.D.r(abs(c.getField("v") - mu) / sigma, 6))
          .otherwise(lit(0.0)).as("zdev")))).as("p"))
      .select(col("measure"), col("p.grp").as("grp"), col("p.value").as("value"),
        col("n_groups"), col("p.zdev").as("zdev"))
  }

  /** Exceptionality per measure = max standardized deviation. */
  def exceptionality(m: DataFrame): DataFrame =
    zdev(m).groupBy("measure")
      .agg(max(col("n_groups")).as("n_groups"), max(col("zdev")).as("exceptionality"))

  /** DuckDB CTE: melted orders measures → z table. `meltSql` must yield
    * columns (measure, grp, v). */
  def zdevSql(meltSql: String): String =
    s"""WITH m AS ($meltSql),
       |s AS (SELECT measure, COUNT(*) AS n_groups,
       |  ${dvalSql("v")} AS sv, ${dbigSql("v * v")} AS svv
       |  FROM m GROUP BY measure),
       |z AS (SELECT m.measure, m.grp, m.v AS value, s.n_groups,
       |  CASE WHEN ${sigmaSql("s.sv", "s.svv", "s.n_groups")} > 1e-12
       |       THEN ROUND(ABS(m.v - s.sv / s.n_groups) / ${sigmaSql("s.sv", "s.svv", "s.n_groups")}, 6)
       |       ELSE 0.0 END AS zdev
       |  FROM m JOIN s ON m.measure = s.measure)""".stripMargin
}
