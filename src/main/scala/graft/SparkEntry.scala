package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.D._

/** Driver contract — see /root/repo/SURVEY.md §2 + §7. */
object SparkEntry {

  /** All implemented query families (SURVEY.md §2). */
  private def families: Seq[QFamily] = Seq(
    operators.Relational,
    explain.Explainers,
    operators.Pipeline,
    operators.Events
  )

  private lazy val all: Seq[QDef] = families.flatMap(_.defs)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q3 shape: top unshipped orders by revenue for one segment. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    t(spark, dir, "lineitem")
      .join(t(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(spark, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .filter(col("c_mktsegment") === "BUILDING")
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(dsumprod(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Total registered QDefs (duplicate names would silently collapse in
    * the `queries` map — guarded by QuerySpec). */
  def registeredCount: Int = all.size

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(d => d.name -> d.fn).toMap

  /** DuckDB-runnable oracle SQL per query (same parquet tables). */
  def oracleSql: Map[String, String] =
    all.flatMap(d => d.sql.map(d.name -> _)).toMap
}
