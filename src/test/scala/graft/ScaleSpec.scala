package graft

import graft.util.Scale
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleSpec extends AnyFunSuite {
  import TestSession._

  test("bucketed join runs without a shuffle exchange") {
    val li = graft.util.D.t(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = graft.util.D.t(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    Scale.writeBucketed(li, "li_b", "l_orderkey", 4)
    Scale.writeBucketed(o, "o_b", "l_orderkey", 4)
    val joined = spark.table("li_b").join(spark.table("o_b"), "l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() > 0)
  }

  test("partition pruning reaches the scan on a date-partitioned copy") {
    val base = graft.util.D.t(spark, sf, "lineitem")
      .withColumn("ship_year", org.apache.spark.sql.functions.year(col("l_shipdate")))
    val path = "/tmp/graft_part_li"
    base.write.mode("overwrite").partitionBy("ship_year").parquet(path)
    val pruned = spark.read.parquet(path).filter(col("ship_year") === 1996)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("1996"),
      s"partition filter not pushed:\n${plan.take(1200)}")
    assert(pruned.count() > 0)
  }

  test("salted sum equals direct sum") {
    val li = graft.util.D.t(spark, sf, "lineitem")
    val direct = li.groupBy("l_returnflag")
      .agg(graft.util.D.dsumd(col("l_quantity")).as("total"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Scale.saltedSum(li, "l_returnflag", "l_quantity", 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted === direct)
  }

  test("auto-exploration produces a deterministic drill-down") {
    import graft.core.{AutoExplore, ExplainFrame}
    val li = ExplainFrame(
      graft.util.D.t(spark, sf, "lineitem")
        .select("l_quantity", "l_extendedprice", "l_discount", "l_returnflag"),
      "lineitem")
    val steps = AutoExplore.explore(li, iterations = 2)
    assert(steps.length === 2)
    assert(steps.map(_.iteration) === Seq(1, 2))
    assert(steps.forall(_.topExplanation.nonEmpty))
    val again = AutoExplore.explore(li, iterations = 2)
    assert(steps.map(s => (s.query, s.score)) === again.map(s => (s.query, s.score)))
  }
}
