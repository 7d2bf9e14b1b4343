package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + invariants for the driver contract: every registered query
  * runs at sf0.001 and returns a sane result. */
class QuerySpec extends AnyFunSuite {
  import TestSession._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() === 10)
  }

  test("every query runs and is non-empty at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("no duplicate query names collapse in the registry") {
    assert(SparkEntry.queries.size === SparkEntry.registeredCount)
  }

  test("oracleSql covers every query (tolerance oracles close the last gaps)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing === Set.empty[String], s"oracle-less queries: $missing")
  }

  test("q_groupby_agg counts sum to lineitem size") {
    import org.apache.spark.sql.functions._
    val total = SparkEntry.queries("q_groupby_agg")(spark, sf)
      .agg(sum("count_order")).head().getLong(0)
    assert(total === graft.util.D.t(spark, sf, "lineitem").count())
  }
}
