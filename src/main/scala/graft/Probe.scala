package graft

import org.apache.spark.sql.SparkSession

/** Parameterized perf diagnostic (dev tooling, not library surface).
  *
  * Usage: `runMain graft.Probe [--reps N] [--plan] [--sf DIR] [query...]`
  *  - times each named `SparkEntry.queries` entry (default: all) for N
  *    reps (default 3) against DIR (default $SPARK_GRAFT_SF_DIR or
  *    sf0.1), with the same outside-the-timed-window clearCache + GC
  *    cadence as Bench (ContextCleaner reclaims broadcast/shuffle state
  *    only after a JVM GC — without it later queries pay for earlier
  *    ones' accumulated state);
  *  - `--plan` additionally executes the query once and dumps the final
  *    adaptive executed plan (AQE hides codegen markers until execution).
  *
  * Replaces the one-shot Probe1–9 investigation mains; their findings
  * live where they were applied: decimal-vs-all-long grouped buffers in
  * explain/Correlation.scala, native expressions replacing HOF/regex
  * chains in functions/, per-query GC cadence in Bench.scala.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    var reps = 3
    var plan = false
    var sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    def flagValue(i: Int): String = {
      require(i + 1 < args.length, s"${args(i)} needs a value " +
        "(usage: [--reps N] [--plan] [--sf DIR] [query...])")
      args(i + 1)
    }
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--reps" =>
          reps = flagValue(i).toIntOption.getOrElse(
            sys.error(s"--reps needs an integer, got ${args(i + 1)}")); i += 2
        case "--plan" => plan = true; i += 1
        case "--sf" => sfDir = flagValue(i); i += 2
        case q => names += q; i += 1
      }
    }
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect() // JIT warmup
    val qs = if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted else names.toSeq
    qs.foreach { n =>
      val fn = SparkEntry.queries(n)
      val times = (1 to reps).map { _ =>
        // construction inside the window (Bench convention: bounded
        // build-time collects must not escape the measurement)
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir) // fresh build per rep (stale-AQE trap)
        df.count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        System.gc()
        // let the ContextCleaner drain outside the next rep's window
        // (the Bench convention — the deletion IO otherwise lands
        // inside the next measurement)
        Thread.sleep(150)
        t
      }
      println(f"$n%-32s ${times.map(t => f"$t%8.3f").mkString(" ")}")
      if (plan) {
        val df = fn(spark, sfDir)
        // execute THIS df's own plan tree (a noop write or count()
        // builds a separate QueryExecution and leaves this one with
        // isFinalPlan=false): run it as an RDD so AQE finalizes
        // without collecting the result to the driver
        df.queryExecution.executedPlan.execute().count()
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
