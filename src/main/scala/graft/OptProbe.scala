package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round phase probe (dev tooling, not library surface).
  *
  * For each named query (default: all), runs `--reps` reps (default 3)
  * and on the LAST (warm) rep splits the timed window into
  *   build   — the `fn(spark, dir)` call (includes any bounded
  *             construction-time collects: qcut boundaries, stat tables)
  *   plan    — analysis + optimization + physical planning
  *             (forcing `queryExecution.executedPlan`)
  *   exec    — the action itself (count on the planned frame)
  * and prints plan-shape counters from the FINAL adaptive plan
  * (exchanges, scans, windows, generates, joins by strategy, codegen
  * spans). Identifies whether a slow query is fixed-overhead-bound
  * (build+plan) or data-bound (exec) — guide §1 "measure first".
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    var reps = 3
    var sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case "--sf" => sfDir = args(i + 1); i += 2
        case q => names += q; i += 1
      }
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // job/stage/task counters (per warm rep) — which variant schedules
    // more work is otherwise invisible at these runtimes
    val nJobs = new java.util.concurrent.atomic.AtomicInteger
    val nStages = new java.util.concurrent.atomic.AtomicInteger
    val nTasks = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        nJobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        nStages.incrementAndGet(); nTasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val qs = if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted else names.toSeq
    println(f"${"query"}%-36s ${"total"}%8s ${"build"}%7s ${"plan"}%7s ${"exec"}%7s  shape")
    qs.foreach { n =>
      val fn = SparkEntry.queries(n)
      // warmups
      (1 until reps).foreach { _ =>
        try { fn(spark, sfDir).count() } catch { case _: Throwable => }
        spark.catalog.clearCache(); System.gc(); Thread.sleep(150)
      }
      try {
        nJobs.set(0); nStages.set(0); nTasks.set(0)
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        val qe = df.queryExecution
        qe.executedPlan // force planning
        val t2 = System.nanoTime()
        df.count()
        val t3 = System.nanoTime()
        // plan-shape counters from the final (post-AQE) plan string
        val s = qe.executedPlan.toString
        def c(p: String) = p.r.findAllIn(s).length
        val shape = Seq(
          "xch=" + c("Exchange "), "scan=" + c("FileScan|Scan parquet"),
          "win=" + c("Window "), "gen=" + c("Generate "),
          "smj=" + c("SortMergeJoin"), "bhj=" + c("BroadcastHashJoin"),
          "shj=" + c("ShuffledHashJoin"), "bnl=" + c("BroadcastNestedLoop"),
          "agg=" + c("HashAggregate"), "sort=" + c("(?m)^\\s*[+:]?-? ?\\*?\\(?\\d*\\)? ?Sort "),
          "cg=" + c("WholeStageCodegen")).mkString(" ")
        println(f"$n%-36s ${(t3 - t0) / 1e9}%8.3f ${(t1 - t0) / 1e9}%7.3f ${(t2 - t1) / 1e9}%7.3f ${(t3 - t2) / 1e9}%7.3f  jobs=${nJobs.get} stg=${nStages.get} tsk=${nTasks.get} $shape")
      } catch { case e: Throwable =>
        println(f"$n%-36s FAILED: ${e.getMessage}")
      }
      spark.catalog.clearCache(); System.gc(); Thread.sleep(150)
    }
    spark.stop()
  }
}
