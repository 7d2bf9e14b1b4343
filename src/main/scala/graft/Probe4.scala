package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the library surface): explain +
  * time the queries whose sf0.1→sf1 growth exceeded 10× in BENCH, to
  * find the superlinear plan element. */
object Probe4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/bench-sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_decontaminate", "q_events_json", "q_dedup_norm")
    names.foreach { n =>
      val times = (1 to 3).map { _ =>
        val df = SparkEntry.queries(n)(spark, sfDir)
        val t0 = System.nanoTime()
        df.count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        t
      }
      println(s"===== $n  reps=${times.map(t => f"$t%.2f").mkString(", ")} s =====")
    }
    spark.stop()
  }
}
