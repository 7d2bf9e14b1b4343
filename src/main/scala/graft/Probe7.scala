package graft

import org.apache.spark.sql.SparkSession

/** Scratch: executed-plan reuse check for the simhash band join. */
object Probe7 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("q_dedup_simhash")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    println("[p7] ReusedExchange: " + plan.linesIterator.count(_.contains("ReusedExchange")))
    println("[p7] FileScans: " + plan.linesIterator.count(_.contains("FileScan parquet")))
    println("[p7] simhash60 occurrences: " + "simhash60".r.findAllIn(plan).length)
    plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("FileScan") || l.contains("Filter")).take(12).foreach(l => println("[p7] " + l.trim.take(150)))
    spark.stop()
  }
}
