package graft
import org.apache.spark.sql.SparkSession
object Probe6 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    for (name <- args; rep <- 1 to 2) {
      var t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      df.queryExecution.executedPlan
      val tPlan = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      df.count()
      val tExec = (System.nanoTime() - t0) / 1e9
      println(f"[probe6] $name rep$rep build=$tBuild%6.2f plan=$tPlan%6.2f exec=$tExec%6.2f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
