package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val qs = SparkEntry.queries
    val split = sys.env.contains("PROBE_SPLIT") // build/plan/exec breakdown
    for (name <- args) {
      if (sys.env.contains("PROBE_EXPLAIN")) qs(name)(spark, sfDir).explain("formatted")
      for (i <- 1 to 2) {
        // fresh build per rep — matches Bench's measurement (a reused
        // DataFrame re-executes a stale AQE plan after clearCache)
        var t0 = System.nanoTime()
        val df = qs(name)(spark, sfDir)
        val tBuild = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        if (split) df.queryExecution.executedPlan
        val tPlan = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        df.count()
        val tExec = (System.nanoTime() - t0) / 1e9
        if (split)
          println(f"[probe3] $name rep$i build=$tBuild%6.2f plan=$tPlan%6.2f exec=$tExec%6.2f")
        else
          println(f"[probe3] $name rep$i $tExec%8.2f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
