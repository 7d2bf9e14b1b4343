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
    for (name <- args) {
      if (sys.env.contains("PROBE_EXPLAIN")) qs(name)(spark, sfDir).explain("formatted")
      for (i <- 1 to 2) {
        // fresh build per rep — matches Bench's measurement (a reused
        // DataFrame re-executes a stale AQE plan after clearCache)
        val df = qs(name)(spark, sfDir)
        val t0 = System.nanoTime()
        df.count()
        println(f"[probe3] $name rep$i ${(System.nanoTime() - t0) / 1e9}%8.2f s")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
