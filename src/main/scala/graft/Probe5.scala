package graft

import org.apache.spark.sql.SparkSession
import graft.explain.Correlation

/** Scratch profiling main (not part of the library surface): bisect the
  * q_groupby_corr_matrix cost — moment count vs group-key count vs
  * output stage. */
object Probe5 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      (1 to 2).foreach { i =>
        val df = f
        val t0 = System.nanoTime()
        df.collect()
        val t = (System.nanoTime() - t0) / 1e9
        if (i == 2) println(f"[p5] $name%-36s warm $t%6.2f s")
      }
    }
    val c2 = Seq("l_quantity", "l_extendedprice")
    val c3 = c2 :+ "l_discount"
    time("pearsonBy 1pair")(Correlation.pearsonBy(li, "l_returnflag", c2(0), c2(1)))
    time("matrix 2cols")(Correlation.pearsonMatrixBy(li, Seq("l_returnflag"), c2))
    time("matrix 3cols")(Correlation.pearsonMatrixBy(li, Seq("l_returnflag"), c3))
    time("pearson global 3pairs")(Correlation.pearson(li,
      Seq((c3(0), c3(1)), (c3(0), c3(2)), (c3(1), c3(2)))))
    spark.stop()
  }
}
