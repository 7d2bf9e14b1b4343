package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: stage timing for q_dedup_ngram. */
object Probe8 {
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        val t = (System.nanoTime() - t0) / 1e9
        if (i == 2) println(f"[p8] $name%-42s warm $t%6.2f s (n=$n)")
      }
    }
    time("scan: shingleHashes only") {
      docs.select(col("doc_id"), graft.functions.ShingleHashes(col("text")).as("h")).count()
    }
    time("scan: + array_sort(array_distinct)") {
      docs.select(col("doc_id"),
        array_sort(array_distinct(graft.functions.ShingleHashes(col("text")))).as("h")).count()
    }
    time("full ngramJaccard") {
      val n = graft.dedup.Dedup.ngramJaccard(docs, "source", 0.02, cache = true).count()
      spark.catalog.clearCache()
      n
    }
    spark.stop()
  }
}
