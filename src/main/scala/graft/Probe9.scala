package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: is the IVF assignment's SortAggregate the sf1 bottleneck? */
object Probe9 {
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
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
    import graft.functions.FixedDot
    val base = vecs.select(col("vec_id"), graft.sim.Ann.scaled(col("embedding")).as("fxe"))
      .withColumn("nsq", FixedDot(col("fxe"), col("fxe")))
    val cents = base.filter(col("vec_id") % 25 === 7)
      .select(col("vec_id").as("cid"), col("fxe").as("ce"), col("nsq").as("cn"))
    def scored = base.crossJoin(broadcast(cents))
      .withColumn("ccos", graft.sim.Ann.cosExpr(FixedDot(col("ce"), col("fxe")), col("cn"), col("nsq")))
    def time(name: String)(f: => Long): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        val t = (System.nanoTime() - t0) / 1e9
        if (i == 2) println(f"[p9] $name%-44s warm $t%6.2f s (n=$n)")
      }
    }
    time("scored count (crossJoin+dot only)") { scored.count() }
    time("assignment max_by(struct) [SortAggregate]") {
      scored.groupBy("vec_id").agg(max_by(col("cid"), struct(col("ccos"), -col("cid"))).as("l")).count()
    }
    time("assignment max(ccos) [HashAggregate floor]") {
      scored.groupBy("vec_id").agg(max(col("ccos")).as("m")).count()
    }
    time("assignment ArgMaxBy [ObjectHashAggregate]") {
      scored.groupBy("vec_id").agg(graft.functions.ArgMaxBy.argmax(col("cid"), col("ccos")).as("l")).count()
    }
    spark.stop()
  }
}
