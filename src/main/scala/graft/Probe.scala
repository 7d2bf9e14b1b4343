package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch profiling main (not part of the library surface). */
object Probe {
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
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      spark.catalog.clearCache()
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"[probe] docs=${docs.count()}")
    import graft.text.TextOps
    time("explode tokens count") {
      docs.select(explode(TextOps.tokens(col("text"))).as("w")).count()
    }
    time("explode shingles count") {
      docs.withColumn("w", TextOps.tokens(col("text"))).select(explode(TextOps.shinglesOf(col("w"))).as("sh")).count()
    }
    time("shingles+md5") {
      docs.withColumn("w", TextOps.tokens(col("text"))).select(explode(TextOps.shinglesOf(col("w"))).as("sh"))
        .select(md5(col("sh").cast(BinaryType)).as("h")).agg(max("h")).collect()
    }
    time("shingles+md5+conv") {
      docs.withColumn("w", TextOps.tokens(col("text"))).select(explode(TextOps.shinglesOf(col("w"))).as("sh"))
        .select(conv(substring(md5(col("sh").cast(BinaryType)), 1, 15), 16, 10).cast(LongType).as("h"))
        .agg(max("h")).collect()
    }
    time("minhashSig full") {
      graft.dedup.Dedup.minhashSig(docs).agg(max("h0")).collect()
    }
    val sh = docs.withColumn("w", TextOps.tokens(col("text")))
      .select(col("doc_id"), col("source").as("blk"),
        explode(TextOps.shinglesOf(col("w"))).as("sh0"))
      .select(col("doc_id"), col("blk"),
        conv(substring(md5(col("sh0").cast(BinaryType)), 1, 15), 16, 10).cast(LongType).as("sh"))
      .distinct()
    time("sh distinct (ngram)") { sh.count() }
    val shP = sh.persist()
    shP.count()
    time("dfs from cached sh") {
      shP.groupBy("blk", "sh").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= 100).count()
    }
    time("cand from cached sh") {
      val dfs = shP.groupBy("blk", "sh").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= 100).select("blk", "sh")
      val rare = shP.join(dfs, Seq("blk", "sh"))
      println("[probe] cand rows = " + rare.alias("a").join(rare.alias("b"),
        col("a.blk") === col("b.blk") && col("a.sh") === col("b.sh") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct().count())
    }
    spark.catalog.clearCache()
    time("ngram full") {
      graft.dedup.Dedup.ngramJaccard(docs, "source", 0.02).count()
    }
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    println(s"[probe] lineitem=${li.count()}")
    time("plain double sums x5") {
      li.agg(sum("l_quantity"), sum("l_extendedprice"), sum("l_discount"),
        sum("l_tax"), count(lit(1))).collect()
    }
    time("dec25 sums x5") {
      li.agg(sum(col("l_quantity").cast(graft.util.D.dec25)),
        sum(col("l_extendedprice").cast(graft.util.D.dec25)),
        sum(col("l_discount").cast(graft.util.D.dec25)),
        sum(col("l_tax").cast(graft.util.D.dec25)), count(lit(1))).collect()
    }
    time("dec30 product sums x3") {
      li.agg(
        sum((col("l_quantity") * col("l_extendedprice")).cast(DecimalType(30, 6))),
        sum((col("l_quantity") * col("l_discount")).cast(DecimalType(30, 6))),
        sum((col("l_extendedprice") * col("l_discount")).cast(DecimalType(30, 6)))).collect()
    }
    time("q_correlation full") {
      SparkEntry.queries("q_correlation")(spark, sfDir).count()
    }
    time("q_metainsight full") {
      SparkEntry.queries("q_metainsight")(spark, sfDir).count()
    }
    time("pearson 3 pairs") {
      graft.explain.Correlation.pearson(li, Seq(
        ("l_quantity", "l_extendedprice"), ("l_quantity", "l_discount"),
        ("l_extendedprice", "l_discount"))).collect()
    }
    time("metainsight cat+trend") {
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
      val cat = graft.explain.MetaInsight.catPatterns(o, "o_orderpriority", "o_orderstatus",
        "o_totalprice", "totalprice_mean")
      val tr = graft.explain.MetaInsight.trendPatterns(o, "o_orderpriority", month(col("o_orderdate")),
        "month", "o_totalprice", "totalprice_mean")
      graft.explain.MetaInsight.mine(cat.unionByName(tr)).collect()
    }
    spark.stop()
  }
}
