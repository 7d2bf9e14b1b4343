package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: scale an sf directory up N× for BENCH evidence (the
  * driver ships sf0.001/0.01/0.1 only; BASELINE.md's amortization
  * claims need an sf1-shaped datapoint). NOT part of the library.
  *
  * Each copy i offsets every join key by i·OFF (so key cardinalities
  * scale with the data, joins stay 1:N, and no cross-copy key ever
  * collides) and PERTURBS content so similarity workloads scale the
  * way a real corpus does instead of degenerating:
  *  - documents.text goes through a per-copy consonant permutation —
  *    length, whitespace, and token shape survive (token/quality/CDC
  *    costs scale linearly) but shingles differ across copies, so
  *    minhash/simhash/ngram dedup does not see every doc as a 10-way
  *    near-duplicate (which would blow bucket pair counts up 100×);
  *  - embeddings rotate by i dimensions (norm-preserving, near-zero
  *    cosine to the original in high-d), and labels offset per copy so
  *    label-blocked dedup keeps its block-size contract;
  *  - nation/region stay fixed (dimension tables don't scale with SF).
  */
object GenScale {

  private val OFF = 10000000L

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/root/repo/bench-sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t(n: String): DataFrame = spark.read.parquet(s"$src/$n.parquet")

    val cons = "bcdfghjklmnpqrstvwxyz"
    def perm(i: Int): String = cons.drop(i % cons.length) + cons.take(i % cons.length)

    def scaled(name: String, keyCols: Seq[String],
               tweak: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until copies).map { i =>
        val base = keyCols.foldLeft(t(name))((d, k) => d.withColumn(k, col(k) + lit(i * OFF)))
        tweak(base, i)
      }.reduce(_ unionByName _)

    val tables: Seq[(String, DataFrame)] = Seq(
      "region" -> t("region"),
      "nation" -> t("nation"),
      "customer" -> scaled("customer", Seq("c_custkey")),
      "supplier" -> scaled("supplier", Seq("s_suppkey")),
      "part" -> scaled("part", Seq("p_partkey")),
      "orders" -> scaled("orders", Seq("o_orderkey", "o_custkey")),
      "lineitem" -> scaled("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey")),
      "events" -> scaled("events", Seq("event_id", "user_id")),
      "documents" -> scaled("documents", Seq("doc_id"), (d, i) =>
        if (i == 0) d
        else d.withColumn("text",
          translate(col("text"), cons + cons.toUpperCase,
            perm(i) + perm(i).toUpperCase))),
      "embeddings" -> scaled("embeddings", Seq("vec_id"), (d, i) => {
        // rotation alone has only dim distinct values (copy i >= dim
        // degenerates to identity — 37 exact-duplicate copies at
        // copies=100); compose with a norm-preserving sign flip per
        // rotation cycle so every copy stays near-orthogonal to copy 0.
        val r = i % 64
        val rot =
          if (r == 0) col("embedding")
          else concat(slice(col("embedding"), r + 1, 10000),
            slice(col("embedding"), 1, r))
        val emb = if ((i / 64) % 2 == 0) rot
                  else transform(rot, x => -x)
        d.withColumn("label", col("label") + lit(i * 1000))
          .withColumn("embedding", emb)
      })
    )
    tables.foreach { case (n, df) =>
      df.write.mode("overwrite").parquet(s"$out/$n.parquet")
      println(s"[genscale] $n -> $out/$n.parquet")
    }
    spark.stop()
  }
}
