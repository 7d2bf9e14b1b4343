package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scratch profiling main (not part of the library surface): is the
  * grouped moment aggregate slow because of (a) decimal side-sum
  * buffers, (b) the quantizer projection, or (c) buffer width? */
object Probe6 {
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
      var plan = ""
      (1 to 2).foreach { i =>
        val df = f
        val t0 = System.nanoTime()
        df.collect()
        val t = (System.nanoTime() - t0) / 1e9
        plan = df.queryExecution.executedPlan.toString
        if (i == 2) {
          val agg = if (plan.contains("SortAggregate")) "SORT" else "hash"
          println(f"[p6] $name%-36s warm $t%6.2f s agg=$agg")
        }
      }
    }
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val moments = cols.map(c => s"m_$c" -> col(c)) ++
      cols.map(c => s"q_$c" -> (col(c) * col(c))) ++
      Seq("p_a" -> (col(cols(0)) * col(cols(1))),
        "p_b" -> (col(cols(0)) * col(cols(2))),
        "p_c" -> (col(cols(1)) * col(cols(2))))
    // quantizer identical to Correlation.quantCols fast path
    def quant(c: org.apache.spark.sql.Column) = {
      val y = c.cast(DoubleType) * 1e6
      val d = y - floor(y)
      when(abs(y) < 9.0e18,
        when(abs(d - 0.5) > abs(y) * 1.8e-15 + 1e-12, floor(y + 0.5))
          .otherwise((c.cast(DecimalType(30, 6)) * 1000000).cast(LongType)))
    }
    def side(c: org.apache.spark.sql.Column) =
      when(c.isNotNull && !(abs(c.cast(DoubleType) * 1e6) < 9.0e18),
        (c.cast(DecimalType(38, 6)) * 1000000).cast(DecimalType(38, 0)))

    time("grouped longs only (27 sums)") {
      val proj = li.select(col("l_returnflag") +: moments.map { case (n, e) => quant(e).as(n) }: _*)
      val aggs = moments.map(_._1).flatMap(n => Seq(
        sum(shiftright(col(n), 42)).as(s"${n}__h"),
        sum(shiftright(col(n), 21).bitwiseAND(lit(2097151L))).as(s"${n}__m"),
        sum(col(n).bitwiseAND(lit(2097151L))).as(s"${n}__l"))) :+ count(lit(1)).as("n")
      proj.groupBy("l_returnflag").agg(aggs.head, aggs.tail: _*)
    }
    time("grouped longs + decimal sides") {
      val proj = li.select(col("l_returnflag") +:
        (moments.map { case (n, e) => quant(e).as(n) } ++
          moments.map { case (n, e) => side(e).as(s"${n}__sv") }): _*)
      val aggs = moments.map(_._1).flatMap(n => Seq(
        sum(shiftright(col(n), 42)).as(s"${n}__h"),
        sum(shiftright(col(n), 21).bitwiseAND(lit(2097151L))).as(s"${n}__m"),
        sum(col(n).bitwiseAND(lit(2097151L))).as(s"${n}__l"))) ++
        moments.map { case (n, _) => sum(col(s"${n}__sv")).as(s"${n}__side") } :+
        count(lit(1)).as("n")
      proj.groupBy("l_returnflag").agg(aggs.head, aggs.tail: _*)
    }
    time("grouped longs + 9 extra longs") {
      val proj = li.select(col("l_returnflag") +:
        (moments.map { case (n, e) => quant(e).as(n) } ++
          moments.map { case (n, e) => shiftright(quant(e), 42).as(s"${n}__sv") }): _*)
      val aggs = moments.map(_._1).flatMap(n => Seq(
        sum(shiftright(col(n), 42)).as(s"${n}__h"),
        sum(shiftright(col(n), 21).bitwiseAND(lit(2097151L))).as(s"${n}__m"),
        sum(col(n).bitwiseAND(lit(2097151L))).as(s"${n}__l"))) ++
        moments.map { case (n, _) => sum(col(s"${n}__sv")).as(s"${n}__side") } :+
        count(lit(1)).as("n")
      proj.groupBy("l_returnflag").agg(aggs.head, aggs.tail: _*)
    }
    time("grouped longs + DECIMAL(18) sides") {
      val proj = li.select(col("l_returnflag") +:
        (moments.map { case (n, e) => quant(e).as(n) } ++
          moments.map { case (n, e) => side(e).cast(DecimalType(18, 0)).as(s"${n}__sv") }): _*)
      val aggs = moments.map(_._1).flatMap(n => Seq(
        sum(shiftright(col(n), 42)).as(s"${n}__h"),
        sum(shiftright(col(n), 21).bitwiseAND(lit(2097151L))).as(s"${n}__m"),
        sum(col(n).bitwiseAND(lit(2097151L))).as(s"${n}__l"))) ++
        moments.map { case (n, _) => sum(col(s"${n}__sv")).as(s"${n}__side") } :+
        count(lit(1)).as("n")
      proj.groupBy("l_returnflag").agg(aggs.head, aggs.tail: _*)
    }
    time("global longs + decimal sides") {
      val proj = li.select(
        (moments.map { case (n, e) => quant(e).as(n) } ++
          moments.map { case (n, e) => side(e).as(s"${n}__sv") }): _*)
      val aggs = moments.map(_._1).flatMap(n => Seq(
        sum(shiftright(col(n), 42)).as(s"${n}__h"),
        sum(shiftright(col(n), 21).bitwiseAND(lit(2097151L))).as(s"${n}__m"),
        sum(col(n).bitwiseAND(lit(2097151L))).as(s"${n}__l"))) ++
        moments.map { case (n, _) => sum(col(s"${n}__sv")).as(s"${n}__side") } :+
        count(lit(1)).as("n")
      proj.agg(aggs.head, aggs.tail: _*)
    }
    spark.stop()
  }
}
