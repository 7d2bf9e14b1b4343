package graft
import graft.core.ExplainFrame
import org.apache.spark.sql.functions._
/** Sample program through the public library API (pd-explain-style flow). */
object ApiDemo {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = ExplainFrame(util.D.t(spark, "/root/testdata/sf0.001", "lineitem"), "lineitem")
    val filtered = li.filter(col("l_quantity") >= 30)
    println("== fedex explanation of the filter ==")
    filtered.explainFedex(topK = 3).show(false)
    println(filtered.explanationText(filtered.explainFedex(topK = 1).head()))
    val g = li.groupBy("l_returnflag").mean("l_extendedprice")
    println("== outlier explanation for group R ==")
    g.explainOutlier("R", "high", Seq("l_quantity", "l_discount")).show(3, false)
    println("== groupby exceptionality ==")
    g.explainFedex(topK = 4).show(false)
    println("== correlation-pruned attributes (corr_TH=0.7) ==")
    filtered.correlatedAttributes("l_quantity").show(false)
    println("== unified explain dispatch: shapley ==")
    filtered.explain("shapley").show(5, false)
    println("== automated exploration (2 iterations) ==")
    graft.core.AutoExplore.explore(
      ExplainFrame(util.D.t(spark, "/root/testdata/sf0.001", "lineitem")
        .select("l_quantity", "l_extendedprice", "l_discount", "l_returnflag"), "lineitem"),
      iterations = 2)
      .steps.foreach(s => println(s"[${s.iteration}] ${s.kind}: ${s.query} score=${s.score}"))
    println("== composable series masks (ExpSeries idiom) ==")
    val mask = (li.series("l_quantity") >= 30) && (li.series("l_discount") < 0.05)
    println(s"mask: ${mask.desc} -> ${mask().df.count()} rows")
    mask.explain(topK = 2).show(false)
    println("== metainsight auto-search over orders ==")
    val orders = ExplainFrame(util.D.t(spark, "/root/testdata/sf0.001", "orders"), "orders")
    orders.explainMetaInsightAuto(topK = 3).show(false)
    println("== many-to-one with quantile binning (reference defaults relaxed) ==")
    val cust = ExplainFrame(util.D.t(spark, "/root/testdata/sf0.001", "customer"), "customer")
    cust.explain("many_to_one", labelCol = "c_mktsegment",
        catAttrs = Seq("c_nationkey"), numAttrs = Seq("c_acctbal"),
        coverageThreshold = 0.3, separationThreshold = 0.7)
      .filter(col("passes") === 1)
      .select("label", "attribute", "val", "coverage", "separation_err", "error_explanation")
      .show(5, false)
    println("== many-to-one: max_dist label pruning + schema rename ==")
    cust.explain("many_to_one", labelCol = "c_nationkey",
        numAttrs = Seq("c_acctbal"), coverageThreshold = 0.05,
        separationThreshold = 0.95, pruningMethod = "max_dist",
        schema = Map("c_acctbal" -> "account_balance"))
      .filter(col("passes") === 1).show(3, false)
    println("== corpus prep: decontaminate / repetition / domain mix ==")
    val docs = util.D.t(spark, "/root/testdata/sf0.001", "documents")
    graft.text.Corpus.decontaminate(docs, pmod(col("doc_id"), lit(97)) === 0).show(3, false)
    graft.text.Corpus.repetitionStats(docs).filter(col("flagged") === 1).show(3, false)
    graft.text.Corpus.domainMix(docs, budgetTokens = 500.0).show(false)
    println("== kmin sketch from SQL after registration ==")
    graft.functions.GraftFunctions.register(spark)
    docs.createOrReplaceTempView("docs")
    spark.sql(
      """SELECT source, kmin(xxhash64(text), 8) AS sketch
        |FROM docs GROUP BY source ORDER BY source LIMIT 3""".stripMargin).show(false)
    spark.stop()
  }
}
