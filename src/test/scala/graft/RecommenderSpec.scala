package graft

import graft.core.{ExplainFrame, QueryLog, QueryRecommender}
import org.scalatest.funsuite.AnyFunSuite

class RecommenderSpec extends AnyFunSuite {
  import TestSession._

  test("recommender ranks candidate queries deterministically") {
    val li = ExplainFrame(
      graft.util.D.t(spark, sf, "lineitem")
        .select("l_quantity", "l_extendedprice", "l_discount", "l_returnflag"),
      "lineitem")
    val rec1 = QueryRecommender.recommend(li, topK = 3)
    val rec2 = QueryRecommender.recommend(li, topK = 3)
    assert(rec1 === rec2)
    assert(rec1.length === 3)
    assert(rec1.head._2 >= rec1.last._2)
  }

  test("query log ranks by score") {
    val log = new QueryLog
    log.log("df", "q1", 0.5)
    log.log("df", "q2", 0.9)
    log.log("df", "q3", 0.1)
    assert(log.top(2).map(_._2) === Seq("q2", "q1"))
    assert(log.size === 3)
  }

  test("unified score mirrors the reference's score_queries") {
    // all scores <= 1: plain geometric mean of the top 4
    val s1 = QueryRecommender.unifiedScore(Seq(0.5, 0.5))
    assert(math.abs(s1 - 0.5) < 1e-12)
    // any score > 1: log10 squash by the max before the mean
    val s2 = QueryRecommender.unifiedScore(Seq(9.0, 99.0))
    val mx = math.log10(100.0)
    val expect = math.sqrt((math.log10(10.0) / (1 + mx)) * (mx / (1 + mx)))
    assert(math.abs(s2 - expect) < 1e-12)
    // only the top 4 scores participate
    assert(QueryRecommender.unifiedScore(Seq(1.0, 1.0, 1.0, 1.0, 0.0)) === 1.0)
    assert(QueryRecommender.unifiedScore(Nil) === 0.0)
  }

  test("logged queries re-score and rank against a frame") {
    import graft.core.LoggedQuery
    val li = ExplainFrame(
      graft.util.D.t(spark, sf, "lineitem")
        .select("l_quantity", "l_extendedprice", "l_discount", "l_returnflag"),
      "lineitem")
    val log = new QueryLog
    log.logStructured(LoggedQuery("lineitem", "filter", "l_quantity", ">=", "25.0"), 0.1)
    log.logStructured(LoggedQuery("lineitem", "groupby", "l_returnflag", "mean", "l_extendedprice"), 0.2)
    // a logged query whose column no longer exists is skipped, not fatal
    log.logStructured(LoggedQuery("lineitem", "filter", "dropped_col", "<", "1.0"), 0.9)
    // a different frame's queries never leak into this frame's ranking
    log.logStructured(LoggedQuery("orders", "filter", "o_totalprice", ">=", "100.0"), 0.9)
    val ranked = QueryRecommender.recommendFromLog(log, li, topK = 5)
    assert(ranked.map(_._1.display).toSet ===
      Set("l_quantity >= 25.0", "groupby(l_returnflag).mean(l_extendedprice)"))
    assert(ranked.forall(_._2 >= 0.0))
    assert(ranked.map(_._2) === ranked.map(_._2).sorted(Ordering[Double].reverse))
    // deterministic
    assert(ranked === QueryRecommender.recommendFromLog(log, li, topK = 5))
    // CSV round-trip preserves the structured entries and their ranking
    val path = java.nio.file.Files.createTempFile("qlog", ".csv").toString
    log.save(path)
    val loaded = QueryLog.load(path)
    assert(loaded.structuredFor("lineitem") === log.structuredFor("lineitem"))
    assert(QueryRecommender.recommendFromLog(loaded, li, topK = 5) === ranked)
  }

  test("logged joins re-score against an aux frame registry") {
    import graft.core.LoggedQuery
    val li = ExplainFrame(
      graft.util.D.t(spark, sf, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"),
      "lineitem")
    val orders = ExplainFrame(
      graft.util.D.t(spark, sf, "orders")
        .withColumnRenamed("o_orderkey", "l_orderkey")
        .select("l_orderkey", "o_totalprice", "o_orderpriority"),
      "orders")
    val log = new QueryLog
    log.logStructured(LoggedQuery("lineitem", "join", "l_orderkey", "inner", "orders"), 0.3)
    log.logStructured(LoggedQuery("lineitem", "filter", "l_quantity", ">=", "25.0"), 0.1)
    // a join whose right frame is not in aux is skipped, not fatal
    log.logStructured(LoggedQuery("lineitem", "join", "l_orderkey", "inner", "missing_frame"), 0.9)
    val aux = Map("orders" -> orders)
    val ranked = QueryRecommender.recommendFromLog(log, li, topK = 5, aux = aux)
    assert(ranked.map(_._1.display).toSet ===
      Set("merge(orders, on=l_orderkey, how=inner)", "l_quantity >= 25.0"))
    // the join actually re-applied and produced a scoreable explanation
    val joinScore = ranked.collectFirst { case (q, s) if q.kind == "join" => s }
    assert(joinScore.exists(_ >= 0.0))
    // without aux, joins are skipped entirely (filters still rank)
    assert(QueryRecommender.recommendFromLog(log, li, topK = 5)
      .map(_._1.kind).toSet === Set("filter"))
    // deterministic + CSV round-trip covers the join kind
    assert(ranked === QueryRecommender.recommendFromLog(log, li, topK = 5, aux = aux))
    val path = java.nio.file.Files.createTempFile("qlogj", ".csv").toString
    log.save(path)
    assert(QueryRecommender.recommendFromLog(QueryLog.load(path), li, topK = 5, aux = aux) === ranked)
  }
}
