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
}
