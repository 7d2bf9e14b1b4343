package graft

import graft.dedup.Cluster
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClusterSpec extends AnyFunSuite {
  import TestSession._

  private def pairsOf(es: (Long, Long)*) = {
    import spark.implicits._
    es.toSeq.toDF("doc_a", "doc_b")
  }

  test("connectedComponents labels every component by its min id") {
    // {1,2,3,5} via 1-2, 2-3, 5-3; {10,11}; {20,21,22}
    val cc = Cluster.connectedComponents(
      pairsOf(1L -> 2L, 2L -> 3L, 10L -> 11L, 20L -> 21L, 21L -> 22L, 5L -> 3L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(cc.toSeq === Seq(
      (1L, 1L, 4L), (1L, 2L, 4L), (1L, 3L, 4L), (1L, 5L, 4L),
      (10L, 10L, 2L), (10L, 11L, 2L),
      (20L, 20L, 3L), (20L, 21L, 3L), (20L, 22L, 3L)))
  }

  test("connectedComponents converges on a chain (diameter > 1 round)") {
    // path 1-2-3-...-9: min label must flood 8 hops
    val es = (1L until 9L).map(i => i -> (i + 1))
    val cc = Cluster.connectedComponents(pairsOf(es: _*))
    assert(cc.select("cluster_id").distinct().collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(cc.count() === 9)
  }

  test("duplicate and reversed edges do not change the components") {
    val cc = Cluster.connectedComponents(
      pairsOf(2L -> 1L, 1L -> 2L, 1L -> 2L, 3L -> 2L))
    assert(cc.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 1L), (1L, 2L), (1L, 3L)))
  }

  test("pointer jumping converges a 512-node chain inside the 30-round bound") {
    // diameter 511: one-hop flooding alone would need 511 rounds and hit
    // the fail-fast; path halving needs ~log2(511) + slack
    val es = (1L until 512L).map(i => i -> (i + 1))
    val cc = Cluster.connectedComponents(pairsOf(es: _*))
    assert(cc.filter(col("cluster_id") === 1L).count() === 512)
    assert(cc.select("cluster_id").distinct().count() === 1)
  }

  test("MaxIterations turns a beyond-bound diameter into a loud error") {
    val prev = Cluster.MaxIterations
    Cluster.MaxIterations = 2
    try {
      val es = (1L until 9L).map(i => i -> (i + 1))
      val ex = intercept[IllegalStateException] {
        Cluster.connectedComponents(pairsOf(es: _*))
      }
      assert(ex.getMessage.contains("MaxIterations"))
    } finally Cluster.MaxIterations = prev
  }

  test("minhashClusters groups an injected near-dup family transitively") {
    // A=doc 0 verbatim, B=doc 0 with one word changed, C=B with another
    // word changed: A-B and B-C collide in some band, A-C may not — the
    // cluster must still contain all three via transitivity
    val docs = graft.util.D.t(spark, sf, "documents")
    val base = docs.filter(col("doc_id") === 0).select(col("text")).head().getString(0)
    val b = base.replaceFirst("^\\S+", "zzzchanged")
    val c = b.replaceFirst("(\\S+)$", "zzztail")
    import spark.implicits._
    val extra = Seq((200001L, base), (200002L, b), (200003L, c))
      .toDF("doc_id", "text")
    val d2 = docs.select(col("doc_id"), col("text")).unionByName(extra)
    val cc = Cluster.minhashClusters(d2, 0.3)
    val cl = cc.filter(col("doc_id").isin(0L, 200001L, 200002L, 200003L))
      .select("cluster_id").distinct().collect()
    assert(cl.length === 1, "the injected near-dup family must form ONE cluster")
  }

  test("connectedComponents leaves no cache-manager entries behind") {
    val cm = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager
    spark.catalog.clearCache()
    Cluster.connectedComponents(pairsOf(1L -> 2L, 2L -> 3L)).collect()
    assert(cm.isEmpty, "localCheckpoint must not register cache-manager entries")
  }
}
