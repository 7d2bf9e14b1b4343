package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the dirty-data contracts the round-8 fixture audit established
  * (see BASELINE.md "dirty"): null values have no bin, null keys form
  * no groups/baskets, null text produces no chunks/tokens but keeps its
  * metadata row, and the imperative paths never NPE. These are the
  * regression tests for the 3-crash / 13-divergence class — the fixture
  * evidence lives in CORRECTNESS_dirty_r08.json; this spec keeps the
  * semantics from silently regressing between audits. */
class DirtySpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("binExpr is null-preserving (least() must not file nulls in the top bin)") {
    val rows = Seq[(java.lang.Double, Int)]((0.0, 0), (5.0, 0), (10.0, 0), (null, 0))
      .toDF("x", "k")
    val out = rows.select(
      graft.explain.Fedex.binExpr(col("x"), lit(0.0), lit(10.0), 10).as("bin"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(out.toSeq === Seq(0, 5, 9, null))
    // degenerate lo == hi range must also stay null for null input
    val deg = rows.select(
      graft.explain.Fedex.binExpr(col("x"), lit(3.0), lit(3.0), 10).as("bin"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getInt(0))
    assert(deg.toSeq === Seq(0, 0, 0, null))
  }

  test("CDC chunker: null text yields no chunks, no NPE") {
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, null.asInstanceOf[String]), (3L, "")).toDF("doc_id", "text")
    val out = graft.text.Cdc.chunkHashes(spark, docs)
    val ids = out.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(!ids.contains(2L) && !ids.contains(3L))
    assert(ids.contains(1L))
  }

  test("media decode: null body keeps its row with all-null metadata") {
    val docs = Seq((1L, "hello media body"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = graft.multimodal.Multimodal.decodeMeta(spark, docs)
      .orderBy("doc_id").collect()
    assert(out.length === 2)
    assert(out(0).getString(5) != null)           // real format decoded
    assert(out(1).isNullAt(1) && out(1).isNullAt(5)) // null byte_len + format
  }

  test("bagFingerprint: null text stays null, distinct from empty text") {
    val out = Seq((1L, ""), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
      .select(graft.text.TextOps.bagFingerprint(col("text")).as("fp"))
      .collect()
    assert(out(0).getString(0) != null)
    assert(out(1).isNullAt(0))
  }

  test("connectedComponents ignores nothing it is given: null-free edge contract") {
    // closure inputs are pair tables built upstream; document the cast
    // behavior: null ids become null src/dst and never join, so they
    // cannot corrupt labels
    val pairs = Seq[(java.lang.Long, java.lang.Long)]((1L, 2L), (null, 3L))
      .toDF("doc_a", "doc_b")
    val cc = graft.dedup.Cluster.connectedComponents(pairs)
    val byId = cc.collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(byId(1L) === 1L && byId(2L) === 1L)
    assert(byId.get(3L) === Some(3L)) // 3's only edge has a null peer: singleton label
  }

  test("stratifiedSplit keeps the NULL stratum (null-safe offset join)") {
    val docs = (1L to 40L).map(i =>
        (i, if (i % 10 == 0) null else if (i <= 20) "en" else "fr",
          s"tok$i tok${i + 1} tok${i + 2}"))
      .toDF("doc_id", "lang", "text")
    val out = graft.text.Profile.stratifiedSplit(docs)
    val langs = out.select("lang").distinct().collect()
      .map(r => Option(r.getString(0))).toSet
    assert(langs.contains(None), "NULL stratum must survive the offset join")
    // every doc is assigned exactly once
    assert(out.agg(sum("n_docs")).head().getLong(0) === 40L)
  }
}
