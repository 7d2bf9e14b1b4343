package graft

import graft.functions.KMinAgg
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMinAgg must equal the naive "sorted distinct, take k" reference on
  * every input — including duplicates, negatives, k larger than the
  * distinct count, adversarial orderings, and multi-partition inputs
  * (its merge path). This property is what makes the sketch safe as
  * both a KMV estimator and a bounded collect. */
class KMinAggSpec extends AnyFunSuite {
  import TestSession._

  private def reference(vals: Seq[Long], k: Int): Seq[Long] =
    vals.distinct.sorted.take(k)

  private def viaAgg(vals: Seq[Long], k: Int, partitions: Int): Seq[Long] = {
    import spark.implicits._
    if (vals.isEmpty) {
      spark.createDataset(Seq.empty[Long]).toDF("v")
        .agg(KMinAgg.kmin(col("v"), k).as("hs")).head().getSeq[Long](0)
    } else {
      spark.createDataset(vals).repartition(partitions).toDF("v")
        .agg(KMinAgg.kmin(col("v"), k).as("hs")).head().getSeq[Long](0)
    }
  }

  test("matches sorted-distinct-take-k on seeded random batches incl. merge path") {
    val rng = new scala.util.Random(7)
    (1 to 25).foreach { round =>
      val nDense = rng.nextInt(150)
      val nWide = rng.nextInt(150)
      val vals = Seq.fill(nDense)(rng.nextInt(101).toLong - 50) ++ // dense duplicates
        Seq.fill(nWide)(rng.nextLong())                            // full range incl. negatives
      val k = 1 + rng.nextInt(40)
      val parts = 1 + rng.nextInt(4)
      assert(viaAgg(vals, k, parts) === reference(vals, k),
        s"round $round: n=${vals.size} k=$k parts=$parts")
    }
  }

  test("empty input yields an empty sketch; k beyond distinct count keeps all") {
    assert(viaAgg(Nil, 8, 1) === Nil)
    assert(viaAgg(Seq(3L, 1L, 3L, 2L), 100, 2) === Seq(1L, 2L, 3L))
  }

  test("grouped sketches are per-group and dedup inherent") {
    import spark.implicits._
    val rows = Seq(("a", 5L), ("a", 5L), ("a", 1L), ("b", 9L), ("b", 3L), ("a", 7L))
    val out = rows.toDF("g", "v").groupBy("g")
      .agg(KMinAgg.kmin(col("v"), 2).as("hs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(out("a") === Seq(1L, 5L))
    assert(out("b") === Seq(3L, 9L))
  }

  test("rejects non-BIGINT input at analysis time") {
    import spark.implicits._
    val err = intercept[Exception] {
      Seq("x").toDF("s").agg(KMinAgg.kmin(col("s"), 4)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("bigint") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }

  // ------------------------------------------------- Misra-Gries -----

  private def mgCands(vals: Seq[String], cap: Int, partitions: Int): Seq[String] = {
    import spark.implicits._
    vals.toDF("t").repartition(partitions)
      .agg(graft.functions.MisraGriesAgg.mgCandidates(col("t"), cap).as("c"))
      .head().getSeq[String](0)
  }

  test("misra-gries: every token above N/(cap+1) survives any partitioning") {
    val rng = new scala.util.Random(13)
    (1 to 20).foreach { round =>
      // zipf-ish stream: a few hot tokens + a long tail of rare ones
      val hot = Seq.fill(3 + rng.nextInt(3))(s"hot${rng.nextInt(100)}").distinct
      val vals = rng.shuffle(
        hot.zipWithIndex.flatMap { case (t, i) => Seq.fill(200 * (i + 1))(t) } ++
          Seq.fill(500)(s"tail${rng.nextInt(100000)}"))
      val cap = 8 + rng.nextInt(24)
      val n = vals.size
      val trueCounts = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val guaranteed = trueCounts.filter(_._2 * (cap + 1) > n).keySet
      (1 to 4).foreach { parts =>
        val cands = mgCands(vals, cap, parts).toSet
        assert(cands.size <= cap, s"round $round: summary exceeded cap")
        assert(guaranteed.subsetOf(cands),
          s"round $round parts=$parts: lost ${guaranteed -- cands}")
      }
    }
  }

  test("misra-gries summary: counters are lower bounds within N/(cap+1); driver merge matches") {
    import spark.implicits._
    val rng = new scala.util.Random(29)
    (1 to 10).foreach { round =>
      val hot = Seq.fill(3)(s"hot${rng.nextInt(50)}").distinct
      val vals = rng.shuffle(
        hot.zipWithIndex.flatMap { case (t, i) => Seq.fill(150 * (i + 1))(t) } ++
          Seq.fill(400)(s"tail${rng.nextInt(50000)}"))
      val cap = 8 + rng.nextInt(16)
      val n = vals.size.toLong
      val trueCounts = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // (a) the aggregate's counted summary: every counter a lower bound
      // within the additive N/(cap+1) error, under shuffled partitioning
      val rows = vals.toDF("t").repartition(3)
        .agg(graft.functions.MisraGriesAgg.mgSummary(col("t"), cap).as("s"))
        .head().getSeq[org.apache.spark.sql.Row](0)
      assert(rows.size <= cap)
      rows.foreach { r =>
        val (tok, cnt) = (r.getString(0), r.getLong(1))
        val truth = trueCounts(tok)
        assert(cnt <= truth, s"round $round: $tok counter $cnt above truth $truth")
        assert((truth - cnt) * (cap + 1) <= n, s"round $round: $tok error beyond bound")
      }
      // (b) driver-side mergeInto of per-slice summaries obeys the same
      // bound — the streaming gate's fold path
      val slices = vals.grouped(math.max(1, vals.size / 4)).toSeq
      val acc = new java.util.HashMap[String, java.lang.Long]()
      slices.foreach { sl =>
        val m = new java.util.HashMap[String, java.lang.Long]()
        sl.foreach { t =>
          val cur = m.get(t)
          if (cur != null) m.put(t, cur + 1L)
          else if (m.size < cap) m.put(t, 1L)
          else {
            val it = m.entrySet().iterator()
            while (it.hasNext) {
              val e = it.next()
              if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
            }
          }
        }
        graft.functions.MisraGriesAgg.mergeInto(acc, m, cap)
      }
      assert(acc.size <= cap)
      val guaranteed = trueCounts.filter(_._2 * (cap + 1) > n).keySet
      assert(guaranteed.forall(acc.containsKey),
        s"round $round: merged summary lost a guaranteed hitter")
      acc.forEach { (tok, cnt) =>
        val truth = trueCounts(tok)
        assert(cnt <= truth && (truth - cnt) * (cap + 1) <= n,
          s"round $round: merged counter for $tok out of bound")
      }
    }
  }

  test("misra-gries: cap >= distinct count keeps exact candidate set; null-safe") {
    import spark.implicits._
    assert(mgCands(Seq("a", "b", "a", "c", "a"), 10, 2) === Seq("a", "b", "c"))
    val withNulls = Seq(Some("x"), None, Some("x"), None, Some("y"))
    val out = withNulls.toDF("t")
      .agg(graft.functions.MisraGriesAgg.mgCandidates(col("t"), 4).as("c"))
      .head().getSeq[String](0)
    assert(out === Seq("x", "y"))
  }

  test("heavyHitters: exact counts equal the plain groupBy on the documents table") {
    import org.apache.spark.sql.functions.{count => fcount}
    val docs = graft.util.D.t(spark, sf, "documents")
    val got = graft.text.Heavy.heavyHitters(docs, 64).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val toks = docs.select(explode(graft.text.TextOps.tokens(col("text"))).as("t"))
    val n = toks.count()
    val want = toks.groupBy("t").agg(fcount(lit(1)).as("c"))
      .filter(col("c") * 64 > n).collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .sortBy { case (t, c) => (-c, t) }
    assert(got.toSeq === want.toSeq)
  }
}
