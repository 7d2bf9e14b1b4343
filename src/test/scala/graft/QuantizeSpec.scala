package graft

import graft.explain.Correlation
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The chunked-long exact summation (Correlation.quantize6/unscaled6)
  * must agree with the plain DECIMAL sum on EVERY input — including
  * exact .5 rounding ties, values straddling the fast-path guard
  * cut-off (~2.8·10¹⁴ in y = x·10⁶, where it self-disables), negatives,
  * and adversarial magnitudes. This property is what makes the fast
  * path safe to ship against the DuckDB oracle. */
class QuantizeSpec extends AnyFunSuite {
  import TestSession._

  private def refSum(vals: Seq[Double]): Double = {
    import spark.implicits._
    vals.toDF("v")
      .agg(sum(col("v").cast(DecimalType(30, 6))).cast(DecimalType(38, 6)).cast(DoubleType))
      .head().getDouble(0)
  }

  private def fastSum(vals: Seq[Double]): Double = {
    import spark.implicits._
    vals.toDF("v")
      .agg(Correlation.value6(Correlation.unscaled6(col("v")))
        .cast(DecimalType(38, 6)).cast(DoubleType))
      .head().getDouble(0)
  }

  test("chunked-long sum equals decimal sum on adversarial values") {
    val cases = Seq(
      Seq(0.0000005, -0.0000005, 1.0000005),            // exact scale-6 ties
      Seq(0.1, 0.2, 0.3, -0.7),                         // classic binary-fraction values
      Seq(1.0 / 128, 3.0 / 128, -5.0 / 128),            // dyadic .5-at-scale-6 ties
      Seq(2.8e8, -2.9e8, 1.234567e8),                   // y ≈ the fast-path guard cut-off
      Seq(1.2e10, -1.2e10, 9.87654321e9),               // large magnitudes, decimal fallback
      Seq(123456.654321, -0.000001, 0.000001),
      (1 to 200).map(i => i * 0.015625),                // exact dyadics
      (1 to 200).map(i => math.sin(i.toDouble) * 1e7),
      // beyond long-unscaled range (|x·1e6| ≥ 9e18): decimal side path
      // (ANSI would throw CAST_OVERFLOW if these hit the long cast)
      Seq(1.5e13, -2.25e13, 4.0e16, 123.456789),
      Seq(9.25e12, 8.9e12, -9.3e12))                    // straddling the range cut
    cases.foreach { vs =>
      assert(fastSum(vs) === refSum(vs), s"mismatch on ${vs.take(5)}...")
    }
  }

  test("grouped moments match the SQL mirror inside the envelope; overflow is loud") {
    import spark.implicits._
    // the GROUPED moment aggregate is all-long (no decimal side term);
    // within the documented envelope — every moment incl. squares and
    // pairs satisfies |m·1e6| < 2^63 — it must agree bit-for-bit with
    // the SQL mirror's plain decimal sums (run through Spark SQL here),
    // including values near the fast-path guard cut-off and .5 ties
    val vs = Seq(
      ("a", 2.9e6, 2.0), ("a", -2.5e6, 3.0), ("a", 1.9e6, -1.0),
      ("a", 123.456789, 0.5), ("b", 2.8e5, 1.0), ("b", 8.9e5, -2.0),
      ("b", -9.3e5, 0.25), ("b", 0.1, 0.2), ("c", -2.9e6, 7.0),
      ("c", 2.9e6, 7.0), ("c", 1.0 / 128, 3.0 / 128))
    val df = vs.toDF("g", "x", "y")
    df.createOrReplaceTempView("qgrp")
    val got = Correlation.pearsonBy(df, "g", "x", "y").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val want = spark.sql(Correlation.pearsonBySql("qgrp", "g", "x", "y")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.toSeq === want.toSeq)
    // out-of-envelope moments (here: x² past the long range) fail LOUD
    // with Spark's ANSI overflow error, never silently wrong
    val big = Seq(("a", 9.9e9, 1.0), ("a", 1.0e10, 2.0)).toDF("g", "x", "y")
    val e = intercept[Throwable](
      Correlation.pearsonBy(big, "g", "x", "y").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("CAST_OVERFLOW") || m.contains("overflow")), msgs(e))
  }

  test("correlation suite equals the individually-computed statistics") {
    val li = graft.util.D.t(spark, sf, "lineitem")
    val pairs = Seq(("l_quantity", "l_extendedprice"), ("l_quantity", "l_discount"))
    val suite = Correlation.suite(li, pairs, "l_returnflag", "l_quantity", "l_linestatus")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getDouble(3)).toMap
    val solo = (Correlation.pearson(li, pairs)
        .unionByName(Correlation.eta(li, "l_returnflag", "l_quantity"))
        .unionByName(Correlation.cramersV(li, "l_returnflag", "l_linestatus")))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getDouble(3)).toMap
    assert(suite === solo, "suite re-derivation diverged from direct statistics")
  }

  test("LSH buckets: identical vectors collide, bucket is stable") {
    import graft.sim.Ann
    val e = graft.util.D.t(spark, sf, "embeddings").limit(50)
    val doubled = e.unionByName(e.withColumn("vec_id", col("vec_id") + 1000000L))
    val pairs = Ann.lshPairs(doubled, 0.999999)
    // every vector and its exact copy share a bucket and cosine 1
    assert(pairs.filter(col("vec_b") === col("vec_a") + 1000000L).count() === 50)
  }

  test("ExactQuantile matches percentile() and survives skewed columns") {
    import graft.util.ExactQuantile
    val li = graft.util.D.t(spark, sf, "lineitem")
    val ps = Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val got = ExactQuantile.quantiles(li, "l_extendedprice", ps)
    val ref = li.agg(percentile(col("l_extendedprice"),
        array(ps.map(lit): _*)).as("q")).head().getSeq[Double](0)
    got.zip(ref).zip(ps).foreach { case ((g, r), p) =>
      assert(math.abs(g - r) <= math.abs(r) * 1e-12 + 1e-9, s"p=$p: $g vs $r")
    }
    import spark.implicits._
    // pathological concentration: 99.9% identical values still resolve —
    // lower the gather cap so the refinement path actually runs
    val oldCap = graft.util.Guard.MaxGatheredCells
    try {
      graft.util.Guard.MaxGatheredCells = 1000
      val skew = (Seq.fill(5000)(7.0) ++ Seq(1.0, 2.0, 100.0)).toDF("v")
      val sq = ExactQuantile.quantiles(skew, "v", Seq(0.0, 0.5, 1.0))
      assert(sq(0) === 1.0 && sq(1) === 7.0 && sq(2) === 100.0)
    } finally graft.util.Guard.MaxGatheredCells = oldCap
    val const = Seq.fill(100)(3.25).toDF("v")
    assert(ExactQuantile.quantiles(const, "v", Seq(0.1, 0.9)) === Seq(3.25, 3.25))
  }

  test("chunked-long sum equals decimal sum on seeded random batches") {
    val rng = new scala.util.Random(42)
    (1 to 20).foreach { round =>
      // mixed magnitudes: uniform in ±10^k for k drawn per batch,
      // including near-tie dyadics
      val k = rng.nextInt(12) - 2
      val vs = Seq.fill(64) {
        val base = (rng.nextDouble() * 2 - 1) * math.pow(10, k.toDouble)
        if (rng.nextBoolean()) base else math.rint(base * 128) / 128
      }
      assert(fastSum(vs) === refSum(vs), s"round $round (k=$k): ${vs.take(4)}")
    }
  }
}
