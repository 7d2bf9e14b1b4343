package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact interpolated quantiles (quantile_cont semantics) of ONE numeric
  * column in two-to-three linear codegen'd passes — the distributed form
  * of "sort and index" that never sorts the corpus and never buffers it
  * in an aggregation state:
  *
  *  1. min/max + count (one scan);
  *  2. equal-width histogram counts (one scan, ≤ `bins` rows back);
  *     the driver locates which bins hold the floor/ceil ranks of each
  *     requested quantile;
  *  3. collect the values of just those candidate bins (one scan,
  *     Guard-bounded — for a non-degenerate distribution ~n/bins rows
  *     per target), sort the KB-scale sample on the driver, pick the
  *     exact order statistics, interpolate lo + frac·(hi − lo).
  *
  * Skewed data lands many rows in one bin: if the candidate pull would
  * exceed [[Guard.MaxGatheredCells]] rows the helper refines ONCE
  * (re-histogram inside the dense bins), then fails loud — an exact
  * global quantile of a pathologically-concentrated column is the
  * documented non-scale path (approx_percentile is the scale twin).
  *
  * vs `percentile()`: Spark's exact-percentile aggregate buffers EVERY
  * value in its state (~2.8 s alone on a 600k-row column at sf0.1,
  * superlinear beyond); this helper stays linear with bounded driver
  * data.
  */
object ExactQuantile {

  /** Interpolated quantiles at `ps` (each in [0,1]); NULLs skipped.
    * Returns quantile_cont(v, p) per p, unrounded. */
  def quantiles(df: DataFrame, c: String, ps: Seq[Double],
                bins: Int = 8192): Seq[Double] = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      "quantiles: ps must be fractions in [0, 1]")
    val vals = df.select(col(c)).filter(col(c).isNotNull)
    val head = vals.agg(count(lit(1)).as("n"), min(col(c)).as("lo"), max(col(c)).as("hi")).head()
    val n = head.getLong(0)
    require(n > 0, s"quantiles: no non-null rows in '$c'")
    val (lo, hi) = (head.getDouble(1), head.getDouble(2))
    val ranks = ps.map(p => (n - 1) * p)
    val wanted = ranks.flatMap(k => Seq(math.floor(k).toLong, math.ceil(k).toLong)).distinct.sorted
    val byRank: Map[Long, Double] =
      if (lo == hi) wanted.map(_ -> lo).toMap
      else orderStats(vals, c, wanted, lo, hi, bins, refine = true)
    ranks.map { k =>
      val l = byRank(math.floor(k).toLong); val h = byRank(math.ceil(k).toLong)
      l + (k - math.floor(k)) * (h - l)
    }
  }

  /** The identical IEEE bin expression both passes use: bins clamped to
    * [0, bins-1] so hi lands in the last bin. */
  private def binOf(c: Column, lo: Double, hi: Double, bins: Int): Column =
    least(greatest(floor((c - lit(lo)) / lit((hi - lo) / bins)).cast(IntegerType),
      lit(0)), lit(bins - 1))

  /** Values at the given 0-based global ranks of the sorted column. */
  private def orderStats(vals: DataFrame, c: String, wanted: Seq[Long],
                         lo: Double, hi: Double, bins: Int,
                         refine: Boolean): Map[Long, Double] = {
    val hist = vals.groupBy(binOf(col(c), lo, hi, bins).as("b"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    // cumulative start rank per bin
    val starts = hist.scanLeft(0L)(_ + _._2).zip(hist)
      .map { case (start, (b, cnt)) => (b, start, cnt) }
    def binFor(rank: Long) = starts.filter(t => t._2 <= rank).maxBy(_._2)
    val targetBins = wanted.map(binFor).distinct
    val pull = targetBins.map(_._3).sum
    if (pull > Guard.MaxGatheredCells) {
      if (!refine) throw new IllegalArgumentException(
        s"ExactQuantile: candidate bins still hold $pull rows after one " +
          s"refinement (bound ${Guard.MaxGatheredCells}) — the column is " +
          "pathologically concentrated; use approx_percentile (the scale path).")
      // refine each dense bin independently (ranks re-based inside it)
      val w = (hi - lo) / bins
      return targetBins.flatMap { case (b, start, cnt) =>
        val ranksHere = wanted.filter(r => { val t = binFor(r); t._1 == b })
        if (cnt <= Guard.MaxGatheredCells) {
          gather(vals, c, Seq((b, start)), ranksHere, lo, hi, bins)
        } else {
          val inner = vals.filter(binOf(col(c), lo, hi, bins) === b)
          // tighten to the bin's ACTUAL value range; a dense bin of one
          // repeated value (the classic skew) resolves here directly
          val mm = inner.agg(min(col(c)).cast(DoubleType), max(col(c)).cast(DoubleType)).head()
          val (iLo, iHi) = (mm.getDouble(0), mm.getDouble(1))
          if (iLo == iHi) ranksHere.map(_ -> iLo).toMap
          else orderStats(inner, c, ranksHere.map(_ - start), iLo, iHi, bins,
            refine = false).map { case (r, v) => (r + start) -> v }
        }
      }.toMap
    }
    gather(vals, c, targetBins.map(t => (t._1, t._2)), wanted, lo, hi, bins)
  }

  /** Collect the candidate bins' values and read off the exact ranks. */
  private def gather(vals: DataFrame, c: String, binsWanted: Seq[(Int, Long)],
                     ranks: Seq[Long], lo: Double, hi: Double, bins: Int): Map[Long, Double] = {
    val startOf = binsWanted.toMap
    val rows = vals
      .filter(binOf(col(c), lo, hi, bins).isin(binsWanted.map(_._1): _*))
      .select(binOf(col(c), lo, hi, bins).as("b"), col(c).cast(DoubleType).as("v"))
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    val byBin = rows.groupBy(_._1).map { case (b, vs) =>
      b -> vs.map(_._2).sorted }
    ranks.map { r =>
      // rank r sits in the bin whose start is the largest <= r
      val (b, start) = binsWanted.filter(_._2 <= r).maxBy(_._2)
      r -> byBin(b)(math.toIntExact(r - start))
    }.toMap
  }
}
