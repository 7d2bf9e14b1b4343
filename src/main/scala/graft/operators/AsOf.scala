package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join (pandas `merge_asof` equivalent — the one join shape the
  * reference's pandas substrate has and Spark SQL lacks as a built-in).
  *
  * Composed from built-ins per the preference ladder (SURVEY.md §3):
  * tag + union + last-non-null window — ONE shuffle on the partition key,
  * no custom physical operator needed:
  *   for each left row, attach the latest right row with
  *   right.ts <= left.ts within the same partition key.
  * Ties (equal ts) match, mirroring merge_asof(allow_exact_matches=True):
  * right rows sort before left rows at the same timestamp; `seqCol`
  * (present on both sides) breaks remaining ties deterministically.
  *
  * `direction` mirrors merge_asof's: "backward" (default — latest right
  * at or before the left ts), "forward" (earliest right at or after), or
  * "nearest" (whichever of the two is closer in absolute time; equal
  * distances prefer the backward match, pandas' rule). Forward is the
  * same single-shuffle window with the traversal order reversed — not a
  * second algorithm — and nearest evaluates BOTH traversals over the one
  * unioned/partitioned frame (same single exchange, two window sorts)
  * then picks per row, so no direction costs a second shuffle.
  *
  * `toleranceUs` mirrors merge_asof(tolerance=...): a match farther than
  * the given microseconds from the left timestamp is nulled out (the row
  * is kept, unmatched — exactly pandas' behavior). Applied as a post
  * projection; requires `tsCol` to be a timestamp.
  */
object AsOf {

  def join(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           seqCol: String, rightValCols: Seq[String],
           direction: String = "backward",
           toleranceUs: Option[Long] = None): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"direction must be 'backward', 'forward' or 'nearest', got '$direction'")
    require(toleranceUs.forall(_ >= 0), "tolerance must be nonnegative")
    // carry the matched right timestamp internally for the tolerance
    // check even when the caller did not ask for it
    val valCols = (rightValCols :+ tsCol).distinct
    val lSide = valCols.foldLeft(left.withColumn("_side", lit(1))) { (d, c) =>
      d.withColumn(s"_r_$c", lit(null).cast(right.schema(c).dataType))
    }
    val rBase = valCols.foldLeft(right)((d, c) => d.withColumn(s"_r_$c", col(c)))
    val rSide = lSide.columns.foldLeft(rBase.withColumn("_side", lit(0))) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast(lSide.schema(c).dataType))
    }.select(lSide.columns.map(col).toIndexedSeq: _*)

    // backward: ascending scan, right-before-left at equal ts, last right
    // wins. forward: the mirror image — descending scan finds the
    // EARLIEST right at-or-after each left row; seq descends too so tie
    // resolution picks the same row pandas' stable forward search does.
    // nearest: both fills over the SAME partitioning (one exchange, two
    // sorts), then a per-row pick by absolute gap with backward winning
    // ties (pandas' rule).
    val wB = Window.partitionBy(keyCol).orderBy(col(tsCol), col("_side"), col(seqCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keyCol).orderBy(col(tsCol).desc, col("_side"), col(seqCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val unioned = lSide.unionByName(rSide)
    val filled = direction match {
      case "backward" => valCols.foldLeft(unioned) { (d, c) =>
        d.withColumn(s"right_$c", last(col(s"_r_$c"), ignoreNulls = true).over(wB))
      }
      case "forward" => valCols.foldLeft(unioned) { (d, c) =>
        d.withColumn(s"right_$c", last(col(s"_r_$c"), ignoreNulls = true).over(wF))
      }
      case "nearest" =>
        val both = valCols.foldLeft(unioned) { (d, c) =>
          d.withColumn(s"_b_$c", last(col(s"_r_$c"), ignoreNulls = true).over(wB))
            .withColumn(s"_f_$c", last(col(s"_r_$c"), ignoreNulls = true).over(wF))
        }
        val bTs = col(s"_b_$tsCol")
        val fTs = col(s"_f_$tsCol")
        val gapB = abs(unix_micros(col(tsCol)) - unix_micros(bTs))
        val gapF = abs(unix_micros(col(tsCol)) - unix_micros(fTs))
        val chooseB = bTs.isNotNull && (fTs.isNull || gapB <= gapF)
        valCols.foldLeft(both) { (d, c) =>
          d.withColumn(s"right_$c", when(chooseB, col(s"_b_$c")).otherwise(col(s"_f_$c")))
        }.drop(valCols.flatMap(c => Seq(s"_b_$c", s"_f_$c")): _*)
    }
    val matched = filled.filter(col("_side") === 1)
      .drop("_side")
      .drop(valCols.map(c => s"_r_$c"): _*)
    val bounded = toleranceUs match {
      case None => matched
      case Some(tol) =>
        val gap = abs(unix_micros(col(tsCol)) - unix_micros(col(s"right_$tsCol")))
        val keep = col(s"right_$tsCol").isNotNull && gap <= tol
        valCols.foldLeft(matched) { (d, c) =>
          d.withColumn(s"right_$c",
            when(keep, col(s"right_$c")).otherwise(lit(null).cast(d.schema(s"right_$c").dataType)))
        }
    }
    // drop the internal ts carry if the caller didn't request it
    if (rightValCols.contains(tsCol)) bounded else bounded.drop(s"right_$tsCol")
  }
}
