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
  */
object AsOf {

  def join(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           seqCol: String, rightValCols: Seq[String]): DataFrame = {
    val lSide = rightValCols.foldLeft(left.withColumn("_side", lit(1))) { (d, c) =>
      d.withColumn(s"_r_$c", lit(null).cast(right.schema(c).dataType))
    }
    val rBase = rightValCols.foldLeft(right)((d, c) => d.withColumn(s"_r_$c", col(c)))
    val rSide = lSide.columns.foldLeft(rBase.withColumn("_side", lit(0))) { (d, c) =>
      if (d.columns.contains(c)) d else d.withColumn(c, lit(null).cast(lSide.schema(c).dataType))
    }.select(lSide.columns.map(col).toIndexedSeq: _*)

    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("_side"), col(seqCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rightValCols.foldLeft(lSide.unionByName(rSide)) { (d, c) =>
      d.withColumn(s"right_$c", last(col(s"_r_$c"), ignoreNulls = true).over(w))
    }
    filled.filter(col("_side") === 1)
      .drop("_side")
      .drop(rightValCols.map(c => s"_r_$c"): _*)
  }
}
