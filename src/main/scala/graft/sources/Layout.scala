package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) write-layout clustering — the data-layout step a
  * 100 TB table gets ONCE so that every later scan can prune on TWO
  * dimensions at once: interleaving the bits of two keys makes rows
  * that are close in (x, y) close in the one-dimensional sort order,
  * so range-partitioning + sorting by the z-value gives every file
  * narrow min/max ranges on BOTH columns (parquet row-group stats /
  * partition pruning then skip on either predicate). This is the
  * standard lakehouse OPTIMIZE ZORDER BY primitive, expressed as a
  * plain column + repartitionByRange — no custom writer needed.
  *
  * Scale: the z-value is scan-local bit math (codegen'd shifts/masks,
  * zero shuffles); [[zorderBy]] adds the ONE range exchange any
  * clustered write pays. The profile query reduces to ≤ 2^18 bucket
  * rows map-side. All values stay positive longs, so `>>`/`%` agree
  * across engines.
  */
object Layout {

  /** Spread the low 16 bits of `v` to the even bit positions of a
    * 32-bit value (the classic mask-ladder Morton spread). `v` must be
    * a non-negative long below 2^16. */
  private def spread16(v: Column): Column = {
    val a = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
    val b = a.bitwiseOR(shiftleft(a, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val c = b.bitwiseOR(shiftleft(b, 2)).bitwiseAND(lit(0x33333333L))
    c.bitwiseOR(shiftleft(c, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two non-negative keys (each taken mod 2^16):
    * x occupies the even bits, y the odd bits. */
  def zvalue(x: Column, y: Column): Column =
    spread16(pmod(x.cast(LongType), lit(65536L)))
      .bitwiseOR(shiftleft(spread16(pmod(y.cast(LongType), lit(65536L))), 1))

  /** Cluster `df` for writing: range-partition + sort by the z-value of
    * (x, y). Each output partition (→ parquet file) then covers a
    * narrow rectangle in (x, y), so min/max stats prune on either key. */
  def zorderBy(df: DataFrame, x: Column, y: Column, partitions: Int): DataFrame = {
    require(partitions >= 1, s"zorderBy: partitions must be >= 1, got $partitions")
    df.withColumn("_z", zvalue(x, y))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }

  /** Locality profile of z-ordering `orders` on (o_custkey, order day):
    * per top-18-bit z-bucket (≤ 2^18 — file-sized cells) the row
    * count and the min/max of each dimension. 18 z-bits fix 9 high bits
    * of each 16-bit key, so every bucket's span is provably < 2^7 per
    * dimension — the two-sided pruning guarantee, checkable in-query.
    * Columns: zbucket, n_orders, cust_lo/hi, day_lo/hi. */
  def zProfile(orders: DataFrame): DataFrame = {
    // pmod, not %: a negative key (dirty data) must still land in the
    // non-negative domain the mask ladder requires — SQL's %-of-negative
    // would make the oracle's left shift ERROR out
    val x = pmod(col("o_custkey").cast(LongType), lit(65536L))
    val y = pmod(datediff(col("o_orderdate"), lit("1992-01-01").cast(DateType))
      .cast(LongType), lit(65536L))
    orders.select(x.as("x"), y.as("y"), zvalue(col("o_custkey"),
        datediff(col("o_orderdate"), lit("1992-01-01").cast(DateType))).as("z"))
      .groupBy(shiftright(col("z"), 14).as("zbucket"))
      .agg(count(lit(1)).as("n_orders"),
        min(col("x")).as("cust_lo"), max(col("x")).as("cust_hi"),
        min(col("y")).as("day_lo"), max(col("y")).as("day_hi"))
      .orderBy("zbucket")
  }

  /** DuckDB mirror of [[zProfile]] (mask ladder staged through CTEs). */
  def zProfileSql(table: String): String =
    s"""WITH z0 AS (SELECT (o_custkey % 65536 + 65536) % 65536 AS x,
       |    (CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) % 65536 + 65536) % 65536 AS y
       |  FROM $table),
       |z1 AS (SELECT x, y, (x | (x << 8)) & 16711935 AS xs, (y | (y << 8)) & 16711935 AS ys FROM z0),
       |z2 AS (SELECT x, y, (xs | (xs << 4)) & 252645135 AS xs, (ys | (ys << 4)) & 252645135 AS ys FROM z1),
       |z3 AS (SELECT x, y, (xs | (xs << 2)) & 858993459 AS xs, (ys | (ys << 2)) & 858993459 AS ys FROM z2),
       |z4 AS (SELECT x, y, (xs | (xs << 1)) & 1431655765 AS xs, (ys | (ys << 1)) & 1431655765 AS ys FROM z3),
       |zf AS (SELECT x, y, (xs | (ys << 1)) AS z FROM z4)
       |SELECT (z >> 14) AS zbucket, CAST(COUNT(*) AS BIGINT) AS n_orders,
       |  MIN(x) AS cust_lo, MAX(x) AS cust_hi,
       |  MIN(y) AS day_lo, MAX(y) AS day_hi
       |FROM zf GROUP BY 1 ORDER BY zbucket""".stripMargin
}
