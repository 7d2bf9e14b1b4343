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
    * narrow rectangle in (x, y), so min/max stats prune on either key.
    *
    * Each dimension is min/max-NORMALIZED to the full 16-bit domain
    * before interleaving: raw mod-2^16 interleaving leaves a
    * small-domain key's entropy entirely in the LOW z bits, so the
    * range split cuts only the larger key and the written files never
    * prune on the smaller one (observed: 16/16 row groups hit on a
    * point predicate before normalizing). Scaling first makes both
    * dimensions share the high bits — the same per-column
    * range-normalization the lakehouse OPTIMIZE ZORDER implementations
    * apply. The one bounds aggregate is a single 4-value row (the
    * bounded-driver-collect convention); at 100 TB it is a map-side
    * min/max over the scan the write pays anyway. */
  def zorderBy(df: DataFrame, x: Column, y: Column, partitions: Int): DataFrame = {
    require(partitions >= 1, s"zorderBy: partitions must be >= 1, got $partitions")
    val b = df.agg(min(x.cast(LongType)), max(x.cast(LongType)),
      min(y.cast(LongType)), max(y.cast(LongType))).head()
    def norm(c: Column, lo: Long, hi: Long): Column = {
      val span = BigInt(hi) - BigInt(lo) // Long math could wrap for hi>0, lo<0
      if (span <= 0) lit(0L)
      else if (span < Long.MaxValue / 65535L)
        // exact multiply-first form — safe only while the product fits
        ((c.cast(LongType) - lit(lo)) * lit(65535L)) / lit(hi - lo)
      else {
        // domain wider than ~2^47: the exact multiply would overflow —
        // and under ANSI even (c - lo) itself can throw for a
        // near-full-Long domain. Quantize through double instead: its
        // ~2^11 ULP at full-Long magnitudes is orders of magnitude
        // below the ≥2^31-wide buckets this branch produces, the map
        // stays monotone, and the result is clamped into [0, 65535].
        // (Layout quality only — no query result depends on the bucket
        // boundary a double rounds a key into.)
        val d = (c.cast(DoubleType) - lit(lo.toDouble)) * lit(65535.0 / span.toDouble)
        least(greatest(d.cast(LongType), lit(0L)), lit(65535L))
      }
    }
    val (xs, ys) =
      if (b.anyNull) (x, y) // empty input: nothing to scale
      else (norm(x, b.getLong(0), b.getLong(1)), norm(y, b.getLong(2), b.getLong(3)))
    df.withColumn("_z", zvalue(xs, ys))
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

  /** Row-group min/max statistics of a WRITTEN parquet table — the
    * read-side proof that a clustered layout actually prunes: for each
    * (file, row group, column) one row with the footer's min/max
    * (integer-like types widened to long; other types skipped) and the
    * row count. A predicate `col = v` can skip every row group whose
    * [min_val, max_val] misses v — counting those here observes the
    * pruning a parquet scan performs, instead of inferring it from the
    * in-memory partition spans.
    *
    * Footer-only: reads ~KB of metadata per file, never data pages.
    * This is the lakehouse OPTIMIZE-verification shape (Delta/Iceberg
    * expose the same stats via their manifests); at 100 TB you run it
    * per partition-directory, which is exactly the `path` parameter. */
  def rowGroupStats(spark: org.apache.spark.sql.SparkSession, path: String,
                    columns: Seq[String]): DataFrame = {
    import org.apache.hadoop.fs.{FileSystem, Path}
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, conf)
    val files = fs.listStatus(p).map(_.getPath)
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    // top-level listing only, by design (per partition-directory at
    // scale) — but an empty listing would read as "no row groups hit"
    // in a pruning assertion, so refuse it instead of returning 0 rows
    require(files.nonEmpty,
      s"rowGroupStats: no .parquet files directly under $path — pass a leaf partition directory")
    def widen(v: Any): Option[Long] = v match {
      case l: java.lang.Long => Some(l.longValue())
      case i: java.lang.Integer => Some(i.longValue())
      case _ => None
    }
    val rows = files.flatMap { f =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        reader.getFooter.getBlocks.asScala.zipWithIndex.flatMap { case (bl, rg) =>
          bl.getColumns.asScala
            .filter(c => columns.contains(c.getPath.toDotString))
            .flatMap { c =>
              val st = c.getStatistics
              if (st == null || !st.hasNonNullValue) None
              else for (lo <- widen(st.genericGetMin()); hi <- widen(st.genericGetMax()))
                yield (f.getName, rg.toLong, c.getPath.toDotString, lo, hi,
                  bl.getRowCount)
            }
        }.toSeq
      } finally reader.close()
    }.toSeq
    import spark.implicits._
    rows.toDF("file", "row_group", "column", "min_val", "max_val", "n_rows")
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
