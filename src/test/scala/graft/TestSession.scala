package graft

import org.apache.spark.sql.SparkSession

object TestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      // ObjectHashAggregate falls back to SORT-BASED aggregation at 128
      // hash-map keys by default -- every high-cardinality argmax/sketch
      // aggregate (IVF assignment: one key per vector) silently became
      // per-partition sorts of the NxK scored table (superlinear at
      // sf10). Buffers here are tens of bytes, so an 8M-key map is
      // ~200 MB worst case: keep it hash-based.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "8388608")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}
