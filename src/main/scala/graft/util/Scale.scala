package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cluster-scale building blocks (SURVEY.md §5): bucketed co-located
  * joins and salted aggregation for skewed keys. Exercised by ScaleSpec,
  * which asserts the resulting plan shapes. */
object Scale {

  /** Write a bucketed + sorted copy of `df` — repeated joins/aggs on
    * `key` then run shuffle-free (the 100 TB answer to "this join
    * shuffles every time"). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a fresh in-memory catalog doesn't know about a previous JVM's
    // managed location — clear it so saveAsTable can recreate
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = new java.io.File(warehouse, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(loc)
    }
    df.write.bucketBy(buckets, key).sortBy(key).format("parquet").saveAsTable(table)
  }

  /** Salted two-phase sum for skewed group keys: partial aggregate on
    * (key, salt) spreads a hot key over `salt` reducers; the exact
    * decimal sums re-combine associatively in the final phase. */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: String, salt: Int): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol).cast(D.dec25)).as("_partial"), count(lit(1)).as("_n"))
      .groupBy(col(keyCol))
      .agg(D.emit6(sum(col("_partial"))).as("total"), sum(col("_n")).as("n"))

  /** Salted two-phase EXACT distinct count for skewed group keys.
    * Plain `COUNT(DISTINCT v) GROUP BY k` builds one distinct set per
    * key — a hot key funnels its entire value stream through a single
    * reducer. Salting on `hash(value) % salt` (NOT a random salt: the
    * same value must always land in the same salt bucket) partitions
    * each key's VALUE SPACE across `salt` reducers, so the per-(key,
    * salt) distinct counts are disjoint and their plain sum is the
    * exact distinct count — no approximation, no second dedup pass.
    * Stage 1 is a map-side-combinable (key, salt, value) dedup; stage
    * 2 reduces `salt` rows per key. */
  def saltedNunique(df: DataFrame, keyCol: String, valCol: String, salt: Int): DataFrame =
    df.select(col(keyCol), col(valCol),
        pmod(hash(col(valCol)), lit(salt)).as("_salt"))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count_distinct(col(valCol)).as("_d"))
      .groupBy(col(keyCol))
      .agg(sum(col("_d")).cast("long").as("nunique"))

  /** Hot/cold hybrid inner equi-join for skewed fact keys — the
    * big-big-join mitigation AQE cannot give you: AQE's skew join
    * splits oversized SMJ partitions AFTER both sides are fully
    * shuffled; here rows of detected hot keys never enter the
    * exchange at all (they broadcast-join against the hot slice of
    * the dim side), and only the cold remainder shuffles.
    *
    * Detection is a ~1/sampleMod ROW sample of the fact over the KEY
    * COLUMN ONLY — a single-column pruned scan (`select(factKey)`
    * first, so ReadSchema carries one field) sampled per row with a
    * seeded `rand()` (per-row, so a hot key's rows are sampled
    * proportionally; a key-hash sample would take keys all-or-nothing
    * and miss 1−1/sampleMod of the hot keys; a whole-row xxhash64 —
    * the previous form — was deterministic but forced the detection
    * scan to READ EVERY COLUMN, tripling detection IO on a wide fact;
    * measured at sf10-zipf it was the dominant hybrid overhead). The
    * sample is deterministic per partition layout (Rand seeds by
    * partition index), and the hot SET only routes — any set yields
    * row-identical results, which is what the oracle checks.
    * A key with global count c appears ~c/sampleMod times, so
    * `hotSampleMin` ≈ (hot threshold)/sampleMod. The hot set is
    * bounded twice — by the threshold and by the `maxHotKeys` limit —
    * and the cap is a ROUTING choice, not a correctness one: keys
    * past it (or missed by the sample) simply take the cold path.
    *
    * Contract: `dimKey` is unique (or near-unique) in `dim`, so the
    * hot dim slice is ≤ maxHotKeys rows — broadcastable by
    * construction. With no detected skew the plan IS the plain join.
    *
    * When the hot keys are already known (yesterday's detection, table
    * statistics, a monitoring feed), pass them via [[skewJoinKnown]]
    * and skip the detection scan entirely — on a steady pipeline the
    * hot set changes far slower than the data. */
  def skewJoin(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
               sampleMod: Int = 20, hotSampleMin: Long = 50,
               maxHotKeys: Int = 1000): DataFrame = {
    // collision-free temp name (the fact frame may own any plain name)
    val cn = "__skew_cnt"
    require(!fact.columns.contains(cn), s"skewJoin: fact already has a $cn column")
    val hot = fact
      .select(col(factKey)) // prune FIRST: detection reads one column
      // null keys never match the inner join, so they must not reach
      // detection either: a null in the hot list would poison BOTH
      // isin routing predicates (IN-with-NULL evaluates to NULL, so
      // NOT(hot) filters would drop every cold row)
      .filter(col(factKey).isNotNull)
      .filter(rand(42L) < 1.0 / sampleMod)
      .groupBy(col(factKey)).agg(count(lit(1)).as(cn))
      .filter(col(cn) >= hotSampleMin)
      .orderBy(col(cn).desc, col(factKey))
      .limit(maxHotKeys) // bounded collect: ≤ maxHotKeys key literals
      .select(col(factKey)).collect().map(_.get(0)).toSeq
    skewJoinKnown(fact, dim, factKey, dimKey, hot)
  }

  /** The routing half of [[skewJoin]]: hot rows broadcast-join the hot
    * dim slice and never enter the exchange, cold rows take the plain
    * shuffle join. Row-identical to `fact.join(dim)` for ANY `hot`
    * (including empty → the plain join plan). */
  def skewJoinKnown(fact: DataFrame, dim: DataFrame, factKey: String,
                    dimKey: String, hot: Seq[Any]): DataFrame = {
    val cond = col(factKey) === col(dimKey)
    require(!hot.contains(null), "skewJoinKnown: null is never a hot key " +
      "(it would poison the isin routing predicates)")
    if (hot.isEmpty) fact.join(dim, cond)
    else {
      // null-key rows fail both isin branches AND the plain join's
      // equi-condition, so dropping them in the cold filter is the
      // same inner-join semantics
      val hotF = col(factKey).isin(hot: _*)
      val hotD = col(dimKey).isin(hot: _*)
      fact.filter(!hotF).join(dim.filter(!hotD), cond)
        .unionByName(fact.filter(hotF).join(broadcast(dim.filter(hotD)), cond))
    }
  }
}
