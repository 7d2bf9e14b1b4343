package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bloom-filter decontamination: fold the eval/benchmark shingle set
  * into a FIXED-SIZE bit array and test every training shingle against
  * it scan-locally. [[Corpus.contaminated]] broadcasts the eval
  * shingle set itself — right when the benchmark slice is small; this
  * variant is the scale form for LARGE eval sets (a deduped multi-
  * benchmark suite): the broadcast payload is `m/8` bytes (16 KB at
  * the default 2^17 bits) no matter how many shingles fold into it,
  * at the price of a quantified false-positive rate. The reference
  * (pd_explain) has no decontamination surface; the published
  * convention this follows is the n-gram-overlap rule used by GPT-3 /
  * PaLM-style eval decontamination with Bloom pre-filtering.
  *
  * Hashing: each shingle's 60-bit md5-prefix hash h (the corpus-wide
  * shared primitive, [[TextOps.shingleHashes]]) expands to
  * `NumHashes` bit positions by Kirsch–Mitzenmacher double hashing —
  * bit_j = (h1 + j·h2) mod m with h1 = h mod 2^30 and
  * h2 = (h >> 30) | 1 (odd, so the stride cycles all residues for
  * power-of-two m). All arithmetic is exact BIGINT in both engines,
  * which is what makes the flag set oracle-reproducible.
  *
  * Scale notes (100 TB): the eval side is eval-sized work that ends in
  * one ≤ m-row distinct + one ≤ m/64-row aggregation folded to a
  * single 2 KB–16 KB row (the build-side `transform` lambda runs once
  * on that one row — not a corpus-scan HOF). The corpus side is one
  * scan: per-row distinct shingle hashes explode narrowly, the 4 bit
  * tests are plain long arithmetic against the broadcast bitmap row,
  * and only the HIT rows (contamination-sized, tiny by construction)
  * reach the exact-verification join and the per-doc aggregation. A
  * clean corpus shuffles almost nothing.
  */
object Bloom {

  /** Default bitmap size: 2^17 bits = 16 KB. Size m ≳ 20× the expected
    * distinct eval-shingle count for a sub-1e-4 per-shingle FP rate
    * (k=4: fp ≈ fill^4). */
  val DefaultBits: Int = 1 << 17
  val NumHashes: Int = 4

  private val H1Mod = 1073741824L // 2^30

  private def bitJ(h: Column, j: Int, m: Int): Column =
    pmod(pmod(h, lit(H1Mod)) + lit(j.toLong) * shiftright(h, 30).bitwiseOR(lit(1L)),
      lit(m.toLong))

  private def bitJSql(h: String, j: Int, m: Int): String =
    s"(($h % $H1Mod + $j * (($h // $H1Mod) | 1)) % $m)"

  /** Distinct 60-bit shingle hashes of a doc slice, one per row. */
  private def hashRows(docs: DataFrame): DataFrame =
    docs.select(explode(array_distinct(TextOps.shingleHashes(col("text")))).as("h"))
      .distinct()

  /** Fold `evalDocs`' shingles into a one-row bitmap: array<long> of
    * m/64 words (word w holds bits 64w..64w+63). */
  def bitmap(evalDocs: DataFrame, m: Int = DefaultBits): DataFrame =
    bitmapOfHashes(hashRows(evalDocs), m)

  /** [[bitmap]] for an arbitrary 60-bit hash set: fold `hashes`
    * (single long column `h`) into the one-row m-bit bitmap. The
    * generic entry point key-level consumers (Bloom-prefiltered joins)
    * build from. */
  def bitmapOfHashes(hashes: DataFrame, m: Int = DefaultBits): DataFrame = {
    require(m >= 64 && (m & (m - 1)) == 0, s"m must be a power of two >= 64, got $m")
    // ONE map-side-combined aggregation (each partition ORs bits into a
    // local m/64-word array; the exchange carries one 16 KB partial per
    // partition) — replaces an explode → distinct → groupBy(word) →
    // scatter chain that shuffled three times for the same commutative
    // OR. Bit positions are identical by construction (shared
    // Kirsch–Mitzenmacher expansion), so the bitmap is bit-for-bit the
    // one the exploded form built.
    hashes.agg(
      graft.functions.BloomBitsAgg.bloomBits(col("h").cast(LongType), m, NumHashes).as("bm"))
  }

  /** [[bitmapOfHashes]] finished on the driver: the m-bit bitmap as an
    * `Array[Long]` of m/64 words. The collect is ONE row of m/64 longs
    * (16 KB at the default m) regardless of build-side size — the
    * bounded-collect convention — and lets the probe side inline the
    * bitmap as a literal instead of a crossJoin(broadcast(...)): the
    * filter becomes plain long arithmetic inside the scan's
    * whole-stage-codegen projection, with no broadcast-exchange stage
    * at all (construction-inclusive timing pays the one-row collect,
    * which is build-side work either way). */
  def bitmapWords(hashes: DataFrame, m: Int = DefaultBits): Array[Long] =
    bitmapOfHashes(hashes, m).collect()(0).getSeq[Long](0).toArray

  /** [[filterByBloom]] with a driver-held bitmap ([[bitmapWords]]):
    * scan-local literal-array bit tests, zero extra plan nodes. */
  def filterByBloomWords(df: DataFrame, hCol: Column, words: Array[Long],
                         m: Int = DefaultBits): DataFrame = {
    require(words.length == m / 64, s"bitmap has ${words.length} words, want ${m / 64}")
    val bmLit = typedLit(words)
    val tests: Seq[Column] = (0 until NumHashes).map { j =>
      val b = bitJ(hCol, j, m)
      call_function("shiftright", element_at(bmLit, (b / 64).cast(IntegerType) + 1),
        pmod(b, lit(64L)).cast(IntegerType)).bitwiseAND(lit(1L)) === lit(1L)
    }
    df.filter(tests.reduce(_ && _))
  }

  /** Generic Bloom pre-filter: the rows of `df` whose `hCol` 60-bit
    * hash passes all `NumHashes` bit tests against the broadcast
    * one-row `bitmapDf` ([[bitmapOfHashes]]' output). Scan-local long
    * math against a 16 KB broadcast at any build-side size — the
    * explicit form of the runtime-filter join optimization: no false
    * negatives by construction, so `filterByBloom(big, h(key), bm)
    * .join(small, key)` is EXACTLY `big.join(small, key)` with the
    * probe side shrunk before the shuffle. */
  def filterByBloom(df: DataFrame, hCol: Column, bitmapDf: DataFrame,
                    m: Int = DefaultBits): DataFrame = {
    // Collision-free temp names: suffix the working columns until none
    // clashes with the input schema, and alias the broadcast bitmap
    // column away from any user column named "bm".
    val taken = df.columns.toSet
    val sfx = Iterator.from(0).map(i => if (i == 0) "" else s"_$i")
      .find { s =>
        val names = s"__h$s" +: s"__bm$s" +: (0 until NumHashes).map(j => s"__b$j$s")
        names.forall(!taken.contains(_))
      }.get
    val hN = s"__h$sfx"; val bmN = s"__bm$sfx"
    def bN(j: Int) = s"__b$j$sfx"
    val rows = df.withColumn(hN, hCol)
      .crossJoin(broadcast(bitmapDf.select(col("bm").as(bmN))))
    val withBits = (0 until NumHashes).foldLeft(rows) { (d, j) =>
      d.withColumn(bN(j), bitJ(col(hN), j, m))
    }
    val tests = (0 until NumHashes).map { j =>
      expr(s"(shiftright(element_at($bmN, cast(${bN(j)} div 64 as int) + 1), " +
        s"cast(${bN(j)} % 64 as int)) & 1) = 1")
    }
    withBits.filter(tests.reduce(_ && _))
      .drop((hN +: bmN +: (0 until NumHashes).map(bN)): _*)
  }

  /** Per-shingle Bloom test rows: the (doc_id, source, h) rows of
    * `docs` whose shingle passes all `NumHashes` bit tests against the
    * broadcast `bitmapDf` ([[bitmap]]'s one-row output). Stateless and
    * scan-local, so it runs unchanged on a stream. */
  def flaggedShingles(docs: DataFrame, bitmapDf: DataFrame,
                      m: Int = DefaultBits): DataFrame = {
    val rows = docs
      .select(col("doc_id"), col("source"),
        explode(array_distinct(TextOps.shingleHashes(col("text")))).as("h"))
      .crossJoin(broadcast(bitmapDf))
    val withBits = (0 until NumHashes).foldLeft(rows) { (d, j) =>
      d.withColumn(s"b$j", bitJ(col("h"), j, m))
    }
    val tests = (0 until NumHashes).map { j =>
      expr(s"(shiftright(element_at(bm, cast(b$j div 64 as int) + 1), " +
        s"cast(b$j % 64 as int)) & 1) = 1")
    }
    withBits.filter(tests.reduce(_ && _))
      .drop(("bm" +: (0 until NumHashes).map(j => s"b$j")): _*)
  }

  /** Full decontamination report over the %97 eval-slice convention:
    * for every training doc with ≥ 1 Bloom-hit shingle, the hit count,
    * the exactly-verified count (join against the true eval hash set —
    * only hit rows reach it), and an `is_fp` bit for docs the Bloom
    * filter flags spuriously. */
  def report(docs: DataFrame, isEval: Column, m: Int = DefaultBits): DataFrame = {
    val ev = docs.filter(isEval)
    val tr = docs.filter(!isEval)
    val hits = flaggedShingles(tr, bitmap(ev, m), m)
    val evSet = hashRows(ev).withColumn("in_ev", lit(1L))
    hits.join(evSet, Seq("h"), "left")
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).cast(LongType).as("n_bloom_hits"),
        sum(coalesce(col("in_ev"), lit(0L))).cast(LongType).as("n_true_hits"))
      .withColumn("is_fp",
        when(col("n_true_hits") === 0, 1).otherwise(0).cast(IntegerType))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[report]] (relational bit-set membership — the
    * same flag set, minus the bitmap representation). */
  def reportSql(table: String, m: Int = DefaultBits): String = {
    val sh = TextOps.shinglesSql("text")
    val js = (0 until NumHashes).map(j => bitJSql("h", j, m))
    s"""WITH ev AS (SELECT DISTINCT ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h
       |  FROM (SELECT unnest(list_distinct($sh)) AS sh FROM $table WHERE doc_id % 97 = 0)),
       |evb AS (SELECT DISTINCT bit FROM (
       |  SELECT unnest([${js.mkString(", ")}]) AS bit FROM ev)),
       |tr AS (SELECT DISTINCT doc_id, source, ('0x' || substr(md5(sh), 1, 15))::BIGINT AS h
       |  FROM (SELECT doc_id, source, unnest(list_distinct($sh)) AS sh
       |        FROM $table WHERE doc_id % 97 <> 0)),
       |trb AS (SELECT doc_id, source, h, unnest([${js.mkString(", ")}]) AS bit FROM tr),
       |hits AS (SELECT doc_id, source, h FROM trb JOIN evb USING (bit)
       |  GROUP BY doc_id, source, h HAVING COUNT(*) = $NumHashes)
       |SELECT t.doc_id, t.source, CAST(COUNT(*) AS BIGINT) AS n_bloom_hits,
       |  CAST(SUM(CASE WHEN e.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_true_hits,
       |  CAST(CASE WHEN SUM(CASE WHEN e.h IS NOT NULL THEN 1 ELSE 0 END) = 0
       |       THEN 1 ELSE 0 END AS INT) AS is_fp
       |FROM hits t LEFT JOIN ev e ON t.h = e.h
       |GROUP BY t.doc_id, t.source
       |ORDER BY t.doc_id""".stripMargin
  }
}
