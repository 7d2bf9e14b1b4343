package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DoubleType}

/** Streaming near-duplicate detection — the streaming twin of
  * `q_dedup_incremental` (graft.dedup.Dedup.minhashPairsAgainst):
  * arriving documents LSH-matched against the PERSISTED signature store
  * of the historical corpus.
  *
  * Spark-first: a stream-STATIC equi-join on the LSH band key. The
  * stream side computes its MinHash signature per-row
  * ([[Dedup.minhashSigRow]] — a pure projection, so it runs in append
  * mode with NO state store where the batch form's per-doc groupBy
  * could not); the static side is the banded signature store (16
  * longs/doc — the 128-byte artifact a pipeline persists once); the
  * join itself is an ordinary inner stream-static join, stateless by
  * construction.
  *
  * The one stateful hazard in the batch form is its `.distinct()` over
  * candidates (a near-dup pair collides on SEVERAL of the 8 bands).
  * Here that dedup is per-row and stateless: both sides carry their
  * full signatures through the join, so each joined row can recompute
  * ALL band keys of the pair and keep itself only if its own band is
  * the pair's MINIMAL matching band — the same emit-on-exactly-one-band
  * idea as [[RangeEnrich]]'s banding, derived rather than structural.
  * The min-match test uses the identical md5 band-key expression as the
  * join predicate, so a (vanishingly unlikely) md5 band collision is
  * treated consistently on both paths.
  *
  * Output: (new_doc, index_doc, est_jaccard, is_dup) — the
  * q_dedup_incremental schema; StreamingSpec asserts the streamed rows
  * equal the batch operator's on a two-chunk replay.
  *
  * Scale: per arriving micro-batch the stream side shuffles nothing
  * (signatures are scan-local) and broadcasts nothing; the static store
  * side is loaded once and reused across batches (bands × store rows —
  * at 100 TB the store is bucketed by (j, bk) so the join prunes to
  * colliding buckets). State store size: ZERO bytes.
  */
object StreamNearDedup {

  private val J = Dedup.NumHashes / Dedup.BandRows // 8 bands

  /** md5 band key of band `j` from signature columns named
    * `prefix0..prefix15` — must stay expression-identical to
    * [[Dedup.bands]]. */
  private def bandKey(prefix: String, j: Int): Column =
    md5(concat_ws(",", col(s"$prefix${Dedup.BandRows * j}"),
      col(s"$prefix${Dedup.BandRows * j + 1}")).cast(BinaryType))

  /** The static side: band keys joined back to the store's signatures —
    * (index_doc, j, bk, b0..b15). Compute once, reuse every batch. */
  def indexBands(indexSig: DataFrame): DataFrame = {
    val sigCols = (0 until Dedup.NumHashes)
      .map(i => col(s"h$i").as(s"b$i"))
    Dedup.bands(indexSig)
      .join(indexSig, "doc_id")
      .select(Seq(col("doc_id").as("index_doc"), col("j"), col("bk")) ++ sigCols: _*)
  }

  /** Watermark-free streaming near-dedup: `docs` is a (streaming or
    * batch) frame with (doc_id, text); `index` is [[indexBands]] of the
    * persisted store. Works identically on batch frames — the parity
    * leg the spec uses. */
  def matches(docs: DataFrame, index: DataFrame, threshold: Double = 0.5): DataFrame = {
    // per-row signature; empty/NULL-text docs have NULL sigs (no
    // shingles -> nothing to match; the batch aggregate form drops them)
    val bsig = Dedup.minhashSigRow(docs.select(col("doc_id"), col("text")))
      .filter(col("h0").isNotNull)
      .select(col("doc_id").as("new_doc") +:
        (0 until Dedup.NumHashes).map(i => col(s"h$i").as(s"a$i")): _*)
    // explode the stream side onto its 8 band keys, carrying the sig
    val bandStructs = (0 until J).map(j =>
      struct(lit(j).as("j"), bandKey("a", j).as("bk")))
    val streamBands = bsig
      .withColumn("__b", explode(array(bandStructs: _*)))
      .withColumn("j", col("__b.j")).withColumn("bk", col("__b.bk"))
      .drop("__b")
    val joined = streamBands.join(index, Seq("j", "bk"))
    // stateless multi-band dedup: keep only the pair's minimal matching
    // band (same md5 key expression as the join predicate)
    val minMatch = (0 until J).map(j =>
      when(bandKey("a", j) === bandKey("b", j), lit(j)).otherwise(lit(J)))
      .reduce((x, y) => least(x, y))
    val est = (0 until Dedup.NumHashes)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
      .reduce(_ + _)
    joined.filter(col("j") === minMatch)
      .select(col("new_doc"), col("index_doc"),
        graft.util.D.r(est.cast(DoubleType) / Dedup.NumHashes, 6).as("est_jaccard"))
      .withColumn("is_dup", (col("est_jaccard") >= threshold).cast("int"))
  }
}
