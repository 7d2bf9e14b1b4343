package graft.dedup

import graft.text.TextOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for document corpora (SURVEY.md §2.3).
  *
  * Scale design: signature computation (md5 / minhash / simhash) is a
  * single scan with map-side combine; LSH banding shuffles only
  * signatures (a few strings per doc), never documents; candidate
  * verification joins stay inside buckets/blocks so pair counts remain
  * ~linear in corpus size.
  */
object Dedup {

  val NumHashes = 16
  val BandRows = 2 // 8 bands × 2 rows

  /** Exact-duplicate groups on a key expression (md5 of text). */
  def exactGroups(docs: DataFrame, key: Column): DataFrame =
    docs.groupBy(key.as("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keep_doc_id"))
      .orderBy("fingerprint")

  /** Normalization used by q_dedup_norm: lowercase, strip non [a-z0-9 ],
    * squeeze runs of spaces, trim — as ONE native codegen pass
    * (bit-identical to the regex chain; see [[graft.functions.AsciiNormalize]]). */
  def normText(c: Column): Column = graft.functions.AsciiNormalize(c)

  def normTextSql(c: String): String =
    s"trim(regexp_replace(regexp_replace(lower($c), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))"

  /** Raw exploded (doc_id, shingle) pairs, duplicates retained. MIN
    * aggregation is insensitive to duplicate shingles, so the MinHash
    * signature path consumes these directly — distinct() here would be a
    * full shuffle of the largest intermediate in the corpus for zero
    * semantic effect. Set-semantics consumers (Jaccard) apply their own
    * distinct. */
  def shinglePairs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(TextOps.shingles(col("text"))).as("sh"))

  /** Distinct (doc_id, shingle) pairs — the set-semantics form. */
  def shingleSet(docs: DataFrame): DataFrame = shinglePairs(docs).distinct()

  /** XOR seeds deriving the 16 hash functions from ONE md5 per shingle:
    * h_i(s) = base(s) XOR seed_i where base = first 15 hex digits of
    * md5(s) as a (positive, < 2^60) long. One md5 instead of 16 — the
    * signature pass is hash-bound at corpus scale. */
  val Seeds: Seq[Long] = Seq(
    0x51dc5a92c9de366L, 0x6fc1c9b2c628c20L, 0x64153fc5c7fe614L, 0x08dbc68907e964fL,
    0x0d1ea40ba7cac6cL, 0x8812b55c93989c8L, 0xe1d90e11cc47904L, 0x7c798cb67c9520dL,
    0x19375dc936b22b9L, 0xfa3abf5f0b34db1L, 0x136223943bf791dL, 0x0b02098ae0a8121L,
    0x83e002c87fd56b0L, 0x23d61d514bb7aa7L, 0x213d2e47e2bceccL, 0x52f8b05f00409f3L)

  /** MinHash signatures: h_i = min over shingles of base(s) XOR seed_i.
    * One scan, one map-side-combined aggregation straight off the raw
    * exploded pairs (MIN ignores duplicates — no distinct, no extra
    * shuffle). */
  def minhashSig(docs: DataFrame): DataFrame = {
    // fused native shingle→md5→prefix-long pass: the hash longs explode
    // directly (the shingle string never materializes per row)
    val withBase = docs.select(col("doc_id"),
      explode(TextOps.shingleHashes(col("text"))).as("hb"))
    val aggs = Seeds.zipWithIndex.map { case (seed, i) =>
      min(col("hb").bitwiseXOR(lit(seed))).as(s"h$i") }
    withBase.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  def minhashSigSql(table: String, name: String = "sig"): String = {
    val mins = Seeds.zipWithIndex.map { case (seed, i) =>
      s"MIN(xor(hb, CAST($seed AS BIGINT))) AS h$i" }.mkString(",\n    ")
    s"""$name AS (SELECT doc_id, $mins
       |  FROM (SELECT doc_id, ('0x' || substr(md5(sh), 1, 15))::BIGINT AS hb
       |        FROM (SELECT doc_id, unnest(${TextOps.shinglesSql("text")}) AS sh FROM $table))
       |  GROUP BY doc_id)""".stripMargin
  }

  /** Scan-local (per-row) form of [[minhashSig]]: the same [[Seeds]]
    * XOR-seeded minima computed from the document's OWN shingle-hash
    * array — no explode, no groupBy, no shuffle. Because it is a pure
    * projection it runs UNCHANGED under Structured Streaming (append
    * mode, no state store), which the aggregate form cannot (its
    * per-doc groupBy would hold unbounded state on a stream). Values
    * are identical to [[minhashSig]] (MIN over the same XORed hash
    * multiset — pinned in StreamingSpec); the one shape difference is a
    * document with NO shingles (empty/NULL text): the aggregate form
    * drops it (nothing to explode), this form keeps a row with NULL
    * signature columns, consistent with [[simhashDf]]'s NULL semantics.
    * Batch pipelines should prefer [[minhashSig]] (codegen'd explode +
    * map-side-combined min vs an interpreted per-row HOF) — the HOF is
    * the right trade only where statelessness is the constraint.
    * Passes through every input column except `text`. */
  def minhashSigRow(docs: DataFrame): DataFrame = {
    val keep = docs.columns.filterNot(_ == "text").map(col).toSeq
    val withHs = docs.select(keep :+ TextOps.shingleHashes(col("text")).as("__hs"): _*)
    val sigs = Seeds.zipWithIndex.map { case (seed, i) =>
      array_min(transform(col("__hs"), x => x.bitwiseXOR(lit(seed)))).as(s"h$i") }
    withHs.select(keep ++ sigs: _*)
  }

  /** LSH band keys: band j = md5(h_{2j} ‖ h_{2j+1}), j ∈ [0, 8). */
  def bands(sig: DataFrame): DataFrame = {
    val structs = (0 until NumHashes / BandRows).map { j =>
      struct(lit(j).as("j"),
        md5(concat_ws(",", col(s"h${BandRows * j}"), col(s"h${BandRows * j + 1}")).cast(BinaryType)).as("bk"))
    }
    sig.select(col("doc_id"), explode(array(structs: _*)).as("b"))
      .select(col("doc_id"), col("b.j").as("j"), col("b.bk").as("bk"))
  }

  def bandsSql: String = bandsSql("sig", "bands")

  def bandsSql(sig: String, name: String): String = {
    val branches = (0 until NumHashes / BandRows).map(j =>
      s"SELECT doc_id, $j AS j, md5(h${BandRows * j}::VARCHAR || ',' || h${BandRows * j + 1}::VARCHAR) AS bk FROM $sig")
    s"$name AS (${branches.mkString("\nUNION ALL\n")})"
  }

  /** Unordered candidate-pair estimates — the shared core of
    * [[minhashPairs]] and [[crossSplitLeakage]]. */
  private def minhashEst(docs: DataFrame): DataFrame = {
    // the signature table is referenced three times below (bands + both
    // pair sides); it ends in an aggregation, so all three consumers
    // read ONE ReusedExchange — no persist, nothing for the caller to
    // clean up (library calls leave no cached partitions behind)
    val sig = minhashSig(docs)
    val bs = bands(sig)
    val cand = bs.alias("a").join(bs.alias("b"),
        col("a.j") === col("b.j") && col("a.bk") === col("b.bk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    val s1 = sig.select(col("doc_id").as("doc_a") +:
      (0 until NumHashes).map(i => col(s"h$i").as(s"a$i")): _*)
    val s2 = sig.select(col("doc_id").as("doc_b") +:
      (0 until NumHashes).map(i => col(s"h$i").as(s"b$i")): _*)
    val matches = (0 until NumHashes)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(s1, "doc_a").join(s2, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        graft.util.D.r(matches.cast(DoubleType) / NumHashes, 6).as("est_jaccard"))
      .withColumn("is_dup", (col("est_jaccard") >= 0.5).cast("int"))
  }

  /** Candidate pairs from band collisions + estimated Jaccard =
    * matching signature positions / 16. */
  def minhashPairs(docs: DataFrame): DataFrame =
    minhashEst(docs).orderBy("doc_a", "doc_b")

  /** Cross-split near-duplicate LEAKAGE audit — the eval-integrity gate
    * a training pipeline runs after splitting: near-dup pairs (minhash
    * est-Jaccard ≥ `threshold`, the [[minhashPairs]] banding) whose two
    * documents landed in DIFFERENT train/val/test splits under the
    * deterministic md5 coin ([[graft.text.Corpus.hashFrac]] — the SAME
    * coin as the q_split_hash report, so this audits exactly the split
    * a run would use). Each emitted row is an eval document whose
    * near-duplicate sits in train (or vice versa) — the leakage Lee et
    * al. 2022 measure at ~13% of standard benchmarks.
    *
    * Scale: the split assignment is a scan-local coin on doc_id joined
    * onto the PAIR table (banding-bounded, linear in corpus size), not
    * the corpus — both split joins are doc_id-keyed and AQE-planned;
    * the corpus itself is touched only by the one signature scan
    * inherited from [[minhashPairs]]. */
  def crossSplitLeakage(docs: DataFrame, trainFrac: Double = 0.8,
      valFrac: Double = 0.1, threshold: Double = 0.5): DataFrame = {
    val h = graft.text.Corpus.hashFrac(col("doc_id"))
    val splits = docs.select(col("doc_id"),
      when(h < trainFrac, "train")
        .when(h < trainFrac + valFrac, "val")
        .otherwise("test").as("split"))
    minhashEst(docs)
      .filter(col("est_jaccard") >= threshold)
      .join(splits.select(col("doc_id").as("doc_a"), col("split").as("split_a")), "doc_a")
      .join(splits.select(col("doc_id").as("doc_b"), col("split").as("split_b")), "doc_b")
      .filter(col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("doc_b"), col("split_a"), col("split_b"),
        col("est_jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** Banding-sensitivity profile of the minhash candidate set — the
    * LSH tuning diagnostic: histogram of candidate pairs by estimated
    * Jaccard (0.05-wide buckets) with the duplicate-threshold count per
    * bucket. Read against the banding S-curve (8 bands × 2 rows →
    * P(candidate) = 1−(1−j²)⁸): mass piling up far below the dup
    * threshold means the banding is too permissive (wasted
    * verification), an empty shoulder above it means recall risk.
    * Scale: runs entirely on the banding-bounded pair table (one
    * KB-bucket aggregation beyond [[minhashPairs]]' own work). */
  def minhashCurve(docs: DataFrame): DataFrame =
    minhashEst(docs)
      .select((floor(col("est_jaccard") * 20) / 20).as("bucket"), col("is_dup"))
      .groupBy("bucket")
      .agg(count(lit(1)).cast(LongType).as("n_pairs"),
        sum(col("is_dup")).cast(LongType).as("n_dup"))
      .orderBy("bucket")

  /** DuckDB mirror of [[minhashCurve]]. */
  def minhashCurveSql(table: String): String =
    s"""WITH ${minhashCtes(table)}
       |SELECT FLOOR(est_jaccard * 20) / 20 AS bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(SUM(CASE WHEN est_jaccard >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup
       |FROM est GROUP BY 1 ORDER BY bucket""".stripMargin

  /** DuckDB mirror of [[crossSplitLeakage]]. */
  def crossSplitLeakageSql(table: String, trainFrac: Double = 0.8,
      valFrac: Double = 0.1, threshold: Double = 0.5): String = {
    val hf = graft.text.Corpus.hashFracSql("doc_id")
    s"""WITH ${minhashCtes(table)},
       |splits AS (SELECT doc_id,
       |    CASE WHEN $hf < $trainFrac THEN 'train'
       |         WHEN $hf < ${trainFrac + valFrac} THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM $table)
       |SELECT e.doc_a, e.doc_b, sa.split AS split_a, sb.split AS split_b, e.est_jaccard
       |FROM est e
       |JOIN splits sa ON e.doc_a = sa.doc_id
       |JOIN splits sb ON e.doc_b = sb.doc_id
       |WHERE e.est_jaccard >= $threshold AND sa.split <> sb.split
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Shared CTE chain ending in `est(doc_a, doc_b, est_jaccard)` — the
    * candidate-pair estimates behind [[minhashPairsSql]] and
    * [[Cluster.minhashClustersSql]]. Emitted WITHOUT the leading `WITH`
    * so the cluster oracle can prepend `WITH RECURSIVE`. */
  private[dedup] def minhashCtes(table: String): String = {
    val est = (0 until NumHashes)
      .map(i => s"(CASE WHEN s1.h$i = s2.h$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""${minhashSigSql(table)},
       |${bandsSql},
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.j = b.j AND a.bk = b.bk AND a.doc_id < b.doc_id),
       |est AS (
       |  SELECT doc_a, doc_b, ROUND(CAST($est AS DOUBLE) / $NumHashes, 6) AS est_jaccard
       |  FROM cand JOIN sig s1 ON cand.doc_a = s1.doc_id JOIN sig s2 ON cand.doc_b = s2.doc_id)""".stripMargin
  }

  def minhashPairsSql(table: String): String =
    s"""WITH ${minhashCtes(table)}
       |SELECT doc_a, doc_b, est_jaccard,
       |  CAST(CASE WHEN est_jaccard >= 0.5 THEN 1 ELSE 0 END AS INT) AS is_dup
       |FROM est
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Incremental (continuous-ingest) near-dedup: match a NEW batch of
    * documents against a PRE-COMPUTED signature store instead of
    * self-joining the whole corpus. `indexSig` is a [[minhashSig]]-shaped
    * table (doc_id, h0..h15) — the 128-byte-per-doc artifact a pipeline
    * persists once and reuses for every arriving batch, so the historical
    * corpus text is NEVER re-shingled or re-scanned.
    *
    * Scale: only the batch side is shingled (scan-local native pass);
    * the band join shuffles signatures (16 longs/doc), not documents,
    * keyed by the 32k-per-band bucket space; candidate count is bounded
    * by band collisions exactly as in [[minhashPairs]]. Output:
    * (new_doc, index_doc, est_jaccard, is_dup) ordered. */
  def minhashPairsAgainst(batch: DataFrame, indexSig: DataFrame): DataFrame = {
    val bsig = minhashSig(batch)
    val cand = bands(bsig).alias("a").join(bands(indexSig).alias("b"),
        col("a.j") === col("b.j") && col("a.bk") === col("b.bk"))
      .select(col("a.doc_id").as("new_doc"), col("b.doc_id").as("index_doc")).distinct()
    val s1 = bsig.select(col("doc_id").as("new_doc") +:
      (0 until NumHashes).map(i => col(s"h$i").as(s"a$i")): _*)
    val s2 = indexSig.select(col("doc_id").as("index_doc") +:
      (0 until NumHashes).map(i => col(s"h$i").as(s"b$i")): _*)
    val matches = (0 until NumHashes)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(s1, "new_doc").join(s2, "index_doc")
      .select(col("new_doc"), col("index_doc"),
        graft.util.D.r(matches.cast(org.apache.spark.sql.types.DoubleType) / NumHashes, 6)
          .as("est_jaccard"))
      .withColumn("is_dup", (col("est_jaccard") >= 0.5).cast("int"))
      .orderBy("new_doc", "index_doc")
  }

  /** DuckDB mirror of [[minhashPairsAgainst]] where the batch is
    * `batchTable` and the index store is [[minhashSigSql]] over
    * `indexTable` (the oracle recomputes the store; the Spark side may
    * read it from parquet — identical values either way). */
  def minhashPairsAgainstSql(batchTable: String, indexTable: String): String = {
    val est = (0 until NumHashes)
      .map(i => s"(CASE WHEN s1.h$i = s2.h$i THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH ${minhashSigSql(batchTable, "bsig")},
       |${minhashSigSql(indexTable, "isig")},
       |${bandsSql("bsig", "bbands")},
       |${bandsSql("isig", "ibands")},
       |cand AS (SELECT DISTINCT a.doc_id AS new_doc, b.doc_id AS index_doc
       |  FROM bbands a JOIN ibands b ON a.j = b.j AND a.bk = b.bk)
       |SELECT new_doc, index_doc,
       |  ROUND(CAST($est AS DOUBLE) / $NumHashes, 6) AS est_jaccard,
       |  CAST(CASE WHEN ROUND(CAST($est AS DOUBLE) / $NumHashes, 6) >= 0.5 THEN 1 ELSE 0 END AS INT) AS is_dup
       |FROM cand JOIN bsig s1 ON cand.new_doc = s1.doc_id
       |          JOIN isig s2 ON cand.index_doc = s2.doc_id
       |ORDER BY new_doc, index_doc""".stripMargin
  }

  // ------------------------------------------------------------ SimHash --

  /** 60 bits (15 md5 hex digits — the same 60-bit prefix the MinHash
    * path uses; 16 digits would overflow a signed BIGINT cast in both
    * engines). */
  val SimBits = 60

  /** Band layout: 4 bands × 15 bits ⇒ 2^15 = 32768 buckets PER BAND.
    * Bucket-count bound matters at corpus scale: with only 256 buckets
    * per band (the old 32-bit/8-bit layout) every bucket holds ~N/256
    * documents at N in the billions and the within-bucket self-join goes
    * quadratic; 15-bit bands push the same blowup out by 128× and keep
    * near-dup buckets sparse because 15 matching bits at 60-bit hash
    * length is a strong similarity signal. */
  val SimBands = 4
  val SimBandBits: Int = SimBits / SimBands

  /** Hamming radius kept by [[simhashPairs]]. RECALL CONTRACT: with 4
    * bands, the pigeonhole principle guarantees a band collision only
    * for hamming ≤ 3; pairs at hamming 4-6 are found only when their
    * differing bits happen to concentrate in ≤ 3 bands (partial recall,
    * same trade as the reference's banded LSH). */
  val SimHammingMax = 6

  /** DuckDB mirror of [[simhashDf]]. */
  def simhashSql(table: String): String = {
    val nibble = "strpos('0123456789abcdef', substr(md5(w), 1 + (j // 4), 1)) - 1"
    s"""wc AS (SELECT doc_id, w, COUNT(*) AS cnt
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM $table) GROUP BY 1, 2),
       |bitsum AS (SELECT doc_id, j,
       |    SUM(cnt * (2 * ((($nibble) >> (3 - (j % 4))) & 1) - 1)) AS s
       |  FROM wc, range(0, $SimBits) r(j) GROUP BY 1, 2),
       |sh AS (SELECT doc_id,
       |    CAST(SUM(CASE WHEN s > 0 THEN CAST(POWER(2, ${SimBits - 1} - j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM bitsum GROUP BY 1)""".stripMargin
  }

  /** 60-bit SimHash over word occurrences: bit j of word-hash taken from
    * md5 hex nibbles; simhash bit j = sign of Σ cnt_w · (2·bit_j(w) − 1).
    * Returns (doc_id, simhash BIGINT).
    *
    * The first 15 md5 hex digits form a 60-bit word hash wh with
    * bit j = (wh >> (59−j)) & 1 — identical to the oracle's nibble form,
    * since hex digit j/4 occupies bits [59−4·(j/4)−3, 59−4·(j/4)].
    * The whole signature is ONE native scan-local expression
    * ([[graft.functions.SimHash60]] — tokenize, hash, ±1-accumulate and
    * sign per document in a single pass): no explode, no aggregation,
    * no shuffle. Replaced the former explode + 60-sum groupBy, which was
    * itself bit-identical (PipelineSpec pins native-vs-aggregate parity).
    *
    * NULL semantics (intended): a NULL-text document yields a
    * (doc_id, NULL) row — the signature table keeps one row per input
    * document, like any per-row projection. (The historical explode+
    * groupBy form silently DROPPED null-text docs — a join-shape
    * artifact, not a contract.) NULL signatures never join in
    * [[simhashPairs]] (band keys are NULL), so pair output is
    * unaffected; consumers that want the historical shape filter
    * `simhash IS NOT NULL`. */
  def simhashDf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), graft.functions.SimHash60(col("text")).as("simhash"))

  /** SimHash near-dup pairs: 4 bands × 15 bits, keep hamming ≤
    * [[SimHammingMax]] (see the recall contract there). */
  def simhashPairs(docs: DataFrame): DataFrame = {
    // the signature table feeds both sides of the band self-join; the
    // explicit hash repartition materializes the (doc_id, simhash)
    // rows — 16 bytes/doc, the ONLY shuffle of this phase — as an
    // exchange both consumers reuse, so the corpus scan + hashing runs
    // once with no persist (the scan-local signature expression has no
    // aggregation exchange of its own to reuse)
    val sh = simhashDf(docs).repartition(col("doc_id"))
    val mask = (1L << SimBandBits) - 1
    val bandStructs = (0 until SimBands).map(k =>
      struct(lit(k).as("k"), shiftright(col("simhash"), SimBandBits * k).bitwiseAND(lit(mask)).as("band")))
    val bs = sh.select(col("doc_id"), col("simhash"), explode(array(bandStructs: _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.k").as("k"), col("b.band").as("band"))
    val cand = bs.alias("a").join(bs.alias("b"),
        col("a.k") === col("b.k") && col("a.band") === col("b.band") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sa"), col("b.simhash").as("sb"))
      .distinct()
    cand.withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))).cast(LongType))
      .filter(col("hamming") <= SimHammingMax)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  def simhashPairsSql(table: String): String = {
    val mask = (1L << SimBandBits) - 1
    val bandBranches = (0 until SimBands).map(k =>
      s"SELECT doc_id, simhash, $k AS k, (simhash >> ${SimBandBits * k}) & $mask AS band FROM sh")
    s"""WITH ${simhashSql(table)},
       |bands AS (${bandBranches.mkString("\nUNION ALL\n")}),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.simhash AS sa, b.simhash AS sb
       |  FROM bands a JOIN bands b ON a.k = b.k AND a.band = b.band AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(sa, sb)) <= $SimHammingMax
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ------------------------------------------------- n-gram Jaccard -----

  /** Max within-block document frequency for a shingle to generate
    * candidate pairs (rare-shingle blocking). */
  val NgramDfCap = 100

  /** Blocked pairwise word-3-gram Jaccard (block = `blockCol`), keep ≥ th.
    * Shingles are joined via their 60-bit md5-prefix hash — a long
    * shuffle key instead of a string (cheaper network + compare; hash
    * collisions are deterministic and mirrored by the oracle).
    *
    * RECALL CONTRACT: a pair is emitted only if it shares at least one
    * RARE shingle (within-block document frequency 2 ≤ df ≤ `dfCap`).
    * Pairs whose every shared shingle is more frequent than `dfCap`
    * return no row — by design: near-dup pairs share rare shingles
    * essentially by definition, and a pair sharing only ubiquitous
    * shingles has near-zero Jaccard. Raise `dfCap` (at quadratic
    * candidate cost in the hottest shingle) if exact recall over
    * high-frequency-only overlaps matters.
    *
    * Candidate generation is bounded by rare-shingle blocking: only
    * shingles whose within-block document frequency df satisfies
    * 2 ≤ df ≤ dfCap emit pairs. A raw (blk, sh) self-join emits
    * Σ_sh df²/2 pairs — quadratic in the hottest shingle, so a single
    * common trigram ("of the and") in an unbounded block explodes one
    * reducer at corpus scale. With the cap, pairs per shingle ≤ dfCap²/2
    * and in total ≤ (dfCap/2)·Σ_sh df = (dfCap/2)·|shingle rows| —
    * LINEAR in corpus size. Exact Jaccard is then computed over the FULL
    * shingle sets of each surviving candidate pair (near-dup pairs share
    * rare shingles essentially by definition — a pair sharing only
    * ubiquitous shingles has near-zero Jaccard anyway). The oracle
    * mirrors the same candidate rule. */
  def ngramJaccard(docs: DataFrame, blockCol: String, th: Double,
                   dfCap: Int = NgramDfCap, cache: Boolean = false): DataFrame = {
    // Per-doc DISTINCT hashed shingle ARRAY, built entirely per-row (one
    // scan, zero shuffle) and reused by every stage — candidate docs are
    // few, so intersections run as size(array_intersect(...)) on the
    // candidate pair rows instead of re-exploding the corpus into
    // (pair, shingle) rows and shuffling them.
    val arr0 = docs
      .select(col("doc_id"), col(blockCol).as("blk"),
        array_sort(array_distinct(TextOps.shingleHashes(col("text")))).as("shs"))
      .withColumn("sz", size(col("shs")).cast(LongType))
    // CACHE OWNERSHIP: the default (cache=false) is persist-free, like
    // every other dedup entry point — a long-lived session calling the
    // library repeatedly accumulates no cached RDDs. cache=true is a
    // SELF-CLEANING per-action cache: the per-doc array table feeds
    // three differently-pruned consumers, so exchange reuse cannot
    // deduplicate it (unlike the sig tables above) and an uncached plan
    // re-hashes every shingle three times (~2.5x slower measured). The
    // persist is populated and hit within the one action a caller runs
    // on the result, and a one-shot listener unpersists it when that
    // action completes (see unpersistAfterFirstAction) — no cleanup
    // contract lands on the caller who runs an action. A caller running
    // MANY actions on one result re-pays the scan from the second action
    // on; persist the RESULT in that case (pair-sized, not corpus-
    // sized). A build that NEVER runs an action keeps its persist and
    // listener registered for the session (nothing ever completes to
    // trigger cleanup) — the one residual the old clearCache contract
    // also had.
    //
    // The __cache_build marker makes each build's cached plan UNIQUE:
    // Spark's cache and the listener both key on plan equivalence, so
    // without it two back-to-back identical builds (bench reps, repeated
    // pipeline runs) would SHARE one cache entry and the async
    // completion event of the first build's action could unpersist the
    // second build's cache before its own action ran. The constant
    // column costs 8 bytes/row cached and is never selected downstream.
    val arr =
      if (!cache) arr0
      else {
        val marked = arr0
          .withColumn("__cache_build", lit(graft.util.SelfClean.buildMarker())).persist()
        graft.util.SelfClean.unpersistAfterFirstAction(marked)
        marked
      }
    // ONE corpus-sized shuffle: group shingle occurrences by (block,
    // shingle), keeping AT MOST dfCap+1 doc ids per key via the bounded
    // k-min aggregate (state ≤ dfCap+1 longs per key, map-side combined
    // — a plain collect_list would accumulate unbounded state on hot
    // shingles like "of the and"). Keys where the bound overflowed
    // (size = dfCap+1 ⇒ df > dfCap) or df < 2 are discarded — exactly
    // the rare-shingle rule, with no df-count join-back against the
    // exploded corpus (the round-2 form shuffled the shingle table a
    // second time for that join).
    val sh = arr.select(col("doc_id"), col("blk"), explode(col("shs")).as("sh"))
    val grouped = sh.groupBy("blk", "sh")
      .agg(graft.functions.KMinAgg.kmin(col("doc_id"), dfCap + 1).as("ids"))
      .filter(size(col("ids")).between(2, dfCap))
    // ids are sorted ascending, so (ids[i], ids[j]) with j > i already
    // satisfies doc_a < doc_b; ≤ dfCap²/2 pairs per key keeps the
    // explode linear overall (see bound above)
    val pairsArr = flatten(transform(col("ids"), (x, i) =>
      transform(slice(col("ids"), i + lit(2), size(col("ids"))),
        y => struct(x.as("doc_a"), y.as("doc_b")))))
    val cand = grouped.select(explode(pairsArr).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()
    // exact Jaccard per candidate pair from the array table. The per-doc
    // shingle-array table is CORPUS-sized — never broadcast-hint it (a
    // hard hint would ship the whole corpus to the driver and every
    // executor). These are plain joins on doc id: AQE converts them to
    // broadcast when the measured size is small (bench scale), and at
    // cluster scale they become the two shuffle joins we want — cand is
    // linear in corpus size (see bound above), so both stay linear.
    val aTab = arr.select(col("doc_id").as("doc_a"), col("shs").as("sa"), col("sz").as("sza"))
    val bTab = arr.select(col("doc_id").as("doc_b"), col("shs").as("sb"), col("sz").as("szb"))
    cand.join(aTab, "doc_a").join(bTab, "doc_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast(LongType))
      .withColumn("jaccard",
        graft.util.D.r(col("inter").cast(DoubleType) / (col("sza") + col("szb") - col("inter")), 6))
      .filter(col("jaccard") >= th)
      .select("doc_a", "doc_b", "inter", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  // ------------------------------------------------------- line dedup --

  /** Line-level exact dedup (CCNet / RefinedWeb style): drops every
    * line that occurs in more than `maxDocs` distinct documents —
    * boilerplate (headers, footers, cookie notices) repeats across
    * pages while real content doesn't. Lines are keyed by their 60-bit
    * md5-prefix hash (the same key CCNet dedups on, and the same
    * 60-bit pattern the shingle paths here use) so the corpus-wide
    * count and the membership join shuffle 8-byte longs, not line
    * text. Returns one row per doc: (doc_id, n_lines, n_kept,
    * kept_fp) where kept_fp = md5 of the surviving lines re-joined in
    * original order — the fingerprint pins reassembly, not just
    * counts.
    *
    * Scale: three shuffles, each linear in corpus line count — count
    * lines by hash (map-side combined), join lines to counts on the
    * hash, regroup survivors by doc_id. No broadcast of anything
    * corpus-sized; skew bound = max occurrences of one line, which the
    * count table itself diagnoses. */
  def lineDedup(docs: DataFrame, maxDocs: Int = 1): DataFrame = {
    val lines = docs
      .select(col("doc_id"), posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
      .withColumn("lh",
        conv(substring(md5(col("line").cast(BinaryType)), 1, 15), 16, 10).cast(LongType))
    val counts = lines.select("lh", "doc_id").distinct()
      .groupBy("lh").agg(count(lit(1)).as("n_docs"))
    val kept = lines.join(counts, Seq("lh")).filter(col("n_docs") <= maxDocs)
    val re = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      concat_ws("\n", transform(array_sort(collect_list(struct(col("pos"), col("line")))),
        x => x.getField("line"))).as("kept_text"))
    docs.select(col("doc_id"), size(split(col("text"), "\n")).cast(LongType).as("n_lines"))
      .join(re, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).cast(LongType).as("n_kept"),
        md5(coalesce(col("kept_text"), lit("")).cast(BinaryType)).as("kept_fp"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[lineDedup]]; `table` may be any parenthesized
    * table expression with doc_id + text. */
  def lineDedupSql(table: String, maxDocs: Int = 1): String =
    s"""WITH ex AS (SELECT doc_id, pos, line,
       |    ('0x' || substr(md5(line), 1, 15))::BIGINT AS lh
       |  FROM (SELECT doc_id, generate_subscripts(ls, 1) AS pos, unnest(ls) AS line
       |        FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM $table))),
       |cnt AS (SELECT lh, COUNT(DISTINCT doc_id) AS n_docs FROM ex GROUP BY 1),
       |keep AS (SELECT e.doc_id, e.pos, e.line
       |  FROM ex e JOIN cnt USING (lh) WHERE n_docs <= $maxDocs),
       |re AS (SELECT doc_id, COUNT(*) AS n_kept,
       |    string_agg(line, chr(10) ORDER BY pos) AS kept_text FROM keep GROUP BY 1)
       |SELECT d.doc_id, CAST(len(string_split(d.text, chr(10))) AS BIGINT) AS n_lines,
       |  CAST(COALESCE(re.n_kept, 0) AS BIGINT) AS n_kept,
       |  md5(COALESCE(re.kept_text, '')) AS kept_fp
       |FROM $table d LEFT JOIN re ON d.doc_id = re.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Corpus-duplication profile (the §4 measurement of Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models
    * Better"): per document, the fraction of its shingle occurrences
    * whose shingle appears in more than `maxDocs` distinct documents —
    * how much of each doc is text the corpus already has elsewhere.
    * The paper measures with suffix arrays over 50-token substrings; a
    * fixed-n shingle count is the bounded-state streaming-friendly
    * equivalent (no suffix array to build, no global sort), with the
    * same hashed-shingle vocabulary every other dedup path here uses.
    * Docs with fewer than 3 tokens have no shingles and are absent.
    *
    * Scale: one explode of 8-byte shingle hashes, one map-side-combined
    * count by hash, one hash join back, one regroup by doc — all
    * linear in corpus token count, nothing broadcast. */
  def dupShingleFrac(docs: DataFrame, maxDocs: Int = 1): DataFrame = {
    val sh = docs.select(col("doc_id"), explode(TextOps.shingleHashes(col("text"))).as("sh"))
    val cnt = sh.distinct().groupBy("sh").agg(count(lit(1)).as("n_docs"))
    sh.join(cnt, Seq("sh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("n_docs") > maxDocs, 1L).otherwise(0L)).as("n_dup"))
      .select(col("doc_id"),
        col("n_shingles").cast(LongType).as("n_shingles"),
        col("n_dup").cast(LongType).as("n_dup"),
        graft.util.D.r(col("n_dup").cast(DoubleType) / col("n_shingles"), 6).as("dup_frac"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[dupShingleFrac]]. */
  def dupShingleFracSql(table: String, maxDocs: Int = 1): String =
    s"""WITH sh AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS sh
       |  FROM (SELECT doc_id, unnest(${TextOps.shinglesSql("text")}) AS s FROM $table)),
       |cnt AS (SELECT sh, COUNT(DISTINCT doc_id) AS n_docs FROM sh GROUP BY 1)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
       |  CAST(SUM(CASE WHEN n_docs > $maxDocs THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       |  ROUND(CAST(SUM(CASE WHEN n_docs > $maxDocs THEN 1 ELSE 0 END) AS DOUBLE)
       |    / COUNT(*), 6) AS dup_frac
       |FROM sh JOIN cnt USING (sh)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** LSH estimator accuracy audit — measures what [[minhashCurve]]'s
    * S-curve only models: for every banding CANDIDATE pair, the exact
    * full-set shingle Jaccard joins against the 16-position estimate,
    * and the confusion matrix at the dedup threshold (est ≥ th vs
    * exact ≥ th) + per-cell mean absolute estimator error come back.
    * The off-diagonal cells are the pairs the 8×2 banding would
    * wrongly keep/drop at this signature width — the measurement that
    * justifies (or resizes) NumHashes before a corpus-scale run.
    *
    * Scale: everything runs on the banding-bounded candidate PAIR
    * table (linear in corpus size by the banding bound); the exact
    * side joins per-doc distinct hashed-shingle arrays (the ngram
    * machinery) onto those pairs only — never an all-pairs scan. */
  def minhashAccuracy(docs: DataFrame, th: Double = 0.5): DataFrame = {
    val pairs = minhashEst(docs)
    val arr = docs.select(col("doc_id"),
        array_distinct(TextOps.shingleHashes(col("text"))).as("shs"))
      .withColumn("sz", size(col("shs")).cast(LongType))
    val j = pairs
      .join(arr.select(col("doc_id").as("doc_a"), col("shs").as("sa"),
        col("sz").as("sza")), "doc_a")
      .join(arr.select(col("doc_id").as("doc_b"), col("shs").as("sb"),
        col("sz").as("szb")), "doc_b")
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast(LongType))
      .withColumn("exact_j", graft.util.D.r(col("inter").cast(DoubleType) /
        (col("sza") + col("szb") - col("inter")), 6))
    j.select((col("est_jaccard") >= th).cast(IntegerType).as("est_dup"),
        (col("exact_j") >= th).cast(IntegerType).as("exact_dup"),
        graft.util.D.r(abs(col("est_jaccard") - col("exact_j")), 6).as("err"))
      .groupBy("est_dup", "exact_dup")
      .agg(count(lit(1)).cast(LongType).as("n_pairs"),
        sum(col("err").cast(graft.util.D.dec25)).as("s"))
      .select(col("est_dup"), col("exact_dup"), col("n_pairs"),
        graft.util.D.r(col("s").cast(DoubleType) / col("n_pairs"), 6).as("mean_abs_err"))
      .orderBy("est_dup", "exact_dup")
  }

  /** DuckDB mirror of [[minhashAccuracy]]. */
  def minhashAccuracySql(table: String, th: Double = 0.5): String =
    s"""WITH ${minhashCtes(table)},
       |shr AS (SELECT DISTINCT doc_id, ('0x' || substr(md5(sh0), 1, 15))::BIGINT AS h
       |  FROM (SELECT doc_id, unnest(${TextOps.shinglesSql("text")}) AS sh0 FROM $table)),
       |sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM shr GROUP BY 1),
       |inter AS (SELECT e.doc_a, e.doc_b, CAST(COUNT(*) AS BIGINT) AS inter
       |  FROM est e JOIN shr a ON a.doc_id = e.doc_a
       |  JOIN shr b ON b.doc_id = e.doc_b AND b.h = a.h GROUP BY 1, 2),
       |ex AS (SELECT e.est_jaccard,
       |    ROUND(CAST(COALESCE(i.inter, 0) AS DOUBLE)
       |      / (sa.sz + sb.sz - COALESCE(i.inter, 0)), 6) AS exact_j
       |  FROM est e
       |  LEFT JOIN inter i ON e.doc_a = i.doc_a AND e.doc_b = i.doc_b
       |  JOIN sz sa ON e.doc_a = sa.doc_id JOIN sz sb ON e.doc_b = sb.doc_id),
       |cells AS (SELECT CAST(est_jaccard >= $th AS INT) AS est_dup,
       |    CAST(exact_j >= $th AS INT) AS exact_dup,
       |    ROUND(ABS(est_jaccard - exact_j), 6) AS err FROM ex)
       |SELECT est_dup, exact_dup, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  ROUND(CAST(SUM(CAST(err AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*), 6) AS mean_abs_err
       |FROM cells GROUP BY 1, 2 ORDER BY est_dup, exact_dup""".stripMargin

  /** ExactSubstr-style duplicated-span profile (Lee et al. 2022 §3's
    * EXACTSUBSTR pass, re-expressed distributed): mark every `winLen`-
    * token window whose exact text occurs more than once in the corpus
    * (across documents OR repeated within one), merge overlapping
    * duplicated windows into maximal spans per document, and report
    * per doc the span count, duplicated-window count, tokens covered
    * by duplicated spans, and the covered fraction. The paper builds a
    * corpus-wide suffix array to find duplicate substrings ≥ 50 tokens;
    * the fixed-length window hash replaces that single-machine global
    * sort with two linear hash shuffles under this EXACT guarantee:
    * token COVERAGE (dup_tokens and the span extents) equals the union
    * of all duplicated substrings of ≥ `winLen` tokens — a length-m
    * duplicate is a run of m−winLen+1 duplicated windows covering
    * precisely its m tokens, and conversely every duplicated window IS
    * a ≥ `winLen`-token duplicate — so no qualifying token is missed or
    * over-covered, and nothing below the threshold leaks in. The only
    * coarsening is the span COUNT: overlapping duplicates with
    * different partners merge into one maximal island (n_spans counts
    * islands, not distinct partner-pairs) — the same merge the paper's
    * removal step applies. The registered default (winLen=8) profiles a
    * superset of the paper's pass; `q_dedup_substr50` registers the
    * published 50-token threshold itself.
    *
    * Scale (100 TB): window hashing is scan-local ([[graft.functions.NgramHashes]]
    * emits 8-byte longs in whole-stage codegen — the window string is
    * never materialized, and the exploded rows carry (doc_id, pos, wh)
    * only, never the token array); one map-side-combined count by
    * window hash; one hash join back (AQE-planned); the interval merge
    * is a doc_id-PARTITIONED window over only the duplicated positions
    * (per-task working set bounded by one document's dup windows).
    * Nothing corpus-sized is broadcast or globally sorted. */
  def substrSpans(docs: DataFrame, winLen: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val L = winLen
    val pos = docs.select(col("doc_id"),
      posexplode(graft.functions.NgramHashes(col("text"), L)).as(Seq("pos", "wh")))
    val cnt = pos.groupBy("wh").agg(count(lit(1)).as("n_occ"))
    val dup = pos.join(cnt.filter(col("n_occ") > 1), Seq("wh"))
      .select(col("doc_id"), col("pos").cast(LongType).as("pos"))
    // interval merge: window at pos covers tokens [pos, pos+L-1]; a new
    // span starts where pos exceeds every previous window's end
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val prevMaxEnd = max(col("pos") + (L - 1)).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    val flagged = dup
      .withColumn("new_span",
        when(prevMaxEnd.isNull || col("pos") > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("span_id",
        sum(col("new_span")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val spans = flagged.groupBy("doc_id", "span_id")
      .agg(min(col("pos")).as("s"), (max(col("pos")) + L).as("e"),
        count(lit(1)).as("nw"))
    val perDoc = spans.groupBy("doc_id").agg(
      count(lit(1)).cast(LongType).as("n_spans"),
      sum(col("nw")).cast(LongType).as("n_dup_windows"),
      sum(col("e") - col("s")).cast(LongType).as("dup_tokens"))
    docs.select(col("doc_id"),
        size(graft.text.TextOps.tokens(col("text"))).cast(LongType).as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        graft.util.D.r(coalesce(col("dup_tokens"), lit(0L)).cast(DoubleType) /
          col("n_tokens"), 6).as("dup_frac"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[substrSpans]]. */
  def substrSpansSql(table: String, winLen: Int = 8): String = {
    val L = winLen
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM $table),
       |w AS (SELECT doc_id, t.pos,
       |    ('0x' || substr(md5(array_to_string(tk[t.pos + 1 : t.pos + $L], ' ')), 1, 15))::BIGINT AS wh
       |  FROM toks, UNNEST(range(0, GREATEST(len(tk) - $L + 1, 0))) AS t(pos)),
       |cnt AS (SELECT wh FROM w GROUP BY wh HAVING COUNT(*) > 1),
       |dup AS (SELECT doc_id, pos FROM w JOIN cnt USING (wh)),
       |flg AS (SELECT doc_id, pos,
       |    CASE WHEN MAX(pos + ${L - 1}) OVER (PARTITION BY doc_id ORDER BY pos
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |         OR pos > MAX(pos + ${L - 1}) OVER (PARTITION BY doc_id ORDER BY pos
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |    THEN 1 ELSE 0 END AS new_span FROM dup),
       |sp AS (SELECT doc_id, pos, SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id FROM flg),
       |spans AS (SELECT doc_id, span_id, MIN(pos) AS s, MAX(pos) + $L AS e, COUNT(*) AS nw
       |  FROM sp GROUP BY 1, 2),
       |per AS (SELECT doc_id, COUNT(*) AS n_spans, SUM(nw) AS n_dup_windows,
       |    SUM(e - s) AS dup_tokens FROM spans GROUP BY 1)
       |SELECT d.doc_id, CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(per.n_spans, 0) AS BIGINT) AS n_spans,
       |  CAST(COALESCE(per.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
       |  CAST(COALESCE(per.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       |  ROUND(CAST(COALESCE(per.dup_tokens, 0) AS DOUBLE)
       |    / len(string_split(d.text, ' ')), 6) AS dup_frac
       |FROM $table d LEFT JOIN per ON d.doc_id = per.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** The EXACTSUBSTR REMOVAL transform ([[substrSpans]] is the profile;
    * this applies the paper's pass): cut every token covered by a
    * duplicated ≥ `winLen`-token substring, in EVERY document — the
    * remove-all-occurrences policy the reference paper's released
    * dedup tooling applies (Lee et al. 2022 §3; their code deletes each
    * duplicated span where it occurs, not keep-one — the keep-one
    * variant is a different pipeline choice, stated here so the
    * contract is exact). Output per doc: original/removed/kept token
    * counts and the cleaned text (space-joined KEPT tokens — the
    * tokenized form, so original inter-token whitespace is normalized;
    * a null text keeps its row with clean_text = '' like the tokenize
    * family).
    *
    * Scale: the covered-token test is a LINEAR event sweep, not a
    * token×span join — duplicated window starts merge into the token
    * stream (one union), and a per-doc running max of window ends
    * marks coverage in one window pass over T+W rows; reconstruction
    * is one bounded per-doc collect_list. Same two hash shuffles as
    * the profile plus the one sort the sweep pays. */
  def substrCut(docs: DataFrame, winLen: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val L = winLen
    val pos = docs.select(col("doc_id"),
      posexplode(graft.functions.NgramHashes(col("text"), L)).as(Seq("pos", "wh")))
    val cnt = pos.groupBy("wh").agg(count(lit(1)).as("n_occ"))
    val dup = pos.join(cnt.filter(col("n_occ") > 1), Seq("wh"))
      .select(col("doc_id"), col("pos").cast(LongType).as("pos"),
        lit(null).cast(StringType).as("tok"),
        (col("pos") + lit(L - 1)).cast(LongType).as("wend"))
    val toks = docs.select(col("doc_id"),
        posexplode(graft.text.TextOps.tokens(col("text"))).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast(LongType).as("pos"), col("tok"),
        lit(null).cast(LongType).as("wend"))
    // sweep order: at equal pos the WINDOW-START event sorts before the
    // token row (tok null first), so the token at a window's start
    // position sees its own window's end in the running max
    val w = Window.partitionBy("doc_id")
      .orderBy(col("pos").asc, col("tok").isNotNull.asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val swept = toks.unionByName(dup)
      .withColumn("cov_end", max(col("wend")).over(w))
      .filter(col("tok").isNotNull)
    val perDoc = swept.groupBy("doc_id").agg(
      count(lit(1)).cast(LongType).as("n_tokens"),
      sum(when(col("cov_end") >= col("pos"), 1L).otherwise(0L))
        .cast(LongType).as("n_removed"),
      array_join(transform(array_sort(collect_list(
          when(col("cov_end") >= col("pos"), lit(null))
            .otherwise(struct(col("pos"), col("tok"))))),
        t => t.getField("tok")), " ").as("clean_text"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        (coalesce(col("n_tokens"), lit(0L)) - coalesce(col("n_removed"), lit(0L)))
          .as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[substrCut]] (same sweep: window starts union
    * into the token stream, running MAX of window ends marks covered
    * tokens, string_agg ORDER BY pos rebuilds the kept text). */
  def substrCutSql(table: String, winLen: Int = 50): String = {
    val L = winLen
    s"""WITH tk AS (SELECT doc_id, string_split(text, ' ') AS a FROM $table),
       |w AS (SELECT doc_id, t.pos,
       |    ('0x' || substr(md5(array_to_string(a[t.pos + 1 : t.pos + $L], ' ')), 1, 15))::BIGINT AS wh
       |  FROM tk, UNNEST(range(0, GREATEST(len(a) - $L + 1, 0))) AS t(pos)),
       |cnt AS (SELECT wh FROM w GROUP BY wh HAVING COUNT(*) > 1),
       |dup AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, CAST(NULL AS VARCHAR) AS tok,
       |    CAST(pos + ${L - 1} AS BIGINT) AS wend FROM w JOIN cnt USING (wh)),
       |toks AS (SELECT doc_id, CAST(t.pos AS BIGINT) AS pos, a[t.pos + 1] AS tok,
       |    CAST(NULL AS BIGINT) AS wend
       |  FROM tk, UNNEST(range(0, len(a))) AS t(pos)),
       |ev AS (SELECT * FROM toks UNION ALL SELECT * FROM dup),
       |sw AS (SELECT doc_id, pos, tok,
       |    MAX(wend) OVER (PARTITION BY doc_id ORDER BY pos, (tok IS NOT NULL)
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cov_end
       |  FROM ev),
       |kept AS (SELECT doc_id, pos, tok,
       |    CASE WHEN cov_end IS NOT NULL AND cov_end >= pos THEN 1 ELSE 0 END AS cov
       |  FROM sw WHERE tok IS NOT NULL),
       |per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |    CAST(SUM(cov) AS BIGINT) AS n_removed,
       |    COALESCE(string_agg(CASE WHEN cov = 0 THEN tok END, ' ' ORDER BY pos), '') AS clean_text
       |  FROM kept GROUP BY doc_id)
       |SELECT d.doc_id,
       |  CAST(COALESCE(per.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  CAST(COALESCE(per.n_removed, 0) AS BIGINT) AS n_removed,
       |  CAST(COALESCE(per.n_tokens, 0) - COALESCE(per.n_removed, 0) AS BIGINT) AS n_kept,
       |  COALESCE(per.clean_text, '') AS clean_text
       |FROM $table d LEFT JOIN per ON d.doc_id = per.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  def ngramJaccardSql(table: String, blockCol: String, th: Double,
                      dfCap: Int = NgramDfCap): String =
    s"""WITH sh AS (SELECT DISTINCT doc_id, blk, ('0x' || substr(md5(sh0), 1, 15))::BIGINT AS sh
       |  FROM (SELECT doc_id, $blockCol AS blk,
       |    unnest(${TextOps.shinglesSql("text")}) AS sh0 FROM $table)),
       |rare AS (SELECT s.doc_id, s.blk, s.sh FROM sh s JOIN (
       |    SELECT blk, sh FROM sh GROUP BY 1, 2
       |    HAVING COUNT(*) >= 2 AND COUNT(*) <= $dfCap) d
       |  ON s.blk = d.blk AND s.sh = d.sh),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM rare a JOIN rare b ON a.blk = b.blk AND a.sh = b.sh AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
       |inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
       |  FROM cand c JOIN sh a ON a.doc_id = c.doc_a
       |  JOIN sh b ON b.doc_id = c.doc_b AND b.sh = a.sh
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, inter, jaccard FROM (
       |  SELECT doc_a, doc_b, inter,
       |    ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
       |  FROM inter JOIN sizes sa ON inter.doc_a = sa.doc_id
       |  JOIN sizes sb ON inter.doc_b = sb.doc_id)
       |WHERE jaccard >= $th ORDER BY doc_a, doc_b""".stripMargin
}
