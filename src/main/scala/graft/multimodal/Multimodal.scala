package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.6).
  *
  * Media are opaque `binary` columns with typed metadata. The decode step
  * is a deterministic STUB (image/audio codecs are not available in this
  * container — see the builder brief): it derives metadata from the raw
  * bytes (length + first byte) exactly as a real decoder would derive it
  * from a header. The Spark-side plumbing is real: binary payload column,
  * batched `mapPartitions` decode with a typed schema, partition-parallel.
  */
object Multimodal {

  /** Typed result of the stub decoder. */
  final case class MediaMeta(doc_id: Long, byte_len: Long, head_byte: Int,
                             width: Long, height: Long, format: String)

  /** The deterministic stub "decode": what a real codec would read from
    * the payload header, faked from (length, first byte). Mirrored in SQL:
    *   width  = 16 + (byte_len % 64) * 4
    *   height = 16 + ((byte_len + head_byte) % 48) * 4
    *   format = ['jpeg','png','webp'][head_byte % 3]
    */
  def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
    val len = payload.length.toLong
    val head = if (payload.nonEmpty) payload(0) & 0xff else 0
    val fmt = (head % 3) match {
      case 0 => "jpeg"
      case 1 => "png"
      case _ => "webp"
    }
    MediaMeta(docId, len, head, 16L + (len % 64) * 4, 16L + ((len + head) % 48) * 4, fmt)
  }

  /** documents.text → binary payload + distributed batched stub decode. */
  def decodeMeta(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // batch shape: a real decoder would process the partition's
        // payloads as one batch per task (codec context reuse)
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
      .toDF()
      .orderBy("doc_id")
  }

  /** Oracle mirror. head_byte is the first UTF-8 BYTE (hex of the blob),
    * matching `payload(0) & 0xff` on the Spark side even for non-ASCII
    * text — ascii(substr(text,1,1)) would be the first CODEPOINT and
    * diverge on any multi-byte leading character. */
  def decodeMetaSql(table: String): String =
    s"""SELECT doc_id,
       |  CAST(strlen(text) AS BIGINT) AS byte_len,
       |  CAST(hb AS INT) AS head_byte,
       |  CAST(16 + (strlen(text) % 64) * 4 AS BIGINT) AS width,
       |  CAST(16 + ((strlen(text) + hb) % 48) * 4 AS BIGINT) AS height,
       |  CASE hb % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format
       |FROM (SELECT doc_id, text,
       |    CASE WHEN strlen(text) = 0 THEN 0
       |         ELSE ('0x' || substr(hex(CAST(text AS BLOB)), 1, 2))::INT END AS hb
       |  FROM $table)
       |ORDER BY doc_id""".stripMargin

  /** Frame sampling plan: 4 stride offsets per payload, exploded.
    * Offsets are BYTE offsets into the payload (octet_length, matching
    * the oracle's strlen byte semantics), not character counts. */
  def frameSample(docs: DataFrame): DataFrame = {
    val len = octet_length(col("text")).cast(LongType)
    val stride = greatest(floor(len / 4).cast(LongType), lit(1L))
    docs.select(col("doc_id"), len.as("byte_len"), stride.as("stride"),
        posexplode(sequence(lit(0L), stride * 3, stride)))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "offset")
      .filter(col("offset") < col("byte_len"))
      .select(col("doc_id"), col("frame_idx").cast(LongType).as("frame_idx"),
        col("offset"), col("byte_len"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Exact payload dedup with per-format redundancy accounting — the
    * standard first media-pipeline step (identical files are the bulk of
    * crawl image duplication; content-hash dedup runs BEFORE any decode).
    * Unlike the decode stub, this path is fully real: md5 over the raw
    * binary payload, two map-side-combined aggregations (per-(format,
    * fingerprint) then per-format), zero decode, zero driver state.
    * Output per format: payload count, distinct-content count, duplicate
    * rows, total bytes, and the bytes a dedup pass would reclaim
    * (Σ (copies−1)·len per fingerprint). The format tag derives from the
    * head byte exactly as [[decodeStub]] does, but as a scan-local
    * expression (no mapPartitions — nothing here needs a codec). */
  def payloadDedup(docs: DataFrame): DataFrame = {
    val payload = col("text").cast(BinaryType)
    val len = octet_length(col("text")).cast(LongType)
    // head byte via hex prefix: payload(0) & 0xff, empty → 0
    val hb = when(len === 0, 0L)
      .otherwise(conv(substring(hex(payload), 1, 2), 16, 10).cast(LongType))
    val fmt = when(hb % 3 === 0, "jpeg").when(hb % 3 === 1, "png").otherwise("webp")
    val perFp = docs
      .select(fmt.as("format"), md5(payload).as("fp"), len.as("byte_len"))
      .groupBy("format", "fp")
      .agg(count(lit(1)).as("n"), first(col("byte_len")).as("len"))
    perFp.groupBy("format")
      .agg(sum(col("n")).cast(LongType).as("n_payloads"),
        count(lit(1)).cast(LongType).as("n_unique"),
        sum(col("n") - 1).cast(LongType).as("n_dup_rows"),
        sum(col("n") * col("len")).cast(LongType).as("bytes_total"),
        sum((col("n") - 1) * col("len")).cast(LongType).as("bytes_reclaimable"))
      .orderBy("format")
  }

  def payloadDedupSql(table: String): String =
    s"""WITH p AS (SELECT
       |    CASE (CASE WHEN strlen(text) = 0 THEN 0
       |          ELSE ('0x' || substr(hex(CAST(text AS BLOB)), 1, 2))::INT END) % 3
       |      WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
       |    md5(text) AS fp,
       |    CAST(strlen(text) AS BIGINT) AS byte_len
       |  FROM $table),
       |g AS (SELECT format, fp, COUNT(*) AS n, MIN(byte_len) AS len
       |  FROM p GROUP BY 1, 2)
       |SELECT format, CAST(SUM(n) AS BIGINT) AS n_payloads,
       |  CAST(COUNT(*) AS BIGINT) AS n_unique,
       |  CAST(SUM(n - 1) AS BIGINT) AS n_dup_rows,
       |  CAST(SUM(n * len) AS BIGINT) AS bytes_total,
       |  CAST(SUM((n - 1) * len) AS BIGINT) AS bytes_reclaimable
       |FROM g GROUP BY format ORDER BY format""".stripMargin

  /** Perceptual-hash-SHAPED payload signature + blocking profile. A real
    * image pipeline computes pHash from decoded pixels (DCT sign
    * pattern); decode is stubbed here, so the deterministic stand-in
    * computes the same SHAPE of signature from the raw payload: 16 bytes
    * sampled at stride len/16 (the [[frameSample]] convention), bit i =
    * sampled byte ≥ mean of the samples, packed into a 16-bit sig —
    * entirely scan-local codegen'd expressions over the binary column
    * (no decode, no shuffle until the profile aggregation). The output
    * is the LSH blocking profile per 8-bit band (bucket count, max
    * bucket, Σn² pair bound) — the diagnostic that says whether banding
    * this signature would keep candidate pairs tractable, with the pair
    * join itself shaped exactly like the simhash band join. Empty
    * payloads carry no signal and are excluded (mirrored). */
  def payloadPhashProfile(docs: DataFrame): DataFrame = {
    val payload = col("text").cast(BinaryType)
    val len = octet_length(col("text")).cast(LongType)
    val stride = greatest(floor(len / 16).cast(LongType), lit(1L))
    // byte value at 0-based offset o (guarded in-range): hex pair at
    // char index 2o+1
    def byteAt(o: org.apache.spark.sql.Column) =
      when(o < len,
        conv(hex(payload).substr((o * 2 + 1).cast(IntegerType), lit(2)), 16, 10)
          .cast(LongType))
        .otherwise(lit(0L))
    val samples = (0 until 16).map(i => byteAt(stride * i))
    val meanX16 = samples.reduce(_ + _) // mean·16, exact integer
    val sig = samples.zipWithIndex.map { case (b, i) =>
      when(b * 16 >= meanX16, 1L << i).otherwise(0L) }.reduce(_ + _)
    val sigs = docs.filter(len > 0)
      .select(sig.as("sig"))
      .select(explode(array(
        struct(lit(0L).as("band"), (col("sig") % 256).as("bucket")),
        struct(lit(1L).as("band"), (col("sig") / 256).cast(LongType).as("bucket")))).as("b"))
      .select(col("b.band").as("band"), col("b.bucket").as("bucket"))
    sigs.groupBy("band", "bucket").agg(count(lit(1)).as("n"))
      .groupBy("band")
      .agg(count(lit(1)).cast(LongType).as("n_buckets"),
        max(col("n")).cast(LongType).as("max_bucket"),
        sum(col("n") * col("n")).cast(LongType).as("sum_sq"))
      .orderBy("band")
  }

  def payloadPhashProfileSql(table: String): String = {
    val sample = (0 until 16).map { i =>
      s"""(CASE WHEN GREATEST(strlen(text) // 16, 1) * $i < strlen(text)
         | THEN ('0x' || substr(hex(CAST(text AS BLOB)), GREATEST(strlen(text) // 16, 1) * $i * 2 + 1, 2))::BIGINT
         | ELSE 0 END)""".stripMargin.replaceAll("\n", " ")
    }
    val meanX16 = sample.mkString("(", " + ", ")")
    val sigExpr = sample.zipWithIndex
      .map { case (s, i) => s"(CASE WHEN $s * 16 >= $meanX16 THEN ${1L << i} ELSE 0 END)" }
      .mkString(" + ")
    s"""WITH s AS (SELECT ($sigExpr) AS sig FROM $table WHERE strlen(text) > 0),
       |b AS (SELECT 0 AS band, sig % 256 AS bucket FROM s
       |  UNION ALL SELECT 1, sig // 256 FROM s),
       |g AS (SELECT band, bucket, COUNT(*) AS n FROM b GROUP BY 1, 2)
       |SELECT CAST(band AS BIGINT) AS band, CAST(COUNT(*) AS BIGINT) AS n_buckets,
       |  CAST(MAX(n) AS BIGINT) AS max_bucket, CAST(SUM(n * n) AS BIGINT) AS sum_sq
       |FROM g GROUP BY band ORDER BY band""".stripMargin
  }

  /** Bits in the payload pHash-shaped signature (60 = 4 bands × 15,
    * the [[graft.dedup.Dedup]] SimHash convention — stays clear of
    * BIGINT sign in both engines). */
  val PhashBits = 60
  val PhashBands = 4
  val PhashBandBits = 15

  /** Max Hamming distance (of [[PhashBits]]) for a verified near-dup
    * pair. RECALL CONTRACT: with 4 bands of 15 bits, a pair is a
    * candidate only if ≥ 1 band matches exactly; at hamming ≤ 6 the
    * probability all 4 bands differ is small but nonzero — the standard
    * LSH trade, identical in both engines. */
  val PhashHammingMax = 6L

  /** 60-bit payload signature (doc_id, psig): byte samples at stride
    * len/60 (the [[payloadPhashProfile]] sampling convention widened to
    * 60 taps), bit j = sample_j ≥ mean of the samples — the SHAPE of a
    * perceptual hash (DCT sign pattern) computed from raw bytes because
    * decode is stubbed. Scan-local codegen'd expressions; empty
    * payloads excluded (no signal). */
  def payloadPhashSig(docs: DataFrame): DataFrame = {
    val payload = col("text").cast(BinaryType)
    val len = octet_length(col("text")).cast(LongType)
    // native single-pass signature — the 60-tap hex/substr Column chain
    // re-hexed the whole payload per tap (see PayloadPhash's scaladoc)
    docs.filter(len > 0).select(col("doc_id"),
      graft.functions.PayloadPhash(payload).as("psig"))
  }

  /** Banded pHash near-dup PAIRS — the checked near-dup artifact the
    * blocking profile ([[payloadPhashProfile]]) only forecasts:
    * signature → 4×15-bit band self-join → Hamming verify ≤
    * [[PhashHammingMax]], exactly the [[graft.dedup.Dedup.simhashPairs]]
    * shape over binary payloads. The band join shuffles 16 bytes/doc
    * (id + sig), never payloads; candidate volume is bounded by the
    * band-bucket sizes the profile reports. */
  def payloadPhashPairs(docs: DataFrame): DataFrame = {
    val sh = payloadPhashSig(docs).repartition(col("doc_id"))
    val mask = (1L << PhashBandBits) - 1
    val bandStructs = (0 until PhashBands).map(k =>
      struct(lit(k).as("k"),
        shiftright(col("psig"), PhashBandBits * k).bitwiseAND(lit(mask)).as("band")))
    val bs = sh.select(col("doc_id"), col("psig"), explode(array(bandStructs: _*)).as("b"))
      .select(col("doc_id"), col("psig"), col("b.k").as("k"), col("b.band").as("band"))
    val cand = bs.alias("a").join(bs.alias("b"),
        col("a.k") === col("b.k") && col("a.band") === col("b.band") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.psig").as("sa"), col("b.psig").as("sb"))
      .distinct()
    cand.withColumn("hamming", bit_count(col("sa").bitwiseXOR(col("sb"))).cast(LongType))
      .filter(col("hamming") <= PhashHammingMax)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** DuckDB mirror of [[payloadPhashPairs]]. Staged CTEs (samples →
    * mean → signature) keep the binder's expression depth flat — the
    * inlined 60-tap form exceeds DuckDB's recursion limit. */
  def payloadPhashPairsSql(table: String): String = {
    val sampleCols = (0 until PhashBits).map { i =>
      s"""(CASE WHEN GREATEST(strlen(text) // $PhashBits, 1) * $i < strlen(text)
         | THEN ('0x' || substr(hex(CAST(text AS BLOB)), GREATEST(strlen(text) // $PhashBits, 1) * $i * 2 + 1, 2))::BIGINT
         | ELSE 0 END) AS s$i""".stripMargin.replaceAll("\n", " ")
    }.mkString(",\n|    ")
    val meanXn = (0 until PhashBits).map(i => s"s$i").mkString(" + ")
    val sigExpr = (0 until PhashBits)
      .map(i => s"(CASE WHEN s$i * $PhashBits >= mx THEN ${1L << i} ELSE 0 END)")
      .mkString(" + ")
    val mask = (1L << PhashBandBits) - 1
    val bandBranches = (0 until PhashBands).map(k =>
      s"SELECT doc_id, psig, $k AS k, (psig >> ${PhashBandBits * k}) & $mask AS band FROM sh")
    s"""WITH samp AS (SELECT doc_id,
       |    $sampleCols
       |  FROM $table WHERE strlen(text) > 0),
       |m AS (SELECT *, ($meanXn) AS mx FROM samp),
       |sh AS (SELECT doc_id, ($sigExpr) AS psig FROM m),
       |bands AS (${bandBranches.mkString("\nUNION ALL\n")}),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    a.psig AS sa, b.psig AS sb
       |  FROM bands a JOIN bands b ON a.k = b.k AND a.band = b.band AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(sa, sb)) <= $PhashHammingMax
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Near-dup survivor selection over the [[payloadPhashPairs]] edge
    * set: greedy keep-min — any payload appearing as the LARGER doc_id
    * of a verified pair is dropped (pairwise, NOT transitive closure;
    * the closure form is the q_dedup_cluster_keep shape and costs its
    * iteration — this is the one-pass rule media pipelines actually
    * run first). Reported per decoded format so the artifact shows
    * WHAT is being deduplicated, not just how much.
    *
    * Scale: the pair table is band-blocked (pair-bounded, tiny for a
    * clean corpus), so the drop set broadcasts; the corpus side is one
    * metadata scan. */
  def payloadKeep(spark: SparkSession, docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val drops = payloadPhashPairs(docs)
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("dropped", lit(1L))
    decodeMeta(spark, docs).select(col("doc_id"), col("format"))
      .join(broadcast(drops), Seq("doc_id"), "left_outer")
      .groupBy("format")
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(coalesce(col("dropped"), lit(0L))).cast(LongType).as("n_dropped"),
        (count(lit(1)) - sum(coalesce(col("dropped"), lit(0L)))).cast(LongType).as("n_kept"))
      .orderBy("format")
  }

  /** DuckDB mirror of [[payloadKeep]] — same pairs CTE, same keep-min
    * drop rule, same stub format derivation. */
  def payloadKeepSql(table: String): String = {
    val pairs = payloadPhashPairsSql(table)
    // strip the trailing ORDER BY of the pairs query for CTE embedding
    val pairsCte = pairs.substring(0, pairs.lastIndexOf("ORDER BY"))
    s"""WITH pr AS ($pairsCte),
       |drops AS (SELECT DISTINCT doc_b AS doc_id FROM pr),
       |meta AS (SELECT doc_id,
       |    CASE (CASE WHEN strlen(text) = 0 THEN 0
       |          ELSE ('0x' || substr(hex(CAST(text AS BLOB)), 1, 2))::INT END) % 3
       |      WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format
       |  FROM $table)
       |SELECT format, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |  CAST(COUNT(*) - SUM(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |FROM meta m LEFT JOIN drops d ON m.doc_id = d.doc_id
       |GROUP BY format ORDER BY format""".stripMargin
  }

  def frameSampleSql(table: String): String =
    s"""SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx, off AS "offset", byte_len FROM (
       |  SELECT doc_id, byte_len, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY off) - 1 AS frame_idx, off
       |  FROM (
       |    SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len,
       |      unnest([CAST(0 AS BIGINT), GREATEST(strlen(text) // 4, 1),
       |              GREATEST(strlen(text) // 4, 1) * 2,
       |              GREATEST(strlen(text) // 4, 1) * 3]) AS off
       |    FROM $table)
       |  WHERE off < byte_len)
       |ORDER BY doc_id, frame_idx""".stripMargin
}
