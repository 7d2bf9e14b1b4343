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
