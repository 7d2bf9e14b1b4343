package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.6).
  *
  * Media are opaque `binary` columns with typed metadata. The fixture has
  * no real crawl images, so the payload column is SYNTHESIZED as genuine
  * format bytes — a real JPEG segment stream (SOI → APP0/JFIF → DQT →
  * SOF0 → SOS → entropy body → EOI), a real PNG (signature + CRC-correct
  * IHDR + body + IEND), or a real GIF89a (logical-screen descriptor) —
  * wrapping the document text as the opaque body. The decode step is then
  * a GENUINE header parse (magic sniff, JPEG marker walk to the SOF
  * frame, PNG IHDR big-endian reads, GIF little-endian shorts): the
  * oracle knows the dimensions the fixture embedded and checks that the
  * parser recovered them from the markers. Format layouts per the public
  * specs: ITU T.81 §B.2 (JPEG markers), RFC 2083 §3 (PNG IHDR), GIF89a
  * spec §18 (logical screen descriptor). Spark-side plumbing: binary
  * payload column, batched `mapPartitions` decode with a typed schema,
  * partition-parallel, codec context (CRC32) reused per task.
  */
object Multimodal {

  /** Typed result of the decoder. `byte_len`/`head_byte` describe the
    * full media payload (not the body): JPEG leads 0xFF, PNG 0x89,
    * GIF 'G'. */
  final case class MediaMeta(doc_id: Long, byte_len: Long, head_byte: Int,
                             width: Long, height: Long, format: String)

  /** Embedded dimensions, derived deterministically from the BODY bytes
    * (len, first byte) so the oracle can reconstruct the ground truth
    * from `text` without building payload bytes in SQL. */
  private def dims(body: Array[Byte]): (Int, Int) = {
    val len = body.length
    val head = if (body.nonEmpty) body(0) & 0xff else 0
    (16 + (len % 64) * 4, 16 + ((len + head) % 48) * 4)
  }

  /** Fixed header+trailer overhead each format adds around the body —
    * the oracle's byte_len = strlen(text) + overhead(format). */
  private[multimodal] val JpegOverhead = 124 // SOI 2 + APP0 18 + DQT 69 + SOF0 19 + SOS 14 + EOI 2
  private[multimodal] val PngOverhead = 45   // sig 8 + IHDR 25 + IEND 12
  private[multimodal] val GifOverhead = 14   // header+LSD 13 + trailer 1

  /** Deterministic media payload: REAL format bytes around the text
    * body. Format rotates on the body's first byte (empty → jpeg), the
    * same rotation the rest of the family tags with. */
  def synthPayload(body: Array[Byte]): Array[Byte] = {
    val head = if (body.nonEmpty) body(0) & 0xff else 0
    val (w, h) = dims(body)
    (head % 3) match {
      case 0 => synthJpeg(body, w, h)
      case 1 => synthPng(body, w, h)
      case _ => synthGif(body, w, h)
    }
  }

  private def be2(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
  private def be4(v: Long) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
    (v >>> 8).toByte, v.toByte)
  private def le2(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)

  /** ITU T.81 baseline segment stream. The DQT table is deterministic
    * filler (a parser skips it by length); SOF0 carries the real
    * precision/height/width/component bytes a marker walk reads. */
  private def synthJpeg(body: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length + JpegOverhead)
    out.write(Array[Byte](0xFF.toByte, 0xD8.toByte)) // SOI
    out.write(Array[Byte](0xFF.toByte, 0xE0.toByte, 0x00, 0x10, // APP0 len 16
      'J', 'F', 'I', 'F', 0x00, 0x01, 0x01, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00))
    out.write(Array[Byte](0xFF.toByte, 0xDB.toByte, 0x00, 0x43, 0x00)) // DQT len 67, pq/tq 0
    val head = if (body.nonEmpty) body(0) & 0xff else 0
    (0 until 64).foreach(i => out.write(((i * 7 + head) % 255 + 1) & 0xff)) // 64 nonzero q entries
    out.write(Array[Byte](0xFF.toByte, 0xC0.toByte, 0x00, 0x11, 0x08)) // SOF0 len 17, precision 8
    out.write(be2(h)); out.write(be2(w))
    out.write(Array[Byte](0x03, 0x01, 0x22, 0x00, 0x02, 0x11, 0x01, 0x03, 0x11, 0x01))
    out.write(Array[Byte](0xFF.toByte, 0xDA.toByte, 0x00, 0x0C, 0x03, // SOS len 12
      0x01, 0x00, 0x02, 0x11, 0x03, 0x11, 0x00, 0x3F, 0x00))
    out.write(body)                                   // entropy-coded "scan"
    out.write(Array[Byte](0xFF.toByte, 0xD9.toByte)) // EOI
    out.toByteArray
  }

  /** RFC 2083 layout with a REAL CRC32 over the IHDR chunk type+data —
    * a checking parser would verify it. */
  private def synthPng(body: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length + PngOverhead)
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A))
    val ihdr = "IHDR".getBytes("US-ASCII") ++ be4(w) ++ be4(h) ++
      Array[Byte](0x08, 0x02, 0x00, 0x00, 0x00) // depth 8, truecolor RGB
    val crc = new java.util.zip.CRC32; crc.update(ihdr)
    out.write(be4(13L)); out.write(ihdr); out.write(be4(crc.getValue))
    out.write(body) // opaque "IDAT stream" body
    val iend = "IEND".getBytes("US-ASCII")
    val crc2 = new java.util.zip.CRC32; crc2.update(iend)
    out.write(be4(0L)); out.write(iend); out.write(be4(crc2.getValue))
    out.toByteArray
  }

  /** GIF89a header + logical screen descriptor (little-endian dims). */
  private def synthGif(body: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(body.length + GifOverhead)
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(le2(w)); out.write(le2(h))
    out.write(Array[Byte](0x00, 0x00, 0x00)) // no GCT, bg 0, square pixels
    out.write(body)
    out.write(0x3B) // trailer
    out.toByteArray
  }

  private def u8(p: Array[Byte], i: Int) = p(i) & 0xff
  private def rdBe2(p: Array[Byte], i: Int) = (u8(p, i) << 8) | u8(p, i + 1)
  private def rdBe4(p: Array[Byte], i: Int): Long =
    (u8(p, i).toLong << 24) | (u8(p, i + 1) << 16) | (u8(p, i + 2) << 8) | u8(p, i + 3)
  private def rdLe2(p: Array[Byte], i: Int) = u8(p, i) | (u8(p, i + 1) << 8)

  /** GENUINE header parse: magic sniff, then the per-format walk.
    * Fail-loud on anything that is not a recognized media payload —
    * a silent default would mask fixture/synthesis drift. */
  def parseMeta(p: Array[Byte]): (String, Long, Long) = {
    if (p.length >= 4 && u8(p, 0) == 0xFF && u8(p, 1) == 0xD8) {
      // JPEG: walk the segment stream from SOI to the first SOF frame
      // header (SOF0..SOF15 minus DHT/JPG/DAC, per T.81 Table B.1) —
      // skipping APPn/DQT/COM/... by their embedded big-endian lengths
      var i = 2
      while (i + 4 <= p.length) {
        if (u8(p, i) != 0xFF)
          throw new IllegalStateException(s"jpeg: expected marker at $i, got ${u8(p, i)}")
        val m = u8(p, i + 1)
        if (m == 0xFF) { i += 1 } // fill byte before a marker (T.81 B.1.1.2)
        else if (m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC) {
          // SOFn payload: len(2) precision(1) height(2) width(2) ... —
          // a stream truncated INSIDE the frame header passes the
          // 4-byte loop guard but not the 9 bytes the dim reads need
          // (the degenerate-payload pin's AIOOBE class: fail loud, not
          // with an array bounds crash)
          if (i + 9 > p.length)
            throw new IllegalStateException(s"jpeg: truncated SOF frame header at $i")
          return ("jpeg", rdBe2(p, i + 7).toLong, rdBe2(p, i + 5).toLong)
        } else i += 2 + rdBe2(p, i + 2)
      }
      throw new IllegalStateException("jpeg: no SOF marker before end of stream")
    } else if (p.length >= 33 && u8(p, 0) == 0x89 && p(1) == 'P' && p(2) == 'N' &&
      p(3) == 'G' && u8(p, 4) == 0x0D && u8(p, 5) == 0x0A && u8(p, 6) == 0x1A &&
      u8(p, 7) == 0x0A) {
      // PNG: IHDR must be the first chunk (RFC 2083 §3.1); verify its
      // type AND its CRC before trusting the dims
      if (!(p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R'))
        throw new IllegalStateException("png: first chunk is not IHDR")
      val crc = new java.util.zip.CRC32
      crc.update(p, 12, 4 + 13)
      if (crc.getValue != rdBe4(p, 29))
        throw new IllegalStateException("png: IHDR CRC mismatch")
      ("png", rdBe4(p, 16), rdBe4(p, 20))
    } else if (p.length >= 13 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F' &&
      p(3) == '8' && (p(4) == '7' || p(4) == '9') && p(5) == 'a') {
      ("gif", rdLe2(p, 6).toLong, rdLe2(p, 8).toLong)
    } else throw new IllegalStateException(
      s"unrecognized media payload (${p.length} bytes, head ${if (p.isEmpty) -1 else u8(p, 0)})")
  }

  /** documents.text → synthesized real-format binary payload →
    * distributed batched GENUINE header decode. */
  def decodeMeta(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val decoded = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text").cast(BinaryType).as("body"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // batch shape: one decoder pass per task over the partition's
        // payloads (codec/CRC context reuse), never per-row driver work
        it.map { case (id, body) =>
          val payload = synthPayload(body)
          val (fmt, w, h) = parseMeta(payload)
          MediaMeta(id, payload.length.toLong, payload(0) & 0xff, w, h, fmt)
        }
      }
      .toDF()
    // a NULL body has no payload to decode: all-null metadata, the row
    // kept — exactly what the oracle's strlen(NULL) arithmetic yields
    val nulls = docs.filter(col("text").isNull)
      .select(col("doc_id"),
        lit(null).cast(LongType).as("byte_len"),
        lit(null).cast("int").as("head_byte"),
        lit(null).cast(LongType).as("width"),
        lit(null).cast(LongType).as("height"),
        lit(null).cast("string").as("format"))
    decoded.unionByName(nulls).orderBy("doc_id")
  }

  /** Oracle mirror: the GROUND TRUTH the fixture embedded, reconstructed
    * from the body (`text`) — byte_len adds the per-format fixed
    * overhead, head_byte is each format's magic first byte (0xFF/0x89/
    * 'G'), width/height are the synthesis formulas. The Spark side must
    * recover the same values from the real markers. hb is the first
    * UTF-8 BYTE of the body (hex of the blob), matching `body(0) & 0xff`
    * even for non-ASCII leading characters. */
  def decodeMetaSql(table: String): String =
    s"""SELECT doc_id,
       |  CAST(strlen(text) + CASE hb % 3 WHEN 0 THEN $JpegOverhead
       |    WHEN 1 THEN $PngOverhead WHEN 2 THEN $GifOverhead END AS BIGINT) AS byte_len,
       |  CAST(CASE hb % 3 WHEN 0 THEN 255 WHEN 1 THEN 137 WHEN 2 THEN 71 END AS INT) AS head_byte,
       |  CAST(16 + (strlen(text) % 64) * 4 AS BIGINT) AS width,
       |  CAST(16 + ((strlen(text) + hb) % 48) * 4 AS BIGINT) AS height,
       |  CASE hb % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' WHEN 2 THEN 'gif' END AS format
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
    * body head byte exactly as [[synthPayload]]'s format rotation does,
    * but as a scan-local expression (no mapPartitions — nothing here
    * needs a codec). */
  def payloadDedup(docs: DataFrame): DataFrame = {
    val payload = col("text").cast(BinaryType)
    val len = octet_length(col("text")).cast(LongType)
    // head byte via hex prefix: payload(0) & 0xff, empty → 0
    val hb = when(len === 0, 0L)
      .otherwise(conv(substring(hex(payload), 1, 2), 16, 10).cast(LongType))
    val fmt = when(hb % 3 === 0, "jpeg").when(hb % 3 === 1, "png")
      .when(hb % 3 === 2, "gif") // NULL payload -> NULL format (no otherwise)
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
       |      WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' WHEN 2 THEN 'gif' END AS format,
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
  def payloadPhashPairsSql(table: String): String =
    payloadPhashPairsCoreSql(table) + "\nORDER BY doc_a, doc_b"

  /** Unordered core of [[payloadPhashPairsSql]] — exposed so
    * [[payloadKeepSql]] can embed it as a CTE directly instead of
    * reverse-parsing the ordered variant's SQL (a lastIndexOf("ORDER
    * BY") cut would silently mis-slice if the final clause ever
    * changed or a window OVER (ORDER BY ...) landed after the last
    * top-level ORDER BY). */
  def payloadPhashPairsCoreSql(table: String): String = {
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
       |FROM cand WHERE bit_count(xor(sa, sb)) <= $PhashHammingMax""".stripMargin
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
    val pairsCte = payloadPhashPairsCoreSql(table)
    s"""WITH pr AS ($pairsCte),
       |drops AS (SELECT DISTINCT doc_b AS doc_id FROM pr),
       |meta AS (SELECT doc_id,
       |    CASE (CASE WHEN strlen(text) = 0 THEN 0
       |          ELSE ('0x' || substr(hex(CAST(text AS BLOB)), 1, 2))::INT END) % 3
       |      WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' WHEN 2 THEN 'gif' END AS format
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
