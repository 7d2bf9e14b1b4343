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
