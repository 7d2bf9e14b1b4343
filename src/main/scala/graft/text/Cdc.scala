package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Content-defined chunking (rolling-hash CDC) — the byte-level dedup
  * primitive of large-corpus pipelines (rsync/LBFS-style): chunk
  * boundaries are placed where a rolling window hash hits a mask, so
  * shared substrings chunk identically regardless of their offset, and
  * duplicated passages surface as shared chunk hashes across documents.
  *
  * Deterministic cross-engine definition (mirrored in the oracle SQL):
  * window W=12 chars, base B=5; boundary AFTER 1-based position i
  * (i ≥ W) iff  (Σ_{j=0..W-1} ascii(char_{i−j})·B^j) mod 64 == 0.
  * B=5 keeps the window polynomial ≤ ~2·10^10 — exact in BIGINT on both
  * engines (no modular reduction to disagree on). Chunks are the
  * substrings between boundaries plus the tail; every chunk is
  * identified by md5.
  *
  * Spark side: the recurrence is inherently sequential per document, so
  * this is genuine per-row imperative logic — `mapPartitions` (the same
  * tier as the multimodal codec stub), not an interpreted per-char HOF.
  * One scan, map-side combined aggregation; chunk rows (not documents)
  * are what shuffles.
  */
object Cdc {

  val Window = 12
  val Base = 5L
  val MaskMod = 64L

  /** Chunk a single text: list of (start0, chunk) — pure, shared by the
    * Spark path and tests. */
  def chunks(text: String): Seq[String] = {
    val n = text.length
    if (n == 0) return Seq.empty
    val out = Seq.newBuilder[String]
    var prev = 0 // 0-based exclusive start of current chunk
    if (n >= Window) {
      // rolling value: Σ c(p-j)·B^j for j=0..W-1, p = current 0-based pos
      val powTop = math.pow(Base.toDouble, (Window - 1).toDouble).toLong
      var h = 0L
      var p = 0
      while (p < n) {
        val c = text.charAt(p).toLong
        h = if (p < Window) h * Base + c
            else (h - text.charAt(p - Window).toLong * powTop) * Base + c
        if (p >= Window - 1 && h % MaskMod == 0) {
          out += text.substring(prev, p + 1)
          prev = p + 1
        }
        p += 1
      }
    }
    if (prev < n) out += text.substring(prev, n)
    out.result()
  }

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** (doc_id, chunk_hash) rows for a document table. */
  def chunkHashes(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      // null text → no chunks, matching the oracle (its per-position
      // window over a NULL string yields no boundary rows)
      .mapPartitions(_.flatMap { case (id, text) =>
        if (text == null) Iterator.empty
        else chunks(text).map(c => (id, md5hex(c)))
      })
      .toDF("doc_id", "chunk_hash")
  }

  /** Duplicated-chunk groups: chunks appearing ≥ 2 times in the corpus. */
  def dupChunks(spark: SparkSession, docs: DataFrame): DataFrame =
    chunkHashes(spark, docs)
      .groupBy("chunk_hash")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"),
        min(col("doc_id")).as("min_doc_id"))
      .filter(col("n_occurrences") >= 2)
      .orderBy("chunk_hash")

  /** DuckDB mirror: per-position window polynomial (exact BIGINT),
    * boundaries via list_filter, chunks via lag window + tail. Note the
    * recurrence-free form — each position's hash is the explicit
    * 12-term sum, which equals the Spark side's rolling recurrence. */
  def dupChunksSql(table: String): String = {
    val terms = (0 until Window).map(j =>
      s"CAST(ascii(text[i - $j]) AS BIGINT) * ${Seq.fill(j)(Base).product max 1L}").mkString(" + ")
    s"""WITH pos AS (
       |  SELECT doc_id, text,
       |    unnest(list_filter(range($Window, length(text) + 1),
       |      i -> ($terms) % $MaskMod = 0)) AS b
       |  FROM $table),
       |bchunks AS (
       |  SELECT doc_id,
       |    substr(text, COALESCE(lag(b) OVER w, 0) + 1, b - COALESCE(lag(b) OVER w, 0)) AS chunk
       |  FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY b)),
       |lastb AS (SELECT doc_id, MAX(b) AS lb FROM pos GROUP BY 1),
       |tailc AS (
       |  SELECT d.doc_id, substr(d.text, COALESCE(l.lb, 0) + 1) AS chunk
       |  FROM $table d LEFT JOIN lastb l USING (doc_id)
       |  WHERE COALESCE(l.lb, 0) < length(d.text)),
       |allc AS (SELECT * FROM bchunks UNION ALL SELECT * FROM tailc)
       |SELECT md5(chunk) AS chunk_hash, COUNT(*) AS n_occurrences,
       |  COUNT(DISTINCT doc_id) AS n_docs, MIN(doc_id) AS min_doc_id
       |FROM allc GROUP BY 1 HAVING COUNT(*) >= 2
       |ORDER BY chunk_hash""".stripMargin
  }
}
