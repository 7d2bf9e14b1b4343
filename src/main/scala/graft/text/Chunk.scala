package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Retrieval / embedding-prep chunking: split every document into
  * fixed-size token windows with overlap — the step that feeds an
  * embedding model or a RAG index. Reference scope: pd_explain stops at
  * DataFrame analytics; this extends the text family
  * (SURVEY.md §2.5) with the serving-side preparation step.
  *
  * Chunk rule (the standard sliding window): chunk `i` starts at token
  * `i·stride` (stride = chunkTokens − overlap) and spans up to
  * `chunkTokens` tokens; windows start while `start < n − overlap`, so
  * a final window that would be fully contained in its predecessor is
  * not emitted (chunk 0 always exists, even for short/empty docs).
  *
  * Scale notes (100 TB): entirely scan-local — tokenize, a per-doc
  * `sequence` of window starts, one narrow `explode`, and slice+md5 per
  * chunk. Zero corpus shuffles (the trailing ORDER BY exists for the
  * oracle's total order only); the operator is embarrassingly parallel
  * and whole-stage-codegen'd end to end.
  */
object Chunk {

  /** Per-chunk rows: (doc_id, chunk_idx, start_tok, n_tok, chunk_fp)
    * where chunk_fp = md5 of the space-joined token window — the
    * stable id an embedding/RAG index keys on. */
  def ragChunks(docs: DataFrame, chunkTokens: Int = 64, overlap: Int = 16): DataFrame =
    ragChunksUnsorted(docs, chunkTokens, overlap).orderBy("doc_id", "chunk_idx")

  /** [[ragChunks]] without the final sort — scan-local (tokenize +
    * window explode + fingerprint, no shuffle), so it runs unchanged on
    * a stream (sorting is what streaming append mode can't do;
    * StreamingSpec pins batch parity). */
  def ragChunksUnsorted(docs: DataFrame, chunkTokens: Int = 64, overlap: Int = 16): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap must be in [0, chunkTokens): got $overlap vs $chunkTokens")
    val stride = chunkTokens - overlap
    docs.select(col("doc_id"), TextOps.tokens(col("text")).as("tk"))
      .select(col("doc_id"), col("tk"), size(col("tk")).as("n"),
        explode(sequence(lit(0), greatest(size(col("tk")) - overlap - 1, lit(0)),
          lit(stride))).as("start_tok"))
      .select(col("doc_id"),
        (col("start_tok") / stride).cast(LongType).as("chunk_idx"),
        col("start_tok").cast(LongType).as("start_tok"),
        least(lit(chunkTokens), col("n") - col("start_tok")).cast(LongType).as("n_tok"),
        md5(array_join(slice(col("tk"), col("start_tok") + 1, lit(chunkTokens)), " ")
          .cast(BinaryType)).as("chunk_fp"))
  }

  /** DuckDB mirror of [[ragChunks]]. */
  def ragChunksSql(table: String, chunkTokens: Int = 64, overlap: Int = 16): String = {
    val stride = chunkTokens - overlap
    s"""SELECT doc_id, CAST(start_tok // $stride AS BIGINT) AS chunk_idx,
       |  CAST(start_tok AS BIGINT) AS start_tok,
       |  CAST(LEAST($chunkTokens, n - start_tok) AS BIGINT) AS n_tok,
       |  md5(array_to_string(list_slice(tk, start_tok + 1, start_tok + $chunkTokens), ' ')) AS chunk_fp
       |FROM (
       |  SELECT doc_id, tk, len(tk) AS n,
       |    unnest(range(0, GREATEST(len(tk) - $overlap, 1), $stride)) AS start_tok
       |  FROM (SELECT doc_id, ${TextOps.tokensSql("text")} AS tk FROM $table))
       |ORDER BY doc_id, chunk_idx""".stripMargin
  }
}
