package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Streaming exact deduplication for a document feed (the streaming form
  * of Dedup.exactGroups / SURVEY §2.3, batch reference:
  * /root/reference/src/pd_explain/core/explainable_data_frame.py
  * drop_duplicates surface).
  *
  * Scale design: state is keyed by the 128-bit content fingerprint, not
  * the document (bytes-per-key is constant), and
  * `dropDuplicatesWithinWatermark` EVICTS state once the watermark
  * passes — so state size is bounded by the duplicate-arrival horizon,
  * not the stream's lifetime. An unbounded `dropDuplicates` on a
  * 100 TB/day feed would grow state forever; within-watermark is the
  * only shape that survives.
  */
object StreamDedup {

  /** Input: streaming (ts TIMESTAMP, doc_id LONG, text STRING).
    * Output: first-arrival rows per content fingerprint, duplicates
    * within `horizon` suppressed. */
  def dedupStream(docs: DataFrame, horizon: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fingerprint", md5(col("text").cast(BinaryType)))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("fingerprint")
}
