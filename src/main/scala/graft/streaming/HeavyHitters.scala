package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

import graft.functions.MisraGriesAgg

/** Streaming heavy hitters — the live form of the batch
  * `q_heavy_hitters` ([[graft.text.Heavy]]) under the operationally
  * honest split: the batch query is the exact report a finished corpus
  * is graded by; this gate maintains a MERGEABLE Misra-Gries summary
  * incrementally as document micro-batches arrive, so "what tokens are
  * trending past 1/cap of the stream" is answerable DURING ingest
  * without ever storing the token universe.
  *
  * Per micro-batch cost (foreachBatch): ONE map-side-combined
  * aggregation scan of the batch — the same bounded-state
  * [[MisraGriesAgg]] kernel the batch query runs, evaluated WITH its
  * counters — then a driver-side merge of two ≤ cap-entry summaries
  * under the mergeable-summaries rule ([[MisraGriesAgg.mergeInto]],
  * Agarwal et al. 2012). State is ≤ cap (token, counter) pairs plus one
  * long, REGARDLESS of stream length; nothing replays the stream.
  *
  * Guarantee (the twin contract StreamingSpec pins, any batch split,
  * any arrival order): every token with true stream frequency
  * > n/(cap+1) is present in [[Gate.candidates]], and each counter
  * underestimates its token's true count by at most n/(cap+1). The
  * candidate SET below that threshold is split-dependent — exactly as
  * the batch sketch is partitioning-dependent — which is why the batch
  * form recounts exactly; [[Gate.finishExact]] is that same recount
  * run at reconciliation time: its output matches `q_heavy_hitters`
  * row-for-row because the streamed candidates are a guaranteed
  * superset of the exact heavy set over the same rows.
  */
object HeavyHitters {

  /** Default summary capacity — matches the batch query's cap so the
    * twin guarantee lines up with `q_heavy_hitters`' 1/64 threshold. */
  val DefaultCap: Int = 64

  /** One micro-batch's bounded summary: ≤ cap (token, counter) pairs +
    * the batch's total token count, from a single aggregation scan. */
  def batchSummary(docs: DataFrame, cap: Int = DefaultCap)
      : (java.util.HashMap[String, java.lang.Long], Long) = {
    val row = docs
      .select(explode(graft.text.TextOps.tokens(col("text"))).as("token"))
      .agg(MisraGriesAgg.mgSummary(col("token"), cap).as("s"), count(lit(1)).as("n"))
      .collect()(0)
    val m = new java.util.HashMap[String, java.lang.Long]()
    row.getSeq[org.apache.spark.sql.Row](0).foreach(r => m.put(r.getString(0), r.getLong(1)))
    (m, row.getLong(1))
  }

  /** Attachable gate: owns the running summary + token total and
    * advances them from foreachBatch. Thread-safe (Spark invokes
    * foreachBatch sequentially, but reporting may race a fold). */
  final class Gate(cap: Int = DefaultCap) {
    require(cap >= 1, s"HeavyHitters.Gate: cap must be >= 1, got $cap")
    private[this] val summary = new java.util.HashMap[String, java.lang.Long]()
    private[this] var n = 0L

    def processBatch(batch: DataFrame, batchId: Long): Unit = synchronized {
      val (delta, dn) = batchSummary(batch, cap)
      MisraGriesAgg.mergeInto(summary, delta, cap)
      n += dn
    }

    private[HeavyHitters] def restore(
        m: java.util.HashMap[String, java.lang.Long], total: Long): Unit = synchronized {
      summary.clear(); summary.putAll(m); n = total
    }

    /** Total tokens folded so far. */
    def total: Long = synchronized(n)

    /** Current candidate set with lower-bound counters, sorted by
      * token: (token, cnt_lower, n). Every token with true frequency
      * > n/(cap+1) is guaranteed present. */
    def candidates: Seq[(String, Long, Long)] = synchronized {
      val keys = new Array[String](summary.size())
      summary.keySet().toArray(keys)
      java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
      keys.toSeq.map(k => (k, summary.get(k).longValue(), n))
    }

    /** [[candidates]] as a DataFrame (token, cnt_lower, n_total). */
    def candidatesDf(spark: SparkSession): DataFrame = {
      import spark.implicits._
      candidates.toDF("token", "cnt_lower", "n_total")
    }

    /** Reconciliation finish: exact recount of the streamed candidates
      * over the full corpus — the batch query's second pass run against
      * the stream's first pass. `corpus` must hold the same rows the
      * stream delivered; output (token, cnt, share_ppm) then equals
      * `q_heavy_hitters` exactly. */
    def finishExact(corpus: DataFrame): DataFrame = {
      val spark = corpus.sparkSession
      import spark.implicits._
      // Candidate set and running total must be read under ONE lock:
      // a concurrent processBatch between two separate reads would pair
      // stale candidates with a newer n, breaking the superset guarantee.
      val (cand, nTotal) = synchronized {
        val keys = new Array[String](summary.size())
        summary.keySet().toArray(keys)
        (keys.toSeq, n)
      }
      val toks = corpus.select(explode(graft.text.TextOps.tokens(col("text"))).as("token"))
      toks.join(broadcast(cand.toDF("token")), "token")
        .groupBy("token")
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * lit(cap.toLong) > lit(nTotal))
        .select(col("token"), col("cnt"),
          graft.util.D.r(col("cnt").cast(DoubleType) * lit(1e6) / lit(nTotal.toDouble), 2)
            .as("share_ppm"))
        .orderBy(col("cnt").desc, col("token"))
    }

    /** Wire the gate to a streaming documents DataFrame. */
    def start(docs: DataFrame, queryName: String = "heavy_hitters_gate"): StreamingQuery =
      docs.writeStream
        .queryName(queryName)
        .foreachBatch((b: DataFrame, id: Long) => processBatch(b, id))
        .start()

    /** Persist the gate's entire state — ≤ cap (token, counter) lines +
      * the total — to one small text file, so a restarted driver
      * resumes the fold instead of replaying the stream ([[load]]).
      * Tokens are URL-escaped: any token (newlines, tabs, unicode)
      * round-trips. */
    def save(path: String): Unit = synchronized {
      val sb = new StringBuilder
      sb.append(cap).append('\t').append(n).append('\n')
      val it = summary.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        sb.append(java.net.URLEncoder.encode(e.getKey, "UTF-8"))
          .append('\t').append(e.getValue).append('\n')
      }
      val p = java.nio.file.Paths.get(path)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, sb.toString)
    }
  }

  /** Restore a [[Gate]] from [[Gate.save]] output. */
  def load(path: String): Gate = {
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
    require(!lines.isEmpty, s"HeavyHitters.load: empty state file $path")
    val head = lines.get(0).split('\t')
    val gate = new Gate(head(0).toInt)
    val m = new java.util.HashMap[String, java.lang.Long]()
    (1 until lines.size).foreach { i =>
      val Array(tok, cnt) = lines.get(i).split('\t')
      m.put(java.net.URLDecoder.decode(tok, "UTF-8"), cnt.toLong)
    }
    gate.restore(m, head(1).toLong)
    gate
  }
}
