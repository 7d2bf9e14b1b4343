package graft.core

import graft.explain.Fedex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** Deterministic re-expression of the reference's experimental query
  * recommender (/root/reference/src/pd_explain/experimental/
  * query_recommenders/): candidate follow-up queries are scored by the
  * interestingness (FEDEx deviation) of their result vs the source, and
  * the log keeps (query, score) rows for ranking — the reference's
  * `score_queries` loop without the LLM candidate generator.
  */
object QueryRecommender {

  /** A structured candidate query: consumers apply `frame` or rebuild the
    * predicate from (attr, op, threshold) — never by parsing `display`
    * (attribute names with spaces / format drift would break a string
    * round-trip). */
  final case class Candidate(attr: String, op: String, threshold: Double, frame: ExplainFrame) {
    def display: String = s"$attr $op $threshold"
  }

  /** Candidate filters: for each numeric attribute, `attr >= median` and
    * `attr < median` (the classic EDA drill-down candidates). */
  def structuredCandidates(ef: ExplainFrame, maxAttrs: Int = 4): Seq[Candidate] = {
    val nums = ef.df.schema.fields
      .filter(_.dataType.isInstanceOf[NumericType])
      .filterNot(f => f.name.endsWith("key") || f.name.endsWith("_id"))
      .take(maxAttrs)
    val medRow = ef.df.agg(
      nums.map(f => percentile(col(f.name), lit(0.5)).as(f.name)).toSeq.head,
      nums.map(f => percentile(col(f.name), lit(0.5)).as(f.name)).toSeq.tail: _*).head()
    nums.zipWithIndex.flatMap { case (f, i) =>
      val m = medRow.getDouble(i)
      Seq(
        Candidate(f.name, ">=", m, ef.filter(col(f.name) >= m)),
        Candidate(f.name, "<", m, ef.filter(col(f.name) < m)))
    }.toSeq
  }

  def candidates(ef: ExplainFrame, maxAttrs: Int = 4): Seq[(String, ExplainFrame)] =
    structuredCandidates(ef, maxAttrs).map(c => c.display -> c.frame)

  /** Score one executed candidate: max per-attribute KL deviation of its
    * result vs source (the reference scores logged queries from the
    * fedex explainer's score vector). */
  def score(ef: ExplainFrame): Double = {
    val scores = ef.explainFedex(topK = 1).select("kl_score").collect()
    if (scores.isEmpty) 0.0 else scores.head.getDouble(0)
  }

  /** Rank candidate follow-up queries by interestingness (structured). */
  def recommendCandidates(ef: ExplainFrame, topK: Int = 3): Seq[(Candidate, Double)] =
    structuredCandidates(ef)
      .map(c => c -> score(c.frame))
      .sortBy { case (c, s) => (-s, c.display) }
      .take(topK)

  /** Rank candidate follow-up queries by interestingness. */
  def recommend(ef: ExplainFrame, topK: Int = 3): Seq[(String, Double)] =
    recommendCandidates(ef, topK).map { case (c, s) => c.display -> s }
}

/** Session-local query log (reference: query_logger.py — stores executed
  * queries + interestingness scores for later recommendation). */
final class QueryLog {
  private val entries = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double)]
  def log(dataframeName: String, query: String, score: Double): Unit =
    entries.synchronized { entries += ((dataframeName, query, score)) }
  def top(k: Int): Seq[(String, String, Double)] =
    entries.synchronized { entries.sortBy { case (d, q, s) => (-s, d, q) }.take(k).toSeq }
  def size: Int = entries.synchronized(entries.size)
}
