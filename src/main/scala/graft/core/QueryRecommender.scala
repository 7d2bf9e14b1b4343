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

  /** Unified query score (reference query_score_functions.score_queries):
    * geometric mean of the top-4 measure scores; when any score exceeds
    * 1, each is first squashed by x → log10(1+x)/(1+log10(1+max)). */
  def unifiedScore(scores: Seq[Double]): Double = {
    val top = scores.sorted(Ordering[Double].reverse).take(4)
    if (top.isEmpty) return 0.0
    val xs =
      if (!top.exists(_ > 1)) top
      else {
        val mx = math.log10(1 + top.max)
        top.map(x => math.log10(1 + x) / (1 + mx))
      }
    math.pow(xs.product, 1.0 / xs.size)
  }

  /** Unified interestingness of an executed query: [[unifiedScore]] over
    * its explanation's top-4 scores (kl_score for filter/join
    * provenance, zdev for groupby — the reference scores from the fedex
    * explainer's measure vector). */
  def scoreUnified(ef: ExplainFrame): Double = {
    val top = ef.explainFedex(topK = 4).collect()
    if (top.isEmpty) 0.0
    else {
      val scoreCol = if (top.head.schema.fieldNames.contains("zdev")) "zdev" else "kl_score"
      unifiedScore(top.map(r => r.getDouble(r.fieldIndex(scoreCol))).toSeq)
    }
  }

  /** Re-score structured queries from a [[QueryLog]] against a frame
    * (the reference's recommender scores arbitrary LOGGED queries, not
    * just freshly generated candidates — query_logger.py get_log +
    * llm_based_query_recommender.py recommend): each logged query for
    * `ef.name` is re-applied and re-scored with [[scoreUnified]], and
    * the ranking is returned newest-score-first (display tie-break).
    * Logged queries referencing columns the frame no longer has are
    * skipped — the log may span schema versions.
    *
    * `aux` resolves the RIGHT side of logged merges by frame name (the
    * reference's query_logger logs merges too; re-scoring one needs the
    * other frame, exactly like AutoExplore's aux registry). A logged
    * join whose right frame isn't in `aux`, or whose key column is
    * missing on either side, is skipped like a dropped column. */
  def recommendFromLog(log: QueryLog, ef: ExplainFrame, topK: Int = 3,
                       aux: Map[String, ExplainFrame] = Map.empty): Seq[(LoggedQuery, Double)] = {
    val cols = ef.df.columns.toSet
    def applicable(q: LoggedQuery): Boolean = q.kind match {
      case "join" => cols.contains(q.attr) &&
        aux.get(q.arg).exists(_.df.columns.contains(q.attr))
      case "groupby" => cols.contains(q.attr) && cols.contains(q.arg)
      case _ => cols.contains(q.attr)
    }
    log.structuredFor(ef.name)
      .filter(applicable)
      .distinct
      .map(q => q -> scoreUnified(q.applyTo(ef, aux)))
      .sortBy { case (q, s) => (-s, q.display) }
      .take(topK)
  }
}

/** A structured logged query: enough typed fields to re-apply it to a
  * frame later — never re-parsed from its display string.
  *  - kind='filter':  `attr` `op`(>=|<) `arg`(threshold literal)
  *  - kind='groupby': groupby(`attr`).`op`(agg fn)(`arg`(agg column))
  *  - kind='join':    merge on key `attr`, `op`(how: inner|left|right|
  *    outer), `arg`(right frame NAME — resolved against the caller's
  *    aux registry at re-apply time, mirroring the reference's merge
  *    logging, which records the partner dataframe by name) */
final case class LoggedQuery(dataframeName: String, kind: String,
                             attr: String, op: String, arg: String) {
  def display: String = kind match {
    case "groupby" => s"groupby($attr).$op($arg)"
    case "join" => s"merge($arg, on=$attr, how=$op)"
    case _ => s"$attr $op $arg"
  }
  def applyTo(ef: ExplainFrame,
              aux: Map[String, ExplainFrame] = Map.empty): ExplainFrame = kind match {
    case "filter" =>
      val th = arg.toDouble
      if (op == ">=") ef.filter(org.apache.spark.sql.functions.col(attr) >= th)
      else ef.filter(org.apache.spark.sql.functions.col(attr) < th)
    case "groupby" => op match {
      case "mean" => ef.groupBy(attr).mean(arg)
      case "sum" => ef.groupBy(attr).sum(arg)
      case "count" => ef.groupBy(attr).count()
      case other => throw new IllegalArgumentException(s"Unsupported logged agg: $other")
    }
    case "join" =>
      val other = aux.getOrElse(arg, throw new IllegalArgumentException(
        s"Logged join references unknown frame '$arg' — pass it in aux"))
      ef.join(other, Seq(attr), op)
    case other => throw new IllegalArgumentException(s"Unsupported logged kind: $other")
  }
}

/** Query log (reference: query_logger.py — stores executed queries +
  * interestingness scores for later recommendation). Structured entries
  * carry typed re-application fields so [[QueryRecommender.recommendFromLog]]
  * can re-score them against a frame; `save`/`load` persist the log as
  * the reference's CSV (dataframe_name,kind,attr,op,arg,score). */
final class QueryLog {
  private val entries = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double)]
  private val structured = scala.collection.mutable.ArrayBuffer.empty[(LoggedQuery, Double)]

  def log(dataframeName: String, query: String, score: Double): Unit =
    entries.synchronized { entries += ((dataframeName, query, score)) }

  /** Log a structured, re-applicable query (also visible to [[top]]). */
  def logStructured(q: LoggedQuery, score: Double): Unit = {
    structured.synchronized { structured += ((q, score)) }
    log(q.dataframeName, q.display, score)
  }

  def top(k: Int): Seq[(String, String, Double)] =
    entries.synchronized { entries.sortBy { case (d, q, s) => (-s, d, q) }.take(k).toSeq }
  def size: Int = entries.synchronized(entries.size)

  /** Structured entries for one frame, in log order. */
  def structuredFor(dataframeName: String): Seq[LoggedQuery] =
    structured.synchronized {
      structured.collect { case (q, _) if q.dataframeName == dataframeName => q }.toSeq
    }

  /** Persist the structured log as CSV (fields are simple identifiers /
    * numeric literals by construction — no quoting needed; a comma in a
    * field is rejected rather than silently corrupting the file). */
  def save(path: String): Unit = {
    val rows = structured.synchronized { structured.toSeq }
    val lines = "dataframe_name,kind,attr,op,arg,score" +: rows.map { case (q, s) =>
      val fs = Seq(q.dataframeName, q.kind, q.attr, q.op, q.arg)
      require(fs.forall(f => !f.contains(",") && !f.contains("\n")),
        s"unserializable logged query field in: ${q.display}")
      (fs :+ s.toString).mkString(",")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), lines.mkString("\n"))
  }
}

object QueryLog {
  def load(path: String): QueryLog = {
    val log = new QueryLog
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
    lines.stream().skip(1).forEach { line =>
      val f = line.split(",", -1)
      require(f.length == 6, s"malformed query-log line: $line")
      log.logStructured(LoggedQuery(f(0), f(1), f(2), f(3), f(4)), f(5).toDouble)
    }
    log
  }
}
