package graft.core

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Deterministic re-expression of the reference's automated data
  * exploration loop (/root/reference/src/pd_explain/llm_integrations/
  * automated_data_exploration/automated_data_exploration.py:137-338):
  * enumerate candidate follow-up queries, score each by the
  * interestingness of its result (FEDEx deviation for filters/joins,
  * group-exceptionality for groupbys — no LLM), apply the best ones,
  * and record the history the reference renders as a notebook.
  *
  * Reference semantics mirrored:
  *  - every candidate applies to the ORIGINAL frame, not the previous
  *    step's result (the reference's `_apply` always evaluates against
  *    result_mapping[0] — automated_data_exploration.py:332-338)
  *  - the step mix spans filter AND groupby queries (the reference's
  *    output-format prompt enumerates exactly those two forms); join
  *    steps are offered when auxiliary frames are provided (the
  *    pandas `merge` surface)
  *  - `save`/`load` persist the exploration report for later follow-up
  *    (explainable_data_frame.py:211 save_data_exploration /
  *    visualize_from_saved_data_exploration) — JSON here instead of
  *    dill, same attribute set (source name, history, final report)
  *  - `resume` continues a loaded exploration without repeating
  *    executed queries (the reference's history-aware iteration)
  *  - `followUp` seeds a new exploration from an explanation's textual
  *    description (explainable_data_frame.py:262
  *    follow_up_with_automated_data_exploration)
  *
  * Scale: scoring collects only top-1 explanation rows per candidate
  * (KB-sized); candidate pools are capped; no step materializes data.
  */
object AutoExplore {

  final case class Step(iteration: Int, kind: String, query: String,
                        score: Double, topExplanation: String)

  final case class Exploration(sourceName: String, steps: Seq[Step], finalReport: String) {
    def executedQueries: Set[String] = steps.map(_.query).toSet
  }

  /** One scored candidate: `kind` ∈ filter|groupby|join, `display` is
    * the reproducible query string recorded in the history, `frame`
    * the applied result (built from typed fields, never re-parsed). */
  private final case class Cand(kind: String, display: String, frame: ExplainFrame)

  private def candidatePool(ef: ExplainFrame, aux: Map[String, ExplainFrame],
                            maxAttrs: Int): Seq[Cand] = {
    val filters = QueryRecommender.structuredCandidates(ef, maxAttrs)
      .map(c => Cand("filter", c.display, c.frame))
    val skip = Seq("key", "_id", "date", "comment", "name", "phone", "address")
    val gcols = ef.df.schema.fields.filter(_.dataType == StringType)
      .map(_.name).filterNot(n => skip.exists(n.endsWith)).take(2)
    val ncols = ef.df.schema.fields.filter(_.dataType.isInstanceOf[NumericType])
      .map(_.name).filterNot(n => n.endsWith("key") || n.endsWith("_id")).take(2)
    val groupbys = for (g <- gcols; n <- ncols)
      yield Cand("groupby", s"groupby($g).mean($n)", ef.groupBy(g).mean(n))
    val joins = aux.toSeq.sortBy(_._1).flatMap { case (name, other) =>
      val on = ef.df.columns.toSeq.intersect(other.df.columns.toSeq)
      if (on.isEmpty) None
      else Some(Cand("join", s"join($name, on=${on.mkString(",")})", ef.join(other, on)))
    }
    filters ++ groupbys ++ joins
  }

  /** Interestingness of a candidate's result: top-1 FEDEx kl_score
    * (filter/join provenance) or top-1 group exceptionality zdev
    * (groupby provenance), plus that row's textual explanation. */
  private def scoreOf(c: Cand): (Double, String) = {
    val top = c.frame.explainFedex(topK = 1).collect()
    if (top.isEmpty) (0.0, "(no explanation)")
    else {
      val row = top.head
      val idx = row.schema.fieldNames.indexOf(if (c.kind == "groupby") "zdev" else "kl_score")
      (row.getDouble(idx), c.frame.explanationText(row))
    }
  }

  /** Run `iterations` exploration steps over the frame; `aux` offers
    * named frames as join candidates. Returns the full exploration
    * report (deterministic: candidates are re-ranked each call and
    * ties break on the query string). */
  def explore(ef: ExplainFrame, iterations: Int = 3,
              aux: Map[String, ExplainFrame] = Map.empty,
              maxAttrs: Int = 4): Exploration =
    continue(ef, iterations, aux, maxAttrs, Nil, ef.name)

  /** Continue a (possibly loaded) exploration: executed queries are
    * never repeated, iteration numbers continue from the history. */
  def resume(saved: Exploration, ef: ExplainFrame, iterations: Int,
             aux: Map[String, ExplainFrame] = Map.empty,
             maxAttrs: Int = 4): Exploration =
    continue(ef, iterations, aux, maxAttrs, saved.steps, saved.sourceName)

  private def continue(ef: ExplainFrame, iterations: Int,
                       aux: Map[String, ExplainFrame], maxAttrs: Int,
                       prior: Seq[Step], sourceName: String): Exploration = {
    val used = scala.collection.mutable.Set[String](prior.map(_.query): _*)
    // one scored ranking serves the whole walk: with root-based
    // application (reference semantics) the pool does not change
    // between iterations, only the used-set does
    val ranked = candidatePool(ef, aux, maxAttrs)
      .map { c => val (s, t) = scoreOf(c); (c, s, t) }
      .sortBy { case (c, s, _) => (-s, c.display) }
    var i = prior.size
    val steps = Seq.newBuilder[Step]
    steps ++= prior
    ranked.iterator.filterNot { case (c, _, _) => used.contains(c.display) }
      .take(iterations).foreach { case (c, s, t) =>
        i += 1
        used += c.display
        steps += Step(i, c.kind, c.display, s, t)
      }
    val all = steps.result()
    Exploration(sourceName, all, report(sourceName, all))
  }

  /** Follow up on an explanation (reference
    * follow_up_with_automated_data_exploration): a fresh exploration
    * whose report is seeded with the explanation's description. */
  def followUp(ef: ExplainFrame, description: String, iterations: Int = 3,
               aux: Map[String, ExplainFrame] = Map.empty): Exploration = {
    val e = explore(ef, iterations, aux)
    e.copy(finalReport = s"Follow-up on: $description\n${e.finalReport}")
  }

  private def report(sourceName: String, steps: Seq[Step]): String = {
    if (steps.isEmpty) return s"Exploration of '$sourceName': no interesting queries found."
    val best = steps.maxBy(s => (s.score, s.query))
    s"Exploration of '$sourceName': ${steps.size} queries executed " +
      s"(${steps.count(_.kind == "filter")} filter, " +
      s"${steps.count(_.kind == "groupby")} groupby, " +
      s"${steps.count(_.kind == "join")} join). " +
      s"Most interesting: ${best.query} (score ${best.score}). ${best.topExplanation}"
  }

  // ------------------------------------------------------ save / load ----

  private val mapper = new ObjectMapper()

  /** Serialize an exploration to JSON at `path` (the reference's
    * save_data_exploration, minus the notebook widgets). */
  def save(e: Exploration, path: String): Unit = {
    val root = mapper.createObjectNode()
    root.put("source_name", e.sourceName)
    root.put("final_report", e.finalReport)
    val arr = root.putArray("steps")
    e.steps.foreach { s =>
      val o = arr.addObject()
      o.put("iteration", s.iteration); o.put("kind", s.kind)
      o.put("query", s.query); o.put("score", s.score)
      o.put("top_explanation", s.topExplanation)
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root))
  }

  /** Load a saved exploration (visualize_from_saved_data_exploration's
    * deserialization half; rendering is the caller's concern). */
  def load(path: String): Exploration = {
    val root = mapper.readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
    val steps = (0 until root.get("steps").size()).map { i =>
      val o = root.get("steps").get(i)
      Step(o.get("iteration").asInt(), o.get("kind").asText(),
        o.get("query").asText(), o.get("score").asDouble(),
        o.get("top_explanation").asText())
    }
    Exploration(root.get("source_name").asText(), steps, root.get("final_report").asText())
  }
}
