package graft.core

import org.apache.spark.sql.functions._

/** Deterministic re-expression of the reference's automated data
  * exploration loop (/root/reference/src/pd_explain/llm_integrations/
  * automated_data_exploration/): iteratively pick the most interesting
  * candidate query (FEDEx-deviation-scored, no LLM), apply it, record the
  * top explanation, and drill further. Produces the exploration report
  * the reference renders as a notebook. */
object AutoExplore {

  final case class Step(iteration: Int, query: String, score: Double, topExplanation: String)

  def explore(ef: ExplainFrame, iterations: Int = 3): Seq[Step] = {
    var cur = ef
    var used = Set.empty[String]
    val steps = Seq.newBuilder[Step]
    var i = 1
    var continue = true
    while (i <= iterations && continue) {
      // structured candidates: the predicate is rebuilt from typed
      // (attr, op, threshold) fields, never parsed back out of a string
      val recs = QueryRecommender.recommendCandidates(cur, topK = 8)
        .filterNot { case (c, _) => used.contains(c.attr) }
      recs.headOption match {
        case None => continue = false
        case Some((c, score)) =>
          used += c.attr
          val next = c.op match {
            case ">=" => cur.filter(col(c.attr) >= c.threshold)
            case _    => cur.filter(col(c.attr) < c.threshold)
          }
          val expl = next.explainFedex(topK = 1).collect()
          val text = if (expl.isEmpty) "(no explanation)" else next.explanationText(expl.head)
          steps += Step(i, c.display, score, text)
          cur = next
          i += 1
      }
    }
    steps.result()
  }
}
