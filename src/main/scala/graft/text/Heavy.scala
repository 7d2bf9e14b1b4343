package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.MisraGriesAgg
import graft.util.D

/** Exact heavy hitters over the corpus token stream via the classic
  * two-pass sketch-then-recount plan: (1) one scan builds a bounded
  * Misra-Gries summary — per-partition state ≤ cap entries, map-side
  * combined, the token universe never shuffled — whose candidate set
  * provably contains every token with frequency > N/(cap+1);
  * (2) a second scan re-counts ONLY the ≤ cap candidate tokens
  * (broadcast semi-reduction) and filters on the exact threshold
  * cnt·cap > N. The output is therefore exact and deterministic even
  * though the intermediate sketch is partitioning-dependent —
  * contrast `q_vocab_build`, which pays a full term-universe shuffle
  * to rank everything.
  *
  * Reference scope: pd_explain's value_counts/nlargest surface answers
  * "what dominates this column" on pandas scale; this is the bounded-
  * memory form of that question at corpus scale.
  */
object Heavy {

  /** Tokens with exact count > N/cap, with exact counts and parts-per-
    * million share. Columns: token, cnt, share_ppm. */
  def heavyHitters(docs: DataFrame, cap: Int): DataFrame = {
    require(cap >= 1, s"heavyHitters: cap must be >= 1, got $cap")
    val toks = docs.select(explode(TextOps.tokens(col("text"))).as("token"))
    // pass 1: bounded sketch + exact total in ONE aggregation
    val sketch = toks.agg(
      MisraGriesAgg.mgCandidates(col("token"), cap).as("cand"),
      count(lit(1)).as("n"))
    val cand = sketch.select(explode(col("cand")).as("token"), col("n"))
    // pass 2: exact recount of <= cap candidates; threshold in exact
    // integer arithmetic (cnt*cap > N <=> share > 1/cap)
    toks.join(broadcast(cand), "token")
      .groupBy("token", "n")
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * lit(cap.toLong) > col("n"))
      .select(col("token"), col("cnt"),
        D.r(col("cnt").cast(DoubleType) * lit(1e6) / col("n").cast(DoubleType), 2)
          .as("share_ppm"))
      .orderBy(col("cnt").desc, col("token"))
  }

  /** DuckDB mirror of [[heavyHitters]] — the oracle states the exact
    * semantics directly (GROUP BY + HAVING over the full term set);
    * the Spark plan reaches the same rows through the bounded sketch. */
  def heavyHittersSql(table: String, cap: Int): String =
    s"""WITH toks AS (SELECT unnest(${TextOps.tokensSql("text")}) AS token FROM $table),
       |tot AS (SELECT COUNT(*) AS n FROM toks)
       |SELECT token, COUNT(*) AS cnt,
       |  ROUND(CAST(COUNT(*) AS DOUBLE) * 1000000.0 / CAST(ANY_VALUE(n) AS DOUBLE), 2) AS share_ppm
       |FROM toks, tot
       |GROUP BY token HAVING COUNT(*) * $cap > ANY_VALUE(n)
       |ORDER BY cnt DESC, token""".stripMargin
}
