package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus keyword retrieval: BM25 scoring (Robertson et al., the Okapi
  * formulation Lucene defaults to) for a fixed query-term set — the
  * quality-scoring / retrieval primitive pipelines use for targeted
  * corpus slicing (e.g. "pull the top-k docs about X for inspection"
  * or keyword-based domain tagging).
  *
  * Scale (100 TB): the corpus is touched by exactly two linear scans —
  * one map-side-combined aggregate for (N, avgdl), one tokenize +
  * explode whose output is filtered to the query terms BEFORE its
  * only shuffle (the per-(doc, term) count), so shuffled bytes are
  * proportional to query-term occurrences, not corpus size. The df and
  * corpus-stats tables are term-cardinality-sized broadcasts. The
  * final top-k is TakeOrderedAndProject (per-partition heaps + a k-row
  * driver merge), never a global sort.
  */
object Search {

  /** Per-term idf, rounded to 6 decimals before use: Math.log and
    * libm's log may legitimately disagree by 1 ulp, so the UNROUNDED
    * idf is not cross-engine stable; rounding first makes every
    * downstream product start from identical operands. Lucene form:
    * ln(1 + (N - df + 0.5)/(df + 0.5)). */
  private def idf6(n: org.apache.spark.sql.Column, df0: org.apache.spark.sql.Column) =
    graft.util.D.r(log(lit(1.0) +
      (n.cast(DoubleType) - df0 + 0.5) / (df0.cast(DoubleType) + 0.5)), 6)

  /** BM25 top-k: (rank, doc_id, dl, n_terms_hit, score) for the `k`
    * highest-scoring documents against `terms`. k1/b are the standard
    * saturation/length-normalization knobs. Per-term partial scores
    * are rounded to 6 decimals and summed as DECIMAL so the per-doc
    * total is order-independent (double addition is not associative;
    * Spark's partial aggregation and DuckDB's single-threaded sum
    * would otherwise disagree). Ties break toward the smaller doc_id. */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75, k: Int = 10): DataFrame = {
    require(terms.nonEmpty && terms.forall(t => t.nonEmpty && !t.contains("'")),
      "bm25: terms must be non-empty and quote-free")
    val toks = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
      .select(col("doc_id"), size(col("w")).cast(LongType).as("dl"),
        explode(col("w")).as("tok"))
    val hits = toks.filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "dl", "tok")
      .agg(count(lit(1)).cast(LongType).as("tf"))
    // avgdl from an exact long sum (a double avg would sum in
    // partition order — not cross-engine-stable)
    val stats = docs.agg(
      count(lit(1)).cast(LongType).as("n_docs"),
      (sum(size(TextOps.tokens(col("text"))).cast(LongType)).cast(DoubleType) /
        count(lit(1)).cast(DoubleType)).as("avgdl"))
    // no-op tf >= 1 keeps this subtree identical to `hits` (see
    // tfidfTerms) so the term-df table reuses hits' exchange instead
    // of re-scanning the corpus
    val dfs = hits.filter(col("tf") >= 1L)
      .groupBy("tok").agg(count(lit(1)).cast(LongType).as("df"))
    val scored = hits
      .join(broadcast(dfs), "tok")
      .crossJoin(broadcast(stats))
      .withColumn("part", graft.util.D.r(
        idf6(col("n_docs"), col("df")) *
          (col("tf").cast(DoubleType) * (k1 + 1.0)) /
          (col("tf").cast(DoubleType) +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast(DoubleType) / col("avgdl"))), 6))
      .groupBy("doc_id", "dl")
      .agg(count(lit(1)).cast(LongType).as("n_terms_hit"),
        graft.util.D.dsumd(col("part")).as("score"))
    val top = scored.orderBy(col("score").desc, col("doc_id")).limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
          .cast(LongType))
      .select("rank", "doc_id", "dl", "n_terms_hit", "score")
      .orderBy("rank")
  }

  /** Per-document top-k keyword extraction by tf-idf: for every
    * document, the `k` tokens with the highest tf·idf (classic
    * idf = ln(N/df), rounded to 6 decimals before the product — same
    * cross-engine contract as [[bm25]]'s idf6). Ties break toward the
    * lexicographically smaller token. Returns
    * (doc_id, term_rank, term, tf, df, score) ordered by doc.
    *
    * Scale (100 TB): one tokenize + explode into the per-(doc, term)
    * count (the only corpus-sized shuffle — map-side combined); df is
    * an aggregation OF that table (term-cardinality rows, not corpus
    * rows) and its join back is left for AQE to pick broadcast vs
    * shuffle; the per-doc top-k is a doc_id-partitioned window that
    * WindowGroupLimit cuts to k rows per group before the sort. */
  def tfidfTerms(docs: DataFrame, k: Int = 3): DataFrame =
    tfidfImpl(docs, explode(TextOps.tokens(col("text"))), k)

  /** Keyphrase extraction: [[tfidfTerms]] over word n-grams instead of
    * unigrams (the standard first cut at phrase-level indexing) — the
    * native [[graft.functions.WordNgrams]] emits contiguous-substring
    * n-grams in whole-stage codegen, and the tf/df/top-k plan is
    * byte-identical to the unigram form (same single corpus shuffle,
    * same exchange-reused df subtree, same WindowGroupLimit cut). */
  def tfidfNgrams(docs: DataFrame, n: Int = 2, k: Int = 3): DataFrame =
    tfidfImpl(docs, explode(graft.functions.WordNgrams(col("text"), n)), k)

  private def tfidfImpl(docs: DataFrame, termExpr: org.apache.spark.sql.Column,
      k: Int): DataFrame = {
    require(k > 0, "tfidfTerms: k must be positive")
    val tf = docs
      .select(col("doc_id"), termExpr.as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).cast(LongType).as("tf"))
    // the no-op tf >= 1 filter keeps the df subtree REFERENCING tf, so
    // column pruning cannot specialize it into a second (tf-less)
    // corpus aggregation — both sides share one scan+shuffle via
    // runtime exchange reuse (same identical-subtree rule as the
    // explainer stats tables; ScaleSpec pins it)
    val dfs = tf.filter(col("tf") >= 1L)
      .groupBy("term").agg(count(lit(1)).cast(LongType).as("df"))
    val n = docs.agg(count(lit(1)).cast(LongType).as("n_docs"))
    tf.join(dfs, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score", graft.util.D.r(
        col("tf").cast(DoubleType) *
          graft.util.D.r(log(col("n_docs").cast(DoubleType) / col("df").cast(DoubleType)), 6), 6))
      .withColumn("term_rank",
        row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("score").desc, col("term"))).cast(LongType))
      .filter(col("term_rank") <= k)
      .select("doc_id", "term_rank", "term", "tf", "df", "score")
      .orderBy("doc_id", "term_rank")
  }

  /** DuckDB mirror of [[tfidfNgrams]]. */
  def tfidfNgramsSql(table: String, n: Int = 2, k: Int = 3): String = {
    val w = TextOps.tokensSql("text")
    val grams = s"list_transform(range(1, len($w) - $n + 2), i -> array_to_string($w[i : i + ${n - 1}], ' '))"
    tfidfSqlFrom(table, grams, k)
  }

  /** DuckDB mirror of [[tfidfTerms]]. */
  def tfidfTermsSql(table: String, k: Int = 3): String =
    tfidfSqlFrom(table, TextOps.tokensSql("text"), k)

  private def tfidfSqlFrom(table: String, termsExpr: String, k: Int): String = {
    val toks = termsExpr
    s"""WITH tf AS (
       |  SELECT doc_id, tok AS term, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest($toks) AS tok FROM $table)
       |  GROUP BY doc_id, tok),
       |dfs AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM $table),
       |ranked AS (
       |  SELECT tf.doc_id, tf.term, tf.tf, dfs.df,
       |    ROUND(CAST(tf.tf AS DOUBLE)
       |      * ROUND(LN(CAST(n.n_docs AS DOUBLE) / CAST(dfs.df AS DOUBLE)), 6), 6) AS score,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY tf.doc_id
       |      ORDER BY ROUND(CAST(tf.tf AS DOUBLE)
       |        * ROUND(LN(CAST(n.n_docs AS DOUBLE) / CAST(dfs.df AS DOUBLE)), 6), 6) DESC,
       |      tf.term) AS BIGINT) AS term_rank
       |  FROM tf JOIN dfs ON tf.term = dfs.term CROSS JOIN n)
       |SELECT doc_id, term_rank, term, tf, df, score
       |FROM ranked WHERE term_rank <= $k ORDER BY doc_id, term_rank""".stripMargin
  }

  /** DuckDB mirror of [[bm25]]. */
  def bm25Sql(table: String, terms: Seq[String], k1: Double = 1.2,
              b: Double = 0.75, k: Int = 10): String = {
    val toks = TextOps.tokensSql("text")
    val termList = terms.map(t => s"'$t'").mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, CAST(len($toks) AS BIGINT) AS dl, unnest($toks) AS tok
       |  FROM $table),
       |hits AS (
       |  SELECT doc_id, dl, tok, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM toks WHERE tok IN ($termList) GROUP BY doc_id, dl, tok),
       |stats AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(CAST(len($toks) AS BIGINT)) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE) AS avgdl
       |  FROM $table),
       |dfs AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM hits GROUP BY tok),
       |scored AS (
       |  SELECT h.doc_id, h.dl,
       |    ROUND(ROUND(LN(1.0 + (CAST(s.n_docs AS DOUBLE) - d.df + 0.5) / (CAST(d.df AS DOUBLE) + 0.5)), 6)
       |      * (CAST(h.tf AS DOUBLE) * ($k1 + 1.0))
       |      / (CAST(h.tf AS DOUBLE) + $k1 * (1.0 - $b + $b * CAST(h.dl AS DOUBLE) / s.avgdl)), 6) AS part
       |  FROM hits h JOIN dfs d ON h.tok = d.tok CROSS JOIN stats s),
       |agg AS (
       |  SELECT doc_id, dl, CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
       |    CAST(CAST(SUM(CAST(part AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE) AS score
       |  FROM scored GROUP BY doc_id, dl)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
       |  doc_id, dl, n_terms_hit, score
       |FROM agg ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }
  /** PMI collocation mining (Church & Hanks 1990 — the corpus-analysis
    * step behind phrase detection and word2vec-style preprocessing):
    * the k document-level token co-occurrence pairs with the highest
    * pointwise mutual information, PMI = ln(P(a,b) / (P(a)·P(b))) over
    * document presence, with a `minCount` co-occurrence floor so rare
    * coincidences don't dominate the ranking (the standard correction).
    *
    * Per-document token set = the first `maxTokens` of the SORTED
    * distinct tokens — a deterministic cap (lexicographic, identical in
    * both engines) that bounds the per-doc pair fanout at
    * maxTokens·(maxTokens−1)/2 regardless of document length; the
    * marginals count from the SAME capped set, so PMI stays internally
    * consistent. Scale: one scan-local capped-distinct projection, one
    * doc_id-keyed self-join whose per-key block is ≤ maxTokens rows
    * (bounded — never a corpus×corpus), two map-side-combined count
    * aggregations, marginal joins on token-cardinality tables, and a
    * TakeOrderedAndProject top-k — no global sort. */
  def pmiPairs(docs: DataFrame, maxTokens: Int = 64, minCount: Long = 5,
      k: Int = 100): DataFrame = {
    val toks = slice(array_sort(array_distinct(TextOps.tokens(col("text")))), 1, maxTokens)
    val dt = docs.select(col("doc_id"), explode(toks).as("tok"))
    val nd = docs.agg(count(lit(1)).cast(LongType).as("n_docs"))
    val ca = dt.groupBy("tok").agg(count(lit(1)).cast(LongType).as("cnt"))
    // frequent-token prefilter BEFORE pairing: a pair can only reach
    // cnt_ab >= minCount if BOTH tokens have df >= minCount, so
    // dropping rarer tokens first changes nothing in the output while
    // pruning the singleton tail that dominates a diverse corpus —
    // without it the pair GROUP BY's cardinality is the raw pair count
    // (measured: the un-prefiltered oracle exhausts memory on the 10×
    // perturbed-vocabulary corpus; marginals still come from the FULL
    // capped set, computed before the filter)
    val dtk = dt.join(ca.filter(col("cnt") >= minCount).select("tok"), "tok")
    val pairs = dtk.select(col("doc_id"), col("tok").as("tok_a"))
      .join(dtk.select(col("doc_id"), col("tok").as("tok_b")), "doc_id")
      .filter(col("tok_a") < col("tok_b"))
      .groupBy("tok_a", "tok_b").agg(count(lit(1)).cast(LongType).as("cnt_ab"))
      .filter(col("cnt_ab") >= minCount)
    pairs
      .join(ca.select(col("tok").as("tok_a"), col("cnt").as("cnt_a")), "tok_a")
      .join(ca.select(col("tok").as("tok_b"), col("cnt").as("cnt_b")), "tok_b")
      .crossJoin(broadcast(nd))
      .withColumn("pmi", graft.util.D.r(
        log(col("cnt_ab").cast(DoubleType) * col("n_docs") /
          (col("cnt_a") * col("cnt_b")).cast(DoubleType)), 6))
      .orderBy(col("pmi").desc, col("tok_a"), col("tok_b"))
      .limit(k)
      .select("tok_a", "tok_b", "cnt_a", "cnt_b", "cnt_ab", "pmi")
  }

  /** DuckDB mirror of [[pmiPairs]]. */
  def pmiPairsSql(table: String, maxTokens: Int = 64, minCount: Long = 5,
      k: Int = 100): String = {
    val w = "string_split(text, ' ')"
    s"""WITH dt AS (SELECT doc_id, unnest(list_sort(list_distinct($w))[1 : $maxTokens]) AS tok
       |  FROM $table),
       |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM $table),
       |ca AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM dt GROUP BY 1),
       |dtk AS (SELECT dt.doc_id, dt.tok FROM dt
       |  JOIN (SELECT tok FROM ca WHERE cnt >= $minCount) f ON dt.tok = f.tok),
       |prs AS (SELECT a.tok AS tok_a, b.tok AS tok_b, CAST(COUNT(*) AS BIGINT) AS cnt_ab
       |  FROM dtk a JOIN dtk b ON a.doc_id = b.doc_id AND a.tok < b.tok
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $minCount)
       |SELECT tok_a, tok_b, ca.cnt AS cnt_a, cb.cnt AS cnt_b, cnt_ab,
       |  ROUND(LN(CAST(cnt_ab AS DOUBLE) * nd.n_docs
       |    / CAST(ca.cnt * cb.cnt AS DOUBLE)), 6) AS pmi
       |FROM prs JOIN ca ON prs.tok_a = ca.tok
       |JOIN ca cb ON prs.tok_b = cb.tok, nd
       |ORDER BY pmi DESC, tok_a, tok_b LIMIT $k""".stripMargin
  }
}
