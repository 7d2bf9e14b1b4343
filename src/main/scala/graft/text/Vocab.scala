package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Tokenizer-training primitives: corpus vocabulary construction with
  * contiguous frequency-ranked ids, and the adjacent-pair count that
  * drives one BPE merge step (Sennrich et al. 2016) — the two
  * relational cores of training a tokenizer over a corpus before a
  * pretraining run.
  *
  * Scale (100 TB): both operators reduce the corpus with ONE
  * map-side-combined aggregation (token counts / pair counts); all
  * downstream work happens on the term- or pair-cardinality result.
  * Id assignment ranks the VOCAB table (≪ corpus) with the same
  * distributed ordered-rank shape as Corpus.seqPack — range
  * repartition + per-partition ranks + broadcast prefix offsets —
  * never a single-reducer global window; the BPE top-k is
  * TakeOrderedAndProject (per-partition heaps).
  */
object Vocab {

  /** Frequency-ranked vocabulary: (id, tok, c) for every token with
    * c >= minCount, ids contiguous from 0 in (c desc, tok asc) order —
    * the id table a word-level tokenizer ships. */
  def vocabBuild(docs: DataFrame, minCount: Long = 1L): DataFrame = {
    require(minCount >= 1, "vocabBuild: minCount must be >= 1")
    val counts = docs
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).cast(LongType).as("c"))
      .filter(col("c") >= minCount)
    // distributed ordered rank over the vocab table (same shape as
    // Corpus.seqPack): range-partition by the rank order, rank within
    // each partition, add broadcast prefix counts. localCheckpoint
    // pins ONE execution of the range exchange so spark_partition_id
    // is consistent across the offsets aggregate and the join.
    val parted = counts.repartitionByRange(col("c").desc, col("tok"))
      .withColumn("pid", spark_partition_id())
      .withColumn("local_rank",
        row_number().over(Window.partitionBy("pid")
          .orderBy(col("c").desc, col("tok"))).cast(LongType))
      .localCheckpoint(true)
    val offsets = parted.groupBy("pid").agg(max("local_rank").as("ptot"))
      .withColumn("offset", coalesce(
        sum("ptot").over(Window.orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "offset")
    parted.join(broadcast(offsets), Seq("pid"))
      .select((col("local_rank") + col("offset") - 1L).as("id"),
        col("tok"), col("c"))
      .orderBy("id")
  }

  /** DuckDB mirror of [[vocabBuild]]. */
  def vocabBuildSql(table: String, minCount: Long = 1L): String =
    s"""SELECT CAST(ROW_NUMBER() OVER (ORDER BY c DESC, tok) - 1 AS BIGINT) AS id,
       |  tok, c
       |FROM (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
       |      FROM (SELECT unnest(${TextOps.tokensSql("text")}) AS tok FROM $table)
       |      GROUP BY tok HAVING COUNT(*) >= $minCount)
       |ORDER BY id""".stripMargin

  /** One BPE-style merge-candidate scan: the `k` most frequent
    * ADJACENT token pairs in the corpus (rank, pair, n), ties toward
    * the lexicographically smaller pair — the argmax a BPE trainer
    * merges next (over words rather than bytes, the relational core
    * being identical). */
  def bpePairs(docs: DataFrame, k: Int = 20): DataFrame = {
    require(k > 0, "bpePairs: k must be positive")
    // native one-pass bigrams: the HOF form was pathological here —
    // InferFiltersFromGenerate copies explode's child into a pre-filter
    // with the projection inlined, so the interpreted transform (and
    // its per-element re-split) ran TWICE per document (measured 4.7 s
    // at sf0.1 vs 0.15 s native; parity with the HOF chain is pinned
    // in PipelineSpec's native-expression test)
    val pairs = docs
      .select(explode(graft.functions.WordNgrams(col("text"), 2)).as("pair"))
      .groupBy("pair").agg(count(lit(1)).cast(LongType).as("n"))
    val top = pairs.orderBy(col("n").desc, col("pair")).limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("pair")))
          .cast(LongType))
      .select("rank", "pair", "n")
      .orderBy("rank")
  }

  /** DuckDB mirror of [[bpePairs]]. */
  def bpePairsSql(table: String, k: Int = 20): String = {
    val w = TextOps.tokensSql("text")
    s"""SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, pair) AS BIGINT) AS rank,
       |  pair, n
       |FROM (SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
       |      FROM (SELECT unnest(list_transform(range(1, len($w)),
       |                     i -> $w[i] || ' ' || $w[i+1])) AS pair
       |            FROM $table)
       |      GROUP BY pair)
       |ORDER BY n DESC, pair LIMIT $k""".stripMargin
  }
  /** Vocabulary coverage curve — the tokenizer-sizing measurement: for
    * each candidate vocab cutoff, how many corpus token OCCURRENCES the
    * top-`cutoff` frequency-ranked entries cover (the share an OOV/byte
    * fallback would have to absorb at that size). Runs on
    * [[vocabBuild]]'s ranked vocab table (term-cardinality, ≪ corpus):
    * one conditional-sum aggregation over it, melted to a row per
    * cutoff. */
  def vocabCoverage(docs: DataFrame,
      cutoffs: Seq[Long] = Seq(100L, 1000L, 10000L)): DataFrame = {
    require(cutoffs.nonEmpty, "vocabCoverage: need at least one cutoff")
    val v = vocabBuild(docs)
    val aggs = sum(col("c")).as("total") +:
      cutoffs.flatMap(k => Seq(
        sum(when(col("id") < k, col("c")).otherwise(0L)).as(s"cov_$k"),
        sum(when(col("id") < k, 1L).otherwise(0L)).as(s"nt_$k")))
    val one = v.agg(aggs.head, aggs.tail: _*)
    val melted = explode(array(cutoffs.map(k => struct(
      lit(k).as("cutoff"), col(s"nt_$k").cast(LongType).as("n_terms"),
      col(s"cov_$k").cast(LongType).as("covered_tokens"),
      col("total").cast(LongType).as("total_tokens"))): _*)).as("m")
    one.select(melted)
      .select(col("m.cutoff"), col("m.n_terms"), col("m.covered_tokens"),
        col("m.total_tokens"),
        graft.util.D.r(col("m.covered_tokens").cast(DoubleType) /
          col("m.total_tokens"), 6).as("share"))
      .orderBy("cutoff")
  }

  /** DuckDB mirror of [[vocabCoverage]]. */
  def vocabCoverageSql(table: String,
      cutoffs: Seq[Long] = Seq(100L, 1000L, 10000L)): String = {
    val cells = cutoffs.map(k =>
      s"""SELECT $k AS cutoff,
         |  CAST(SUM(CASE WHEN id < $k THEN 1 ELSE 0 END) AS BIGINT) AS n_terms,
         |  CAST(SUM(CASE WHEN id < $k THEN c ELSE 0 END) AS BIGINT) AS covered_tokens
         |FROM vb""".stripMargin).mkString("\n  UNION ALL\n  ")
    s"""WITH vb AS (${vocabBuildSql(table).replace("\n", "\n  ")}),
       |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM vb),
       |cells AS (${cells.replace("\n", "\n  ")})
       |SELECT CAST(cutoff AS BIGINT) AS cutoff, n_terms, covered_tokens,
       |  tot.total AS total_tokens,
       |  ROUND(CAST(covered_tokens AS DOUBLE) / tot.total, 6) AS share
       |FROM cells, tot ORDER BY cutoff""".stripMargin
  }
}
