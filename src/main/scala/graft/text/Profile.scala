package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus profiling + assignment operators that run immediately before
  * a training job: deterministic train/val/test splits and
  * token-length histograms. Reference scope: pd_explain stops at
  * DataFrame analytics (`pd_explain/core/explainable_data_frame.py`);
  * these extend the family with the dataset-assembly steps a
  * large-scale pipeline runs on the same tables.
  *
  * Scale notes (100 TB): both operators are a single corpus scan into
  * one map-side-combined aggregation keyed by a handful of values
  * (lang×split, source×bucket) — the shuffle moves a KB-sized stats
  * table no matter the corpus size. Split assignment itself is
  * scan-local (the md5 coin needs only doc_id) and is the same
  * seedless [[Corpus.hashFrac]] coin as every sampling operator, so a
  * document's split is stable across reruns, engines, and corpus
  * growth — appending new documents never reassigns an old one.
  */
object Profile {

  /** Deterministic stratified split report: assign every document to
    * train/val/test by its [[Corpus.hashFrac]] coin (train below
    * `trainFrac`, val below `trainFrac + valFrac`, else test) and
    * report per (lang, split) document counts and exact token totals.
    * The assignment never samples state — membership is a pure
    * function of doc_id — so two jobs (or two engines) agree on every
    * document, which is what makes the split safe to recompute
    * instead of persist. */
  def splitHash(docs: DataFrame, trainFrac: Double = 0.8,
      valFrac: Double = 0.1): DataFrame = {
    val h = Corpus.hashFrac(col("doc_id"))
    docs.select(col("lang"),
        when(h < trainFrac, "train")
          .when(h < trainFrac + valFrac, "val")
          .otherwise("test").as("split"),
        size(TextOps.tokens(col("text"))).cast(LongType).as("ntok"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(col("ntok")).cast(LongType).as("n_tokens"))
      .orderBy("lang", "split")
  }

  /** DuckDB mirror of [[splitHash]]. */
  def splitHashSql(table: String, trainFrac: Double = 0.8,
      valFrac: Double = 0.1): String =
    s"""SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(ntok) AS BIGINT) AS n_tokens
       |FROM (SELECT lang,
       |    CASE WHEN ${Corpus.hashFracSql("doc_id")} < $trainFrac THEN 'train'
       |         WHEN ${Corpus.hashFracSql("doc_id")} < ${trainFrac + valFrac} THEN 'val'
       |         ELSE 'test' END AS split,
       |    len(string_split(text, ' ')) AS ntok
       |  FROM $table)
       |GROUP BY lang, split ORDER BY lang, split""".stripMargin

  /** EXACT-proportion stratified split: within each lang stratum, rank
    * documents by the ([[Corpus.hashFrac]] coin, doc_id) order and cut
    * at FLOOR(trainFrac·n) / FLOOR((trainFrac+valFrac)·n) — every
    * stratum gets exactly its quota, unlike [[splitHash]]'s
    * threshold coin whose per-stratum proportions drift by
    * O(1/√n) (material for small strata: a 200-doc language can miss
    * its val set entirely). The rank is STILL a pure function of the
    * corpus content: same docs → same ranks → same assignment in both
    * engines; appending documents can shift assignments near the
    * boundary (the price of exactness — the doc-stable variant is
    * splitHash).
    *
    * Scale: the per-stratum rank never serializes a stratum onto one
    * reducer — range-repartition on (lang, coin, doc_id), partition-
    * local row_number, per-(partition, lang) offset table (bounded:
    * partitions × langs-touching-partition rows) broadcast back with
    * per-lang totals; the [[Corpus.seqPack]] machinery applied
    * per-stratum. localCheckpoint pins one execution of the range
    * exchange for both offset consumers (same contract note). */
  def stratifiedSplit(docs: DataFrame, trainFrac: Double = 0.8,
      valFrac: Double = 0.1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs.select(col("doc_id"), col("lang"),
      size(TextOps.tokens(col("text"))).cast(LongType).as("ntok"),
      Corpus.hashFrac(col("doc_id")).as("h"))
    val parted = d.repartitionByRange(col("lang"), col("h"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
    val local = parted.withColumn("local_rn",
        row_number().over(Window.partitionBy("pid", "lang")
          .orderBy(col("h"), col("doc_id"))).cast(LongType))
      .localCheckpoint(true)
    val offsets = local.groupBy("pid", "lang").agg(max("local_rn").as("pn"))
      .withColumn("offset", coalesce(
        sum("pn").over(Window.partitionBy("lang").orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_lang", sum("pn").over(Window.partitionBy("lang")))
      .select(col("pid").as("o_pid"), col("lang").as("o_lang"),
        col("offset"), col("n_lang"))
    // NULL-SAFE join on the stratum key: a plain equi-join drops every
    // null-lang row (null fails =), silently losing the whole NULL
    // stratum that the window ranks and the oracle reports
    local.join(broadcast(offsets),
        col("pid") === col("o_pid") && col("lang") <=> col("o_lang"))
      .drop("o_pid", "o_lang")
      .withColumn("rnk", col("local_rn") + col("offset"))
      .withColumn("split",
        when(col("rnk") <= floor(lit(trainFrac) * col("n_lang")), "train")
          .when(col("rnk") <= floor(lit(trainFrac + valFrac) * col("n_lang")), "val")
          .otherwise("test"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(col("ntok")).cast(LongType).as("n_tokens"))
      .orderBy("lang", "split")
  }

  /** DuckDB mirror of [[stratifiedSplit]] — the single-node form IS the
    * per-stratum ranked window the Spark side decomposes. Cut fractions
    * interpolate as Scala Double.toString so both engines floor the
    * bit-identical double product. */
  def stratifiedSplitSql(table: String, trainFrac: Double = 0.8,
      valFrac: Double = 0.1): String =
    s"""SELECT lang, split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(ntok) AS BIGINT) AS n_tokens
       |FROM (SELECT lang, ntok,
       |    CASE WHEN rnk <= FLOOR($trainFrac * n_lang) THEN 'train'
       |         WHEN rnk <= FLOOR(${trainFrac + valFrac} * n_lang) THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM (SELECT lang, ntok,
       |      ROW_NUMBER() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rnk,
       |      COUNT(*) OVER (PARTITION BY lang) AS n_lang
       |    FROM (SELECT doc_id, lang,
       |        CAST(len(${TextOps.tokensSql("text")}) AS BIGINT) AS ntok,
       |        ${Corpus.hashFracSql("doc_id")} AS h
       |      FROM $table)))
       |GROUP BY lang, split ORDER BY lang, split""".stripMargin

  // power-of-2 bucket floors for tokenHist; the cascade is integer
  // CASE logic, so both engines bucket identically (no float log2)
  private val HistBounds = Seq(16L, 32L, 64L, 128L, 256L, 512L)

  /** Token-length histogram per source: power-of-2 buckets (0-15,
    * 16-31, …, 512+) with per-bucket document counts, exact token
    * totals, and min/max — the corpus profile that sizes sequence
    * packing ([[Corpus.seqPack]] block length) and flags truncation
    * loss before a run. `bucket_lo` carries the bucket's lower bound
    * for a stable numeric sort (−1 = documents with NULL text). */
  def tokenHist(docs: DataFrame): DataFrame = {
    val ntok = size(TextOps.tokens(col("text"))).cast(LongType)
    val lo = HistBounds.foldLeft(
        when(ntok.isNull, lit(-1L)).when(ntok < HistBounds.head, lit(0L))) {
      (acc, b) => acc.when(ntok < b * 2, lit(b))
    }.otherwise(lit(HistBounds.last * 2))
    docs.select(col("source"), lo.as("bucket_lo"), ntok.as("ntok"))
      .groupBy("source", "bucket_lo")
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(col("ntok")).cast(LongType).as("sum_tokens"),
        min(col("ntok")).as("min_tokens"),
        max(col("ntok")).as("max_tokens"))
      .orderBy("source", "bucket_lo")
  }

  /** DuckDB mirror of [[tokenHist]]. */
  def tokenHistSql(table: String): String = {
    val cases = HistBounds.map(b => s"WHEN ntok < ${b * 2} THEN $b").mkString(" ")
    s"""SELECT source, CAST(bucket_lo AS BIGINT) AS bucket_lo, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(ntok) AS BIGINT) AS sum_tokens,
       |  MIN(ntok) AS min_tokens, MAX(ntok) AS max_tokens
       |FROM (SELECT source, ntok,
       |    CASE WHEN ntok IS NULL THEN -1 WHEN ntok < ${HistBounds.head} THEN 0
       |         $cases ELSE ${HistBounds.last * 2} END AS bucket_lo
       |  FROM (SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
       |        FROM $table))
       |GROUP BY source, bucket_lo ORDER BY source, bucket_lo""".stripMargin
  }

  /** Source-composition drift profile: per (source, lang) cell the
    * document count, the language's share WITHIN the source, the
    * language's corpus-wide share, and the delta — the QA table that
    * flags a source whose language mix diverges from the corpus (a
    * crawl gone wrong, a mislabeled feed) before it skews a training
    * mix. Shares are 6dp-rounded BEFORE the delta so both engines
    * subtract identical operands. One corpus scan into a
    * (sources × langs) KB-sized cell table; the source/lang/corpus
    * totals all re-aggregate FROM that table. */
  def langMixDrift(docs: DataFrame): DataFrame = {
    val cell = docs.groupBy("source", "lang").agg(count(lit(1)).cast(LongType).as("n_docs"))
    val srcTot = cell.groupBy("source").agg(sum(col("n_docs")).as("src_n"))
    val langTot = cell.groupBy("lang").agg(sum(col("n_docs")).as("lang_n"))
    val tot = cell.agg(sum(col("n_docs")).as("tot"))
    val pSrc = graft.util.D.r(col("n_docs").cast(DoubleType) / col("src_n"), 6)
    val pCorp = graft.util.D.r(col("lang_n").cast(DoubleType) / col("tot"), 6)
    cell.join(srcTot, "source").join(langTot, "lang").crossJoin(broadcast(tot))
      .select(col("source"), col("lang"), col("n_docs"),
        pSrc.as("p_src"), pCorp.as("p_corpus"),
        graft.util.D.r(pSrc - pCorp, 6).as("delta"))
      .orderBy("source", "lang")
  }

  /** DuckDB mirror of [[langMixDrift]]. */
  def langMixDriftSql(table: String): String =
    s"""WITH cell AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
       |  FROM $table GROUP BY 1, 2),
       |st AS (SELECT source, SUM(n_docs) AS src_n FROM cell GROUP BY 1),
       |lt AS (SELECT lang, SUM(n_docs) AS lang_n FROM cell GROUP BY 1),
       |tt AS (SELECT SUM(n_docs) AS tot FROM cell)
       |SELECT c.source, c.lang, c.n_docs,
       |  ROUND(CAST(c.n_docs AS DOUBLE) / st.src_n, 6) AS p_src,
       |  ROUND(CAST(lt.lang_n AS DOUBLE) / tt.tot, 6) AS p_corpus,
       |  ROUND(ROUND(CAST(c.n_docs AS DOUBLE) / st.src_n, 6)
       |    - ROUND(CAST(lt.lang_n AS DOUBLE) / tt.tot, 6), 6) AS delta
       |FROM cell c JOIN st ON c.source = st.source
       |JOIN lt ON c.lang = lt.lang, tt
       |ORDER BY c.source, c.lang""".stripMargin

  /** Per-group weighted sample WITHOUT replacement (Efraimidis &
    * Spirakis 2006 via the Gumbel-max formulation the DSIR selector
    * uses): within each language, the k documents with the largest
    * key = round6(ln w) + round6(Gumbel(md5-coin)), w = token count —
    * longer documents proportionally more likely, yet the selected SET
    * is a pure function of doc_id (seedless md5 coin), so reruns,
    * retries, and both engines pick identical documents. This is the
    * quality-weighted sampling step a curated-mix pipeline runs where
    * [[splitHash]]'s uniform coin would over-sample short documents.
    *
    * Scale: scan-local key computation; the per-group rank executes as
    * WindowGroupLimit (k-row heap per task per language — the corpus is
    * never sorted whole); one shuffle on the group key. */
  def weightedSample(docs: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val u = Corpus.hashFrac(col("doc_id"))
    val keyed = docs.select(col("lang"), col("doc_id"),
        size(TextOps.tokens(col("text"))).cast(LongType).as("n_tokens"))
      .withColumn("key",
        graft.util.D.r(log(col("n_tokens").cast(DoubleType)), 6) +
          graft.util.D.r(-log(-log(u)), 6))
    val w = Window.partitionBy("lang").orderBy(col("key").desc, col("doc_id"))
    keyed.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("lang"), col("rank"), col("doc_id"), col("n_tokens"),
        graft.util.D.r(col("key"), 6).as("key"))
      .orderBy("lang", "rank")
  }

  /** DuckDB mirror of [[weightedSample]]. */
  def weightedSampleSql(table: String, k: Int = 5): String =
    s"""WITH keyed AS (SELECT lang, doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    ROUND(LN(CAST(len(string_split(text, ' ')) AS DOUBLE)), 6)
       |      + ROUND(-LN(-LN(${Corpus.hashFracSql("doc_id")})), 6) AS key
       |  FROM $table),
       |ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
       |    ORDER BY key DESC, doc_id) AS rank FROM keyed)
       |SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id, n_tokens,
       |  ROUND(key, 6) AS key
       |FROM ranked WHERE rank <= $k ORDER BY lang, rank""".stripMargin

  /** Truncation-loss report for a candidate max sequence length — the
    * planning measurement behind the max_len/packing decision
    * ([[tokenHist]] shows the shape; this prices a specific cut): per
    * source, documents over the limit, exact token totals, tokens kept
    * at `maxLen` (Σ min(ntok, maxLen)), and the lost fraction. One
    * scan-local projection into one map-side-combined small-cardinality
    * aggregation — zero corpus shuffles beyond the stats table. */
  def truncationLoss(docs: DataFrame, maxLen: Int): DataFrame = {
    val ntok = size(TextOps.tokens(col("text"))).cast(LongType)
    docs.select(col("source"), ntok.as("ntok"))
      .groupBy("source")
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum((col("ntok") > maxLen).cast("long")).cast(LongType).as("n_truncated"),
        sum(col("ntok")).cast(LongType).as("tokens_total"),
        sum(least(col("ntok"), lit(maxLen.toLong))).cast(LongType).as("tokens_kept"))
      .select(col("source"), col("n_docs"), col("n_truncated"),
        col("tokens_total"), col("tokens_kept"),
        (col("tokens_total") - col("tokens_kept")).as("tokens_lost"),
        graft.util.D.r((col("tokens_total") - col("tokens_kept")).cast(DoubleType) /
          col("tokens_total"), 6).as("loss_frac"))
      .orderBy("source")
  }

  /** DuckDB mirror of [[truncationLoss]]. */
  def truncationLossSql(table: String, maxLen: Int): String =
    s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN ntok > $maxLen THEN 1 ELSE 0 END) AS BIGINT) AS n_truncated,
       |  CAST(SUM(ntok) AS BIGINT) AS tokens_total,
       |  CAST(SUM(LEAST(ntok, $maxLen)) AS BIGINT) AS tokens_kept,
       |  CAST(SUM(ntok) - SUM(LEAST(ntok, $maxLen)) AS BIGINT) AS tokens_lost,
       |  ROUND(CAST(SUM(ntok) - SUM(LEAST(ntok, $maxLen)) AS DOUBLE) / SUM(ntok), 6) AS loss_frac
       |FROM (SELECT source, CAST(len(${TextOps.tokensSql("text")}) AS BIGINT) AS ntok FROM $table)
       |GROUP BY source ORDER BY source""".stripMargin

  /** Per-document token-distribution Shannon entropy (bits) — the
    * information-density quality signal complementing the Gopher
    * repetition family: low entropy = boilerplate/repetition, high =
    * diverse vocabulary. Computed via the identity
    * H = log2(n) − (Σ c·log2 c)/n over per-(doc, token) counts `c`, so
    * ONE corpus-sized map-side-combined shuffle (the tf-idf shape)
    * feeds a per-doc aggregation — no second pass to learn n first.
    * Determinism: each c·log2(c) term is rounded 6dp then
    * DECIMAL-summed (the Lm log convention), and H derives from those
    * identical operands in both engines. */
  def tokenEntropy(docs: DataFrame): DataFrame = {
    val tc = docs
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).cast(LongType).as("c"))
    tc.groupBy("doc_id")
      .agg(sum(col("c")).cast(LongType).as("n_tokens"),
        count(lit(1)).cast(LongType).as("n_distinct"),
        graft.util.D.dsumd(graft.util.D.r(
          col("c").cast(DoubleType) * log2(col("c").cast(DoubleType)), 6)).as("s"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        graft.util.D.r(
          log2(col("n_tokens").cast(DoubleType)) - col("s") / col("n_tokens"), 6)
          .as("entropy"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[tokenEntropy]]. */
  def tokenEntropySql(table: String): String =
    s"""WITH tc AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM (SELECT doc_id, unnest(${TextOps.tokensSql("text")}) AS tok FROM $table)
       |  GROUP BY 1, 2),
       |ag AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
       |    CAST(COUNT(*) AS BIGINT) AS n_distinct,
       |    CAST(ROUND(SUM(CAST(ROUND(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)), 6) AS DECIMAL(25,6))), 6) AS DOUBLE) AS s
       |  FROM tc GROUP BY 1)
       |SELECT doc_id, n_tokens, n_distinct,
       |  ROUND(log2(CAST(n_tokens AS DOUBLE)) - s / n_tokens, 6) AS entropy
       |FROM ag ORDER BY doc_id""".stripMargin

  /** Hashed bag-of-words linear quality scorer — the inference shape of
    * a fastText-style quality classifier (Joulin et al. 2017; the
    * GPT-3/LLaMA-lineage "quality filter" pattern): every token hashes
    * to one of `buckets` weight slots, the document score is the sum
    * of its tokens' weights, and the keep decision thresholds the raw
    * score. Weights here derive deterministically from the bucket id
    * (a seeded stand-in, so the operator is oracle-checkable); a
    * trained deployment swaps in a learned `buckets`-row weight table
    * — a broadcast at ANY corpus size — without changing the plan.
    *
    * Scale: entirely scan-local (the hash → bucket → weight → sum runs
    * inside one projection over the token array; zero shuffles, zero
    * joins), like [[splitHash]]. The md5-prefix hash is the library's
    * cross-engine hash convention ([[Corpus.hashFrac]]); all weight
    * arithmetic stays on positive longs so `%` agrees across engines.
    * Columns: doc_id, n_tokens, score, mean_w, keep. */
  def linearQuality(docs: DataFrame, buckets: Int = 256): DataFrame = {
    require(buckets >= 1, s"linearQuality: buckets must be >= 1, got $buckets")
    def weight(tok: Column): Column = {
      val b = conv(substring(md5(tok.cast(BinaryType)), 1, 15), 16, 10)
        .cast(LongType) % buckets.toLong
      (b * lit(2654435761L)) % 1000003L % 2001L - 1000L
    }
    // null text has no tokens and no score row — made explicit on both
    // sides (the oracle's unnest yields zero rows for it; an unfiltered
    // Spark side would emit an all-null row instead)
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
      .select(col("doc_id"),
        size(col("w")).cast(LongType).as("n_tokens"),
        aggregate(col("w"), lit(0L), (acc, t) => acc + weight(t)).as("score"))
      .select(col("doc_id"), col("n_tokens"), col("score"),
        graft.util.D.r(
          col("score").cast(DoubleType) / col("n_tokens").cast(DoubleType), 6)
          .as("mean_w"),
        (col("score") > 0).cast(LongType).as("keep"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[linearQuality]] (unnest + regroup — the oracle
    * favors clarity over the scan-local plan). */
  def linearQualitySql(table: String, buckets: Int = 256): String =
    s"""WITH tw AS (
       |  SELECT doc_id,
       |    (('0x' || substr(md5(tok), 1, 15))::BIGINT % $buckets) AS b
       |  FROM (SELECT doc_id, unnest(${TextOps.tokensSql("text")}) AS tok
       |        FROM $table WHERE text IS NOT NULL)),
       |sc AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |    CAST(SUM(((b * 2654435761) % 1000003) % 2001 - 1000) AS BIGINT) AS score
       |  FROM tw GROUP BY doc_id)
       |SELECT doc_id, n_tokens, score,
       |  ROUND(CAST(score AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS mean_w,
       |  CAST(CASE WHEN score > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM sc ORDER BY doc_id""".stripMargin
}
