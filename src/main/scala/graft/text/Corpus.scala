package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-preparation operators for training-data pipelines:
  * benchmark decontamination, repetition statistics, domain mixing.
  * These complement the dedup family (graft.dedup.Dedup) — the
  * remaining steps a large-scale pretraining pipeline runs between raw
  * documents and a training mix.
  *
  * Scale notes (100 TB): decontaminate broadcasts only the eval shingle
  * set (benchmark suites are MBs, corpora are TBs) and dedups shingles
  * per-row before exploding, so the corpus side never globally
  * shuffles; repetitionStats is pure array math inside whole-stage
  * codegen (zero shuffles); domainMix moves only a
  * language-cardinality rate table across the join.
  */
object Corpus {

  /** Benchmark decontamination: for every training document (rows where
    * `isEval` is false) count the DISTINCT word-3-gram shingles it
    * shares with the eval slice (rows where `isEval` is true). Returns
    * (doc_id, source, n_shared) for contaminated docs only — anti-join
    * the result against the corpus to drop them. */
  def decontaminate(docs: DataFrame, isEval: Column): DataFrame = {
    val ev = docs.filter(isEval)
      .select(explode(array_distinct(TextOps.shingles(col("text")))).as("sh"))
      .distinct()
    val tr = docs.filter(!isEval)
      .select(col("doc_id"), col("source"),
        explode(array_distinct(TextOps.shingles(col("text")))).as("sh"))
    tr.join(ev, Seq("sh"))
      .groupBy("doc_id", "source")
      .agg(count(lit(1)).cast(LongType).as("n_shared"))
  }

  /** Contamination filter: the documents that share at least one
    * word-3-gram with `evalShingles` (a STATIC one-column DataFrame of
    * shingles, e.g. [[evalShingleSet]] built once from the benchmark
    * suite). Returns the contaminated documents with their original
    * columns — anti-join the result to drop them. `docs` must carry a
    * unique, non-null `doc_id` column (the contract of every Corpus
    * operator); under it the two plans below agree exactly, and
    * StreamingSpec asserts the parity. The plan is chosen by mode:
    *
    *  - BATCH: per-row-distinct shingles explode into a LEFT SEMI join
    *    against the eval set (AQE broadcasts it) + a per-document
    *    dedup — each shared shingle is one hash probe.
    *  - STREAMING: the eval set folds into one array row and each
    *    document runs a stateless `arrays_overlap` against it (no
    *    watermark, no dedup state — a streaming groupBy would retain
    *    keys forever). O(|eval|) per document, so it presumes a modest
    *    eval set; StreamingSpec asserts the two paths agree.
    *
    * Streaming callers should `persist()` `evalShingles` for the
    * query's lifetime: Spark re-executes the static subplan on every
    * micro-batch, so an unpersisted eval side re-runs its
    * explode+distinct each trigger. The library itself never persists
    * (caller owns the lifetime). */
  def contaminated(docs: DataFrame, evalShingles: DataFrame): DataFrame = {
    require(docs.columns.contains("doc_id"),
      "Corpus.contaminated requires a unique non-null doc_id column")
    val shCol = evalShingles.columns.head
    if (docs.isStreaming) {
      // stateless per-row check against the folded eval set — the only
      // aggregation-free form a stream can run. O(|eval|) per document,
      // so it presumes a modest eval set; batch inputs take the
      // semi-join below instead (the folded form measured ~10x slower
      // on a corpus: every row re-probes the whole eval array).
      val evalArr = evalShingles.agg(collect_set(col(shCol)).as("__ev"))
      docs
        .withColumn("__sh", array_distinct(TextOps.shingles(col("text"))))
        .crossJoin(evalArr)
        .filter(arrays_overlap(col("__sh"), col("__ev")))
        .select(docs.columns.map(col): _*)
    } else {
      // batch plan: explode per-row-distinct shingles CARRYING ONLY the
      // doc id (exploding full document rows would materialize the
      // payload once per shingle — measured 10x slower), LEFT SEMI join
      // the (broadcastable) eval set, then semi-join the contaminated
      // ids back onto the documents
      val hitIds = docs
        .select(col("doc_id"),
          explode(array_distinct(TextOps.shingles(col("text")))).as("__sh1"))
        .join(evalShingles.select(col(shCol).as("__sh1")), Seq("__sh1"), "left_semi")
        .select("doc_id").distinct()
      docs.join(hitIds, Seq("doc_id"), "left_semi")
    }
  }

  /** The eval-side shingle set for [[contaminated]]. */
  def evalShingleSet(evalDocs: DataFrame): DataFrame =
    evalDocs
      .select(explode(array_distinct(TextOps.shingles(col("text")))).as("sh"))
      .distinct()

  /** Gopher-style per-document repetition statistics: token count,
    * distinct-token count, most-frequent-token fraction, and
    * duplicate-bigram fraction, plus a `flagged` bit at the given
    * thresholds. Entirely scan-local (array functions; the top-token
    * scan is O(tokens × distinct) per row — document-sized). */
  def repetitionStats(docs: DataFrame,
                      topTokenTh: Double = 0.2,
                      dupBigramTh: Double = 0.2): DataFrame = {
    val base = docs
      .withColumn("w", TextOps.tokens(col("text")))
      .withColumn("big", when(size(col("w")) >= 2,
        transform(sequence(lit(1), size(col("w")) - 1),
          i => concat_ws(" ", element_at(col("w"), i), element_at(col("w"), i + 1))))
        .otherwise(array().cast(ArrayType(StringType))))
    base.select(col("doc_id"),
        size(col("w")).cast(LongType).as("n_tokens"),
        size(array_distinct(col("w"))).cast(LongType).as("n_distinct"),
        graft.util.D.r(array_max(transform(array_distinct(col("w")),
          t => size(filter(col("w"), x => x === t)))).cast(DoubleType) / size(col("w")), 6)
          .as("top_token_frac"),
        when(size(col("w")) >= 2,
          graft.util.D.r((size(col("big")) - size(array_distinct(col("big")))).cast(DoubleType) / size(col("big")), 6))
          .otherwise(lit(0.0)).as("dup_bigram_frac"))
      .withColumn("flagged",
        when(col("top_token_frac") > topTokenTh || col("dup_bigram_frac") > dupBigramTh, 1)
          .otherwise(0).cast(IntegerType))
  }

  /** Training-mix sampling: derive a per-language sampling rate from a
    * token budget (rate = min(1, budget / actual total tokens)) and
    * take a deterministic md5-hash sample of documents at that rate.
    * Returns (lang, total_tokens, rate, n_kept, kept_tokens). The
    * kept-document SET is reproducible across runs and engines: a doc
    * is kept iff its 60-bit md5(doc_id) fraction < rate. */
  def domainMix(docs: DataFrame, budgetTokens: Double): DataFrame = {
    val d = docs.select(col("doc_id"), col("lang"),
      size(TextOps.tokens(col("text"))).cast(LongType).as("ntok"),
      (conv(substring(md5(col("doc_id").cast(StringType).cast(BinaryType)), 1, 15), 16, 10)
        .cast(LongType).cast(DoubleType) / lit(1152921504606846976.0)).as("hfrac"))
    val tot = d.groupBy("lang").agg(sum(col("ntok")).as("total_tokens"))
      .withColumn("rate",
        graft.util.D.r(least(lit(1.0), lit(budgetTokens) / col("total_tokens").cast(DoubleType)), 6))
    val kept = d.join(tot.select("lang", "rate"), Seq("lang"))
      .filter(col("hfrac") < col("rate"))
      .groupBy("lang")
      .agg(count(lit(1)).cast(LongType).as("n_kept"),
        sum(col("ntok")).cast(LongType).as("kept_tokens"))
    tot.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("total_tokens"), col("rate"),
        coalesce(col("n_kept"), lit(0L)).cast(LongType).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).cast(LongType).as("kept_tokens"))
      .orderBy("lang")
  }
}
