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

  /** The remaining published Gopher repetition measurements (Rae et
    * al. 2021 App. A Table A1, token re-expression — char fractions
    * become token fractions under the single-space tokenization
    * contract): per document, for n in `topNs` the fraction of tokens
    * attributable to ALL occurrences of the single most frequent
    * n-gram (occurrences × n / n_tokens — overlapping occurrences
    * count per occurrence, as the paper's char accounting does, so
    * a degenerate doc can exceed 1; it's a filter signal, not a
    * probability), and for n in `dupNs` the fraction of tokens COVERED
    * by n-grams occurring more than once within the doc (occurrences
    * interval-merged, so coverage ≤ 1 by construction — the
    * [[graft.dedup.Dedup.substrSpans]] islands, per-doc).
    * [[repetitionStats]] carries the top-token and duplicate-bigram
    * members of the family; together they complete the table.
    *
    * Scale: one linear explode per n (topNs ∪ dupNs scans of the
    * corpus, each a map-side-combined count of 8-byte
    * [[graft.functions.NgramHashes]] longs keyed by (doc, n, hash) —
    * WITHIN-doc counts, so doc_id is in every shuffle key and no
    * corpus-wide hash table forms); the coverage merge windows
    * partition by (doc, n). Nothing broadcast, nothing global. */
  def ngramRepetition(docs: DataFrame, topNs: Seq[Int] = Seq(2, 3, 4),
      dupNs: Seq[Int] = Seq(5, 10)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(topNs.nonEmpty && dupNs.nonEmpty, "need at least one n per family")
    val base = docs.select(col("doc_id"),
      size(TextOps.tokens(col("text"))).cast(LongType).as("n_tokens"))
    // most-frequent-n-gram occurrence count per (doc, n)
    val tops = topNs.map { n =>
        docs.select(col("doc_id"), lit(n).as("n"),
          explode(graft.functions.NgramHashes(col("text"), n)).as("wh"))
      }.reduce(_ unionAll _)
      .groupBy("doc_id", "n", "wh").agg(count(lit(1)).as("c"))
      .groupBy("doc_id", "n").agg(max(col("c")).as("maxc"))
    val topAgg = tops.groupBy("doc_id").agg(
      topNs.map(n => max(when(col("n") === n, col("maxc"))).as(s"top${n}_cnt")).head,
      topNs.map(n => max(when(col("n") === n, col("maxc"))).as(s"top${n}_cnt")).tail: _*)
    // within-doc duplicated n-gram token coverage per (doc, n)
    val dpos = dupNs.map { n =>
        docs.select(col("doc_id"), lit(n).as("n"),
          posexplode(graft.functions.NgramHashes(col("text"), n)).as(Seq("pos", "wh")))
      }.reduce(_ unionAll _)
      .select(col("doc_id"), col("n"), col("pos").cast(LongType).as("pos"), col("wh"))
    val dcnt = dpos.groupBy("doc_id", "n", "wh").agg(count(lit(1)).as("c"))
    val dups = dpos.join(dcnt.filter(col("c") > 1), Seq("doc_id", "n", "wh"))
      .select("doc_id", "n", "pos")
    val w = Window.partitionBy("doc_id", "n").orderBy("pos")
    val prevMaxEnd = max(col("pos") + col("n") - 1).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    val spans = dups
      .withColumn("new_span",
        when(prevMaxEnd.isNull || col("pos") > prevMaxEnd, 1L).otherwise(0L))
      .withColumn("span_id",
        sum(col("new_span")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "n", "span_id")
      .agg(min(col("pos")).as("s"), max(col("pos")).as("maxp"))
      .select(col("doc_id"), col("n"), (col("maxp") + col("n") - col("s")).as("cov"))
      .groupBy("doc_id", "n").agg(sum(col("cov")).as("covered"))
    val dupAgg = spans.groupBy("doc_id").agg(
      dupNs.map(n => max(when(col("n") === n, col("covered"))).as(s"dup${n}_tok")).head,
      dupNs.map(n => max(when(col("n") === n, col("covered"))).as(s"dup${n}_tok")).tail: _*)
    val frac = (c: Column) => graft.util.D.r(c.cast(DoubleType) / col("n_tokens"), 6)
    base.join(topAgg, Seq("doc_id"), "left").join(dupAgg, Seq("doc_id"), "left")
      .select(Seq(col("doc_id"), col("n_tokens")) ++
        topNs.map(n => frac(coalesce(col(s"top${n}_cnt"), lit(0L)) * n).as(s"top${n}_frac")) ++
        dupNs.map(n => frac(coalesce(col(s"dup${n}_tok"), lit(0L))).as(s"dup${n}_frac")): _*)
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[ngramRepetition]]. */
  def ngramRepetitionSql(table: String, topNs: Seq[Int] = Seq(2, 3, 4),
      dupNs: Seq[Int] = Seq(5, 10)): String = {
    def win(n: Int) =
      s"""SELECT doc_id, $n AS n, t.pos,
         |    ('0x' || substr(md5(array_to_string(tk[t.pos + 1 : t.pos + $n], ' ')), 1, 15))::BIGINT AS wh
         |  FROM toks, UNNEST(range(0, GREATEST(len(tk) - $n + 1, 0))) AS t(pos)""".stripMargin
    val topU = topNs.map(win).mkString("\n  UNION ALL\n  ")
    val dupU = dupNs.map(win).mkString("\n  UNION ALL\n  ")
    val topCols = topNs.map(n =>
      s"ROUND(CAST(COALESCE(t.top${n}_cnt, 0) * $n AS DOUBLE) / b.n_tokens, 6) AS top${n}_frac")
    val dupCols = dupNs.map(n =>
      s"ROUND(CAST(COALESCE(d.dup${n}_tok, 0) AS DOUBLE) / b.n_tokens, 6) AS dup${n}_frac")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tk FROM $table),
       |b AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens FROM toks),
       |tw AS (${topU.replace("\n", "\n  ")}),
       |tc AS (SELECT doc_id, n, wh, COUNT(*) AS c FROM tw GROUP BY 1, 2, 3),
       |tm AS (SELECT doc_id, n, MAX(c) AS maxc FROM tc GROUP BY 1, 2),
       |tp AS (SELECT doc_id,
       |    ${topNs.map(n => s"MAX(CASE WHEN n = $n THEN maxc END) AS top${n}_cnt").mkString(", ")}
       |  FROM tm GROUP BY 1),
       |dw AS (${dupU.replace("\n", "\n  ")}),
       |dc AS (SELECT doc_id, n, wh, COUNT(*) AS c FROM dw GROUP BY 1, 2, 3),
       |dd AS (SELECT w.doc_id, w.n, w.pos FROM dw w
       |  JOIN dc ON dc.doc_id = w.doc_id AND dc.n = w.n AND dc.wh = w.wh
       |  WHERE dc.c > 1),
       |df AS (SELECT doc_id, n, pos,
       |    CASE WHEN MAX(pos + n - 1) OVER (PARTITION BY doc_id, n ORDER BY pos
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |         OR pos > MAX(pos + n - 1) OVER (PARTITION BY doc_id, n ORDER BY pos
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |    THEN 1 ELSE 0 END AS new_span FROM dd),
       |ds AS (SELECT doc_id, n, pos, SUM(new_span) OVER (PARTITION BY doc_id, n ORDER BY pos
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id FROM df),
       |sp AS (SELECT doc_id, n, span_id, MAX(pos) + n - MIN(pos) AS cov
       |  FROM ds GROUP BY 1, 2, 3),
       |cv AS (SELECT doc_id, n, SUM(cov) AS covered FROM sp GROUP BY 1, 2),
       |dp AS (SELECT doc_id,
       |    ${dupNs.map(n => s"MAX(CASE WHEN n = $n THEN covered END) AS dup${n}_tok").mkString(", ")}
       |  FROM cv GROUP BY 1)
       |SELECT b.doc_id, b.n_tokens,
       |  ${(topCols ++ dupCols).mkString(",\n  ")}
       |FROM b LEFT JOIN tp t ON b.doc_id = t.doc_id
       |LEFT JOIN dp d ON b.doc_id = d.doc_id
       |ORDER BY b.doc_id""".stripMargin
  }

  /** Training-mix sampling: derive a per-language sampling rate from a
    * token budget (rate = min(1, budget / actual total tokens)) and
    * take a deterministic md5-hash sample of documents at that rate.
    * Returns (lang, total_tokens, rate, n_kept, kept_tokens). The
    * kept-document SET is reproducible across runs and engines: a doc
    * is kept iff its 60-bit md5(doc_id) fraction < rate. */
  /** Seedless deterministic coin in [0, 1): the first 60 bits of
    * md5(doc_id) as a fraction. ONE definition shared by every
    * sampling operator ([[domainMix]], [[resampleEpochs]]) — the
    * "reruns and retries pick identical documents" guarantee depends
    * on all coins being bit-identical, so don't re-spell it. */
  private[graft] def hashFrac(id: Column): Column =
    conv(substring(md5(id.cast(StringType).cast(BinaryType)), 1, 15), 16, 10)
      .cast(LongType).cast(DoubleType) / lit(1152921504606846976.0)

  /** DuckDB mirror of [[hashFrac]]. */
  private[graft] def hashFracSql(id: String): String =
    s"CAST(('0x' || substr(md5(CAST($id AS VARCHAR)), 1, 15))::BIGINT AS DOUBLE) / 1152921504606846976.0"

  def domainMix(docs: DataFrame, budgetTokens: Double): DataFrame = {
    val d = docs.select(col("doc_id"), col("lang"),
      size(TextOps.tokens(col("text"))).cast(LongType).as("ntok"),
      hashFrac(col("doc_id")).as("hfrac"))
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

  /** Temperature-scaled language mix (the mT5/XLM-R multilingual
    * sampling rule, Xue et al. 2021 §3.2; Conneau et al. 2020):
    * sampling share q_l ∝ n_l^(1/τ) over the per-language token
    * totals n_l, flattening the natural distribution so low-resource
    * languages are upsampled. Emits per language the natural share,
    * the temperature share, and `epochs` = q_l·Σn / n_l — the
    * with-replacement oversampling factor a trainer applies (feed it
    * to [[resampleEpochs]] keyed on lang to materialize the mix).
    *
    * Cross-engine determinism: the registered query pins τ = 2
    * because n^(1/2) is IEEE-754 `sqrt` — correctly rounded and
    * bit-identical in both engines. Other τ values go through `pow`,
    * which libm does not guarantee correctly rounded (documented
    * caveat, not an oracle path). Weights are rounded to 6dp and
    * summed as exact decimals, so Σw is order-independent.
    *
    * Scale: ONE map-side-combined corpus aggregation to the
    * language-cardinality table; all mix math runs on that KB-sized
    * table crossed with its own one-row total (broadcast). */
  def tempMix(docs: DataFrame, tau: Double = 2.0): DataFrame = {
    require(tau > 0, s"tempMix: tau must be positive, got $tau")
    val per = docs
      .select(col("lang"), size(TextOps.tokens(col("text"))).cast(LongType).as("ntok"))
      .groupBy("lang")
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(col("ntok")).cast(LongType).as("total_tokens"))
    val nd = col("total_tokens").cast(DoubleType)
    val pw = if (tau == 2.0) sqrt(nd) else pow(nd, 1.0 / tau)
    val w = per.withColumn("w", graft.util.D.r(pw, 6))
    val tot = w.agg(sum(col("total_tokens")).cast(LongType).as("gt"),
      sum(col("w").cast(graft.util.D.dec25)).cast(DoubleType).as("gw"))
    w.crossJoin(broadcast(tot))
      .withColumn("share", graft.util.D.r(nd / col("gt"), 6))
      .withColumn("temp_share", graft.util.D.r(col("w") / col("gw"), 6))
      .withColumn("epochs",
        graft.util.D.r(col("temp_share") * col("gt").cast(DoubleType) / nd, 6))
      .select("lang", "n_docs", "total_tokens", "share", "temp_share", "epochs")
      .orderBy("lang")
  }

  /** DuckDB mirror of [[tempMix]] (τ = 2 / sqrt only — see the
    * determinism note on [[tempMix]]). */
  def tempMixSql(table: String): String =
    s"""WITH per AS (
       |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(len(${TextOps.tokensSql("text")})) AS BIGINT) AS total_tokens
       |  FROM $table GROUP BY lang),
       |w AS (SELECT *, ROUND(sqrt(CAST(total_tokens AS DOUBLE)), 6) AS w FROM per),
       |tot AS (SELECT CAST(SUM(total_tokens) AS BIGINT) AS gt,
       |    CAST(SUM(CAST(w AS DECIMAL(25,6))) AS DOUBLE) AS gw FROM w)
       |SELECT lang, n_docs, total_tokens,
       |  ROUND(CAST(total_tokens AS DOUBLE) / gt, 6) AS share,
       |  ROUND(w / gw, 6) AS temp_share,
       |  ROUND(ROUND(w / gw, 6) * CAST(gt AS DOUBLE) / CAST(total_tokens AS DOUBLE), 6) AS epochs
       |FROM w, tot ORDER BY lang""".stripMargin

  /** Epoch-based domain resampling: the step that turns a target mix
    * into per-document repeat counts. Training mixes are specified as
    * epochs per domain (e.g. web 0.5, wiki 2.5 — the mixture tables
    * published for LLaMA-style runs); a fractional epoch means a
    * deterministic subsample of the domain. Emits (doc_id, source,
    * n_tokens, n_epochs) where n_epochs = ⌊w⌋ plus 1 for the documents
    * whose md5-derived hash fraction falls below frac(w) — the same
    * seedless, shuffle-free coin as [[domainMix]], so reruns and
    * retries pick identical documents. Downstream, a doc contributes
    * n_epochs copies to the packed stream; n_epochs = 0 drops it.
    *
    * Scale: entirely scan-local — the weight map rewrites to a CASE
    * expression, no join, no shuffle, one pass over the corpus. */
  def resampleEpochs(docs: DataFrame, weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(w => w >= 0 && w < 1e6),
      "resampleEpochs: weights must be in [0, 1e6)")
    val w = weights.toSeq.sortBy(_._1).foldLeft(lit(1.0)) { case (acc, (s0, ww)) =>
      when(col("source") === s0, lit(ww)).otherwise(acc)
    }
    val hfrac = hashFrac(col("doc_id"))
    docs.select(col("doc_id"), col("source"),
        size(TextOps.tokens(col("text"))).cast(LongType).as("n_tokens"),
        (floor(w).cast(LongType) +
          when(hfrac < w - floor(w), 1L).otherwise(0L)).as("n_epochs"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[resampleEpochs]] (unlisted sources default to
    * weight 1.0, same as the Spark fold). */
  def resampleEpochsSql(table: String, weights: Map[String, Double]): String = {
    val cases = weights.toSeq.sortBy(_._1)
      .map { case (s0, ww) => s"WHEN source = '$s0' THEN $ww" }.mkString(" ")
    val w = s"(CASE $cases ELSE 1.0 END)"
    val hfrac = hashFracSql("doc_id")
    s"""SELECT doc_id, source,
       |  CAST(len(${TextOps.tokensSql("text")}) AS BIGINT) AS n_tokens,
       |  CAST(FLOOR($w) AS BIGINT)
       |    + (CASE WHEN $hfrac < $w - FLOOR($w) THEN 1 ELSE 0 END) AS n_epochs
       |FROM $table ORDER BY doc_id""".stripMargin
  }

  /** Sequence packing: the final step before an LLM training run —
    * concatenate the corpus's tokens in `doc_id` order into one global
    * stream and chop it into fixed `blockTokens` training blocks.
    * Emits per doc its span in that stream: (doc_id, n_tokens,
    * start_tok, first_block, last_block) — which training sequences
    * the doc lands in, and where (a doc straddling a block boundary is
    * split across sequences, exactly how packed pretraining batches
    * are built).
    *
    * The core is a distributed ordered cumulative sum, which a naive
    * global window would serialize onto one reducer. Instead:
    * range-repartition by doc_id, locally cumsum inside each range
    * partition (a per-partition window), then add broadcast
    * per-partition prefix offsets — the offsets table has one row per
    * partition. The result is invariant to the number/boundaries of
    * the range partitions, so AQE re-planning can't change answers.
    * Two shuffles total (the range exchange + the per-pid window's
    * hash exchange), both linear; the offset join is a broadcast. */
  def seqPack(docs: DataFrame, blockTokens: Long): DataFrame = {
    require(blockTokens > 0, "seqPack: blockTokens must be positive")
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"),
      size(TextOps.tokens(col("text"))).cast(LongType).as("n_tokens"))
    val parted = toks.repartitionByRange(col("doc_id"))
      .withColumn("pid", spark_partition_id())
    // pin ONE execution: `local` feeds both the offsets aggregate and
    // the join, and spark_partition_id() is only consistent across the
    // two consumers if the range exchange runs exactly once. Exchange
    // reuse normally guarantees that, but it is an optimization, not a
    // contract (spark.sql.exchange.reuse=false would re-sample range
    // boundaries per consumer) — the checkpoint makes it structural.
    // Cost: one materialization of (doc_id, n_tokens, pid, local_cum)
    // — 4 longs/doc, reclaimed when the frame goes unreachable.
    val local = parted.withColumn("local_cum",
        sum("n_tokens").over(Window.partitionBy("pid").orderBy("doc_id")))
      .localCheckpoint(true)
    val offsets = local.groupBy("pid").agg(max("local_cum").as("ptot"))
      .withColumn("offset", coalesce(
        sum("ptot").over(Window.orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "offset")
    local.join(broadcast(offsets), Seq("pid"))
      .withColumn("cum", col("local_cum") + col("offset"))
      .select(col("doc_id"), col("n_tokens"),
        (col("cum") - col("n_tokens")).as("start_tok"),
        // integer div (not double /): exact at any stream length,
        // bit-matching DuckDB's // on BIGINT
        expr(s"CAST((cum - n_tokens) div $blockTokens AS BIGINT)").as("first_block"),
        expr(s"CAST((cum - 1) div $blockTokens AS BIGINT)").as("last_block"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[seqPack]] — the single-node form IS the global
    * ordered window the Spark side decomposes. */
  def seqPackSql(table: String, blockTokens: Long): String =
    s"""SELECT doc_id, n_tokens,
       |  CAST(cum - n_tokens AS BIGINT) AS start_tok,
       |  CAST((cum - n_tokens) // $blockTokens AS BIGINT) AS first_block,
       |  CAST((cum - 1) // $blockTokens AS BIGINT) AS last_block
       |FROM (SELECT doc_id, n_tokens, SUM(n_tokens) OVER (ORDER BY doc_id) AS cum
       |  FROM (SELECT doc_id, CAST(len(${TextOps.tokensSql("text")}) AS BIGINT) AS n_tokens
       |        FROM $table))
       |ORDER BY doc_id""".stripMargin

  /** Token-balanced shard assignment: rank docs by (n_tokens desc,
    * doc_id asc) and deal them round-robin into `shards` shards —
    * sorted round-robin dealing (NOT true LPT, which assigns each doc
    * to the currently-least-loaded shard; dealing spreads the largest
    * docs first and the telescoping argument bounds shard token totals
    * within one max-doc of each other). Emits the per-shard balance
    * profile (doc/token totals + extremes), which is the QA artifact a
    * sharded training-data write is judged by.
    *
    * Scale: the global rank uses the [[seqPack]] machinery — range
    * repartition on the rank key, partition-local row_number, bounded
    * per-partition offset table broadcast back. No single-reducer
    * window ever sees corpus rows; the output is `shards` rows. */
  def shardBalance(docs: DataFrame, shards: Int): DataFrame = {
    require(shards > 0, "shardBalance: shards must be positive")
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"),
      size(TextOps.tokens(col("text"))).cast(LongType).as("n_tokens"))
    val parted = toks.repartitionByRange(col("n_tokens").desc, col("doc_id"))
      .withColumn("pid", spark_partition_id())
    // localCheckpoint pins ONE execution of the range exchange for both
    // consumers of pid — same contract note as [[seqPack]]
    val local = parted.withColumn("local_rn",
        row_number().over(Window.partitionBy("pid")
          .orderBy(col("n_tokens").desc, col("doc_id"))).cast(LongType))
      .localCheckpoint(true)
    val offsets = local.groupBy("pid").agg(max("local_rn").as("pn"))
      .withColumn("offset", coalesce(
        sum("pn").over(Window.orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "offset")
    local.join(broadcast(offsets), Seq("pid"))
      .withColumn("shard", (col("local_rn") + col("offset") - 1) % shards)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("tot_tokens"),
        max("n_tokens").as("max_tokens"), min("n_tokens").as("min_tokens"))
      .orderBy("shard")
  }

  /** DuckDB mirror of [[shardBalance]]. */
  def shardBalanceSql(table: String, shards: Int): String =
    s"""WITH toks AS (SELECT doc_id, CAST(len(${TextOps.tokensSql("text")}) AS BIGINT) AS n_tokens
       |  FROM $table),
       |r AS (SELECT doc_id, n_tokens,
       |    ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) AS rn FROM toks)
       |SELECT CAST((rn - 1) % $shards AS BIGINT) AS shard,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens,
       |  MAX(n_tokens) AS max_tokens, MIN(n_tokens) AS min_tokens
       |FROM r GROUP BY 1 ORDER BY shard""".stripMargin

  /** The 8 function words behind the Gopher stopword rule (Rae et al.
    * 2021, "Scaling Language Models: ... Gopher", Appendix A quality
    * heuristics). */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style document quality rules (Rae et al. 2021 Appendix A),
    * the published heuristic set production pretraining pipelines start
    * from: word count in [minWords, maxWords], mean word length in
    * [minMeanLen, maxMeanLen], symbol-to-word ratio (`#` and `...`) at
    * most maxSymbolRatio, at least minAlphaFrac of words containing an
    * alphabetic character, and at least minStopHits distinct
    * [[GopherStops]] words present. Returns one row per doc with each
    * rule's measurement and the combined `keep` bit — keep the
    * measurements, not just the bit, so a pipeline can tune thresholds
    * from their distribution.
    *
    * Scale: entirely scan-local (no shuffle; one pass per document),
    * with every rule inside whole-stage codegen — the alpha-word rule
    * runs as the native [[graft.functions.AlphaTokens]] byte scan, not
    * an interpreted `filter(w, rlike)` HOF. */
  def gopherQuality(docs: DataFrame,
                    minWords: Long = 50, maxWords: Long = 100000,
                    minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                    maxSymbolRatio: Double = 0.1,
                    minAlphaFrac: Double = 0.8,
                    minStopHits: Int = 2): DataFrame = {
    val w = TextOps.tokens(col("text"))
    val nW = size(w)
    val len = length(col("text"))
    docs.select(col("doc_id"),
        nW.cast(LongType).as("n_words"),
        // single-space text: total chars minus the (n-1) separators
        graft.util.D.r((len - nW + lit(1.0)) / nW, 6).as("mean_word_len"),
        graft.util.D.r(((len - length(replace(col("text"), lit("#"), lit("")))) +
          (len - length(replace(col("text"), lit("..."), lit("")))) / lit(3.0))
          .cast(DoubleType) / nW, 6).as("symbol_ratio"),
        graft.util.D.r(graft.functions.AlphaTokens(col("text")).cast(DoubleType) / nW, 6)
          .as("alpha_frac"),
        GopherStops.map(s0 => array_contains(w, s0).cast(IntegerType))
          .reduce(_ + _).cast(LongType).as("n_stop"))
      .withColumn("keep",
        when(col("n_words").between(minWords, maxWords) &&
          col("mean_word_len").between(minMeanLen, maxMeanLen) &&
          col("symbol_ratio") <= maxSymbolRatio &&
          col("alpha_frac") >= minAlphaFrac &&
          col("n_stop") >= minStopHits, 1).otherwise(0).cast(IntegerType))
  }

  /** DuckDB mirror of [[gopherQuality]]; `table` may be any table
    * expression with doc_id + text. */
  def gopherQualitySql(table: String,
                       minWords: Long = 50, maxWords: Long = 100000,
                       minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                       maxSymbolRatio: Double = 0.1,
                       minAlphaFrac: Double = 0.8,
                       minStopHits: Int = 2): String = {
    val w = TextOps.tokensSql("text")
    val nstop = GopherStops.map(s0 => s"CAST(list_contains($w, '$s0') AS INT)").mkString(" + ")
    s"""SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac, n_stop,
       |  CAST(CASE WHEN n_words >= $minWords AND n_words <= $maxWords
       |    AND mean_word_len >= $minMeanLen AND mean_word_len <= $maxMeanLen
       |    AND symbol_ratio <= $maxSymbolRatio AND alpha_frac >= $minAlphaFrac
       |    AND n_stop >= $minStopHits THEN 1 ELSE 0 END AS INT) AS keep
       |FROM (
       |  SELECT doc_id, CAST(len($w) AS BIGINT) AS n_words,
       |    ROUND((length(text) - len($w) + 1.0) / len($w), 6) AS mean_word_len,
       |    ROUND(CAST((length(text) - length(replace(text, '#', '')))
       |      + (length(text) - length(replace(text, '...', ''))) / 3.0 AS DOUBLE)
       |      / len($w), 6) AS symbol_ratio,
       |    ROUND(CAST(len(list_filter($w, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
       |      / len($w), 6) AS alpha_frac,
       |    CAST($nstop AS BIGINT) AS n_stop
       |  FROM $table)""".stripMargin
  }

  /** PII detection patterns — deliberately narrow, documented shapes
    * (lowercased email, dotted-quad IPv4, +-prefixed international
    * phone). Production scrubbing composes more patterns the same way;
    * these three exercise the full staged count-then-replace machinery
    * with regexes whose semantics agree across Java regex and RE2. */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val IpRe = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"
  val PhoneRe = "\\+\\d{7,15}"

  /** PII scrub: replaces emails, IPv4 addresses and phone numbers in
    * `textCol` with `<EMAIL>`/`<IP>`/`<PHONE>` tokens and appends
    * per-document match counts (n_emails, n_ips, n_phones). Stages are
    * ordered (emails scrubbed before the IP pass, IPs before the phone
    * pass) so one span is never double-counted; each count is measured
    * on that stage's input, exactly as the SQL mirror stages it.
    *
    * Scale: scan-local, no shuffle. regexp_count/regexp_replace are
    * codegen'd native expressions, and the email/phone passes are gated
    * on a cheap contains() probe ('@' / '+') so documents without the
    * marker skip the regex entirely — on clean corpora most rows pay
    * three contains() probes and one regex (the ungated IP pass). A
    * single-pass multi-pattern native scanner is the upgrade path if
    * scrubbing ever dominates a profile. */
  def piiScrub(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t0 = col(textCol)
    // NULL text must yield NULL counts on the GATED stages too (a bare
    // otherwise(0) would turn contains(NULL)'s NULL gate into a 0 count
    // while the ungated IP stage stays NULL — inconsistent, and a
    // parity break vs the SQL mirror where every count is NULL)
    def gated(src: Column, marker: String, re: String): Column =
      when(src.isNull, lit(null).cast(LongType))
        .when(src.contains(marker), regexp_count(src, lit(re)).cast(LongType))
        .otherwise(lit(0L))
    val a = docs
      .withColumn("n_emails", gated(t0, "@", EmailRe))
      .withColumn("__t1",
        when(t0.contains("@"), regexp_replace(t0, EmailRe, "<EMAIL>")).otherwise(t0))
    val b = a
      .withColumn("n_ips", regexp_count(col("__t1"), lit(IpRe)).cast(LongType))
      .withColumn("__t2", regexp_replace(col("__t1"), IpRe, "<IP>"))
    val c = b
      .withColumn("n_phones", gated(col("__t2"), "+", PhoneRe))
      .withColumn("__t3",
        when(col("__t2").contains("+"), regexp_replace(col("__t2"), PhoneRe, "<PHONE>"))
          .otherwise(col("__t2")))
    c.withColumn(textCol, col("__t3")).drop("__t1", "__t2", "__t3")
  }

  /** DuckDB mirror of [[piiScrub]] + fingerprint projection: emits
    * (doc_id, n_emails, n_ips, n_phones, scrub_fp) where scrub_fp is
    * md5 of the fully-scrubbed text — the fingerprint pins replacement
    * parity, not just the counts. `table` may be any table expression
    * with doc_id + text. */
  def piiScrubSql(table: String): String =
    s"""WITH s1 AS (SELECT doc_id, text AS t0,
       |    regexp_replace(text, '$EmailRe', '<EMAIL>', 'g') AS t1 FROM $table),
       |s2 AS (SELECT doc_id, t0, t1, regexp_replace(t1, '$IpRe', '<IP>', 'g') AS t2 FROM s1),
       |s3 AS (SELECT doc_id, t0, t1, t2,
       |    regexp_replace(t2, '$PhoneRe', '<PHONE>', 'g') AS t3 FROM s2)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t0, '$EmailRe')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(t1, '$IpRe')) AS BIGINT) AS n_ips,
       |  CAST(len(regexp_extract_all(t2, '$PhoneRe')) AS BIGINT) AS n_phones,
       |  md5(t3) AS scrub_fp
       |FROM s3""".stripMargin
  /** First-failing-rule filter funnel — the report a pipeline owner
    * reads to see WHERE documents die, not just how many: every doc
    * runs the quality cascade in fixed order (word_count →
    * mean_word_len → symbol_ratio → alpha_frac → stopwords →
    * top_token → dup_bigram) and is attributed to its FIRST failing
    * rule ('__kept__' for survivors); output is per (source, rule)
    * doc + exact token totals. Thresholds and formulas are exactly
    * [[gopherQuality]]'s five rules followed by [[repetitionStats]]'
    * two (parity spec-pinned so the duplicated expressions cannot
    * drift). Entirely scan-local signals into ONE map-side-combined
    * KB-sized aggregation — zero corpus shuffles. */
  def qualityFunnel(docs: DataFrame): DataFrame = {
    val w = TextOps.tokens(col("text"))
    val nW = size(w)
    val len = length(col("text"))
    val meanLen = graft.util.D.r((len - nW + lit(1.0)) / nW, 6)
    val symRatio = graft.util.D.r(((len - length(replace(col("text"), lit("#"), lit("")))) +
      (len - length(replace(col("text"), lit("..."), lit("")))) / lit(3.0))
      .cast(DoubleType) / nW, 6)
    val alphaFrac = graft.util.D.r(
      graft.functions.AlphaTokens(col("text")).cast(DoubleType) / nW, 6)
    val nStop = GopherStops.map(s0 => array_contains(w, s0).cast(IntegerType)).reduce(_ + _)
    val topTok = graft.util.D.r(array_max(transform(array_distinct(w),
      t0 => size(filter(w, x => x === t0)))).cast(DoubleType) / nW, 6)
    val big = when(nW >= 2, transform(sequence(lit(1), nW - 1),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1))))
      .otherwise(array().cast(ArrayType(StringType)))
    val dupBig = when(nW >= 2, graft.util.D.r(
        (size(big) - size(array_distinct(big))).cast(DoubleType) / size(big), 6))
      .otherwise(lit(0.0))
    val firstFail = when(nW < 50 || nW > 100000, "word_count")
      .when(meanLen < 3.0 || meanLen > 10.0, "mean_word_len")
      .when(symRatio > 0.1, "symbol_ratio")
      .when(alphaFrac < 0.8, "alpha_frac")
      .when(nStop < 2, "stopwords")
      .when(topTok > 0.2, "top_token")
      .when(dupBig > 0.2, "dup_bigram")
      .otherwise("__kept__")
    docs.select(col("source"), nW.cast(LongType).as("ntok"), firstFail.as("first_fail"))
      .groupBy("source", "first_fail")
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(col("ntok")).cast(LongType).as("n_tokens"))
      .orderBy("source", "first_fail")
  }

  /** DuckDB mirror of [[qualityFunnel]]. */
  def qualityFunnelSql(table: String): String = {
    val w = "string_split(text, ' ')"
    val big = s"list_transform(range(1, len($w)), i -> $w[i] || ' ' || $w[i+1])"
    val nstop = GopherStops.map(s0 => s"CAST(list_contains($w, '$s0') AS INT)").mkString(" + ")
    s"""WITH m AS (SELECT source, CAST(len($w) AS BIGINT) AS n_words,
       |    ROUND((length(text) - len($w) + 1.0) / len($w), 6) AS mean_word_len,
       |    ROUND(CAST((length(text) - length(replace(text, '#', '')))
       |      + (length(text) - length(replace(text, '...', ''))) / 3.0 AS DOUBLE)
       |      / len($w), 6) AS symbol_ratio,
       |    ROUND(CAST(len(list_filter($w, x -> regexp_matches(x, '[a-zA-Z]')))
       |      AS DOUBLE) / len($w), 6) AS alpha_frac,
       |    $nstop AS n_stop,
       |    ROUND(CAST(list_max(list_transform(list_distinct($w),
       |        t -> len(list_filter($w, x -> x = t)))) AS DOUBLE) / len($w), 6) AS top_token_frac,
       |    ROUND(CASE WHEN len($w) >= 2
       |      THEN CAST(len($big) - len(list_distinct($big)) AS DOUBLE) / len($big)
       |      ELSE 0.0 END, 6) AS dup_bigram_frac
       |  FROM $table),
       |f AS (SELECT source, n_words,
       |    CASE WHEN n_words < 50 OR n_words > 100000 THEN 'word_count'
       |         WHEN mean_word_len < 3.0 OR mean_word_len > 10.0 THEN 'mean_word_len'
       |         WHEN symbol_ratio > 0.1 THEN 'symbol_ratio'
       |         WHEN alpha_frac < 0.8 THEN 'alpha_frac'
       |         WHEN n_stop < 2 THEN 'stopwords'
       |         WHEN top_token_frac > 0.2 THEN 'top_token'
       |         WHEN dup_bigram_frac > 0.2 THEN 'dup_bigram'
       |         ELSE '__kept__' END AS first_fail
       |  FROM m)
       |SELECT source, first_fail, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(n_words) AS BIGINT) AS n_tokens
       |FROM f GROUP BY 1, 2 ORDER BY source, first_fail""".stripMargin
  }

  /** Snapshot diff between two corpus versions — the lakehouse
    * table-diff every incremental-ingest pipeline runs before deciding
    * what to reprocess: full-outer join the two versions on doc_id,
    * classify each document added / removed / changed / unchanged by
    * content fingerprint (md5 of the text — cheap, scan-local, and the
    * same collision contract as the exact-dedup family), and report
    * per-status document and token totals (token counts from the NEW
    * side where it exists, the old side for removals).
    *
    * Scale (100 TB): ONE shuffle — the doc_id-keyed full-outer join
    * (the minimal comparison any diff must pay; with both versions
    * written bucketed by doc_id it runs shuffle-free); fingerprints
    * and token counts are scan-local, and the result aggregates to a
    * 4-row status table map-side. Changed-content detection never
    * compares text — 16-byte fingerprints move through the join. */
  def snapshotDiff(v1: DataFrame, v2: DataFrame): DataFrame = {
    val a = v1.select(col("doc_id"), md5(col("text").cast(BinaryType)).as("fp1"),
      size(TextOps.tokens(col("text"))).cast(LongType).as("nt1"))
    val b = v2.select(col("doc_id"), md5(col("text").cast(BinaryType)).as("fp2"),
      size(TextOps.tokens(col("text"))).cast(LongType).as("nt2"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(
        when(col("fp1").isNull, "added")
          .when(col("fp2").isNull, "removed")
          .when(col("fp1") === col("fp2"), "unchanged")
          .otherwise("changed").as("status"),
        coalesce(col("nt2"), col("nt1")).as("ntok"))
      .groupBy("status")
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(col("ntok")).cast(LongType).as("n_tokens"))
      .orderBy("status")
  }

  /** DuckDB mirror of [[snapshotDiff]]; `v1`/`v2` are parenthesized
    * table expressions with doc_id + text. */
  def snapshotDiffSql(v1: String, v2: String): String =
    s"""WITH a AS (SELECT doc_id, md5(text) AS fp1,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt1 FROM $v1),
       |b AS (SELECT doc_id, md5(text) AS fp2,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nt2 FROM $v2),
       |j AS (SELECT CASE WHEN fp1 IS NULL THEN 'added'
       |         WHEN fp2 IS NULL THEN 'removed'
       |         WHEN fp1 = fp2 THEN 'unchanged'
       |         ELSE 'changed' END AS status,
       |    COALESCE(nt2, nt1) AS ntok
       |  FROM a FULL OUTER JOIN b USING (doc_id))
       |SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(ntok) AS BIGINT) AS n_tokens
       |FROM j GROUP BY 1 ORDER BY status""".stripMargin
}
