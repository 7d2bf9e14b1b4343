package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Language-model-based corpus quality scoring and importance
  * resampling — the two model-driven selection steps a pretraining
  * pipeline runs after rule-based filtering (reference:
  * pd-explain's quality-filter surface; methods are the published
  * CCNet bucketing, Wenzek et al. 2019, and DSIR, Xie et al. 2023).
  *
  * Both operators substitute a closed-form unigram model for the
  * external KenLM / fastText artifacts the papers use (no model files
  * in this environment), which keeps them fully oracle-checkable: the
  * training pass is itself a relational aggregation.
  *
  * Scale (100 TB):
  *  - [[unigramLm]] trains on a REFERENCE slice (CCNet trains on
  *    Wikipedia — GBs, not the corpus being scored), so the vocab
  *    table is reference-sized; the scoring join is left as a plain
  *    equi-join for AQE to pick broadcast vs shuffle. The corpus side
  *    is one explode + one per-doc aggregation (map-side combined, one
  *    shuffle of doc-cardinality rows).
  *  - [[dsir]] hashes tokens into a FIXED bucket count, so both
  *    distribution tables are ≤ `buckets` rows — broadcast by
  *    construction regardless of corpus size; the corpus side is one
  *    explode + one per-doc aggregation. Selection is a deterministic
  *    Gumbel top-k (TakeOrderedAndProject — per-partition heaps, no
  *    global sort).
  */
object Lm {

  /** Laplace-smoothed log-probability, rounded to 6 decimals before
    * any composition (Math.log vs libm may differ by 1 ulp; rounding
    * first makes downstream sums start from identical operands —
    * same contract as Search.idf6). */
  private def lp6(c: Column, n: Column, v: Column): Column =
    graft.util.D.r(log((c + lit(1L)).cast(DoubleType) / (n + v).cast(DoubleType)), 6)

  /** CCNet-style quality bucketing: a Laplace-smoothed unigram LM is
    * trained on the `lang = trainLang` slice, every document is scored
    * by its mean per-token log-probability under that LM (OOV tokens
    * get the smoothing mass 1/(N+V)), and docs are cut into
    * head/middle/tail at the given score thresholds — the CCNet
    * convention where "head" is the reference-like slice kept for
    * training. Returns (doc_id, n_tokens, lp_per_tok, bucket) ordered
    * by doc_id. Default thresholds are the sf-corpus terciles; real
    * deployments calibrate them on a held-out sample the same way
    * CCNet picks its perplexity cutoffs. */
  def unigramLm(docs: DataFrame, trainLang: String = "en",
                headTh: Double = -3.400, midTh: Double = -3.407): DataFrame = {
    require(headTh >= midTh, "unigramLm: headTh must be >= midTh")
    val vocab = docs.filter(col("lang") === trainLang)
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).cast(LongType).as("c"))
    val stats = vocab.agg(sum(col("c")).cast(LongType).as("n"),
      count(lit(1)).cast(LongType).as("v"))
    val toks = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("w"))
      .select(col("doc_id"), size(col("w")).cast(LongType).as("dl"),
        explode(col("w")).as("tok"))
    val scored = toks
      .join(vocab, Seq("tok"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("lp", lp6(coalesce(col("c"), lit(0L)), col("n"), col("v")))
    scored.groupBy("doc_id", "dl")
      .agg(graft.util.D.dsumd(col("lp")).as("s"))
      .select(col("doc_id"), col("dl").as("n_tokens"),
        graft.util.D.r(col("s") / col("dl").cast(DoubleType), 6).as("lp_per_tok"))
      .withColumn("bucket",
        when(col("lp_per_tok") >= headTh, "head")
          .when(col("lp_per_tok") >= midTh, "middle")
          .otherwise("tail"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[unigramLm]]. */
  def unigramLmSql(table: String, trainLang: String = "en",
                   headTh: Double = -3.400, midTh: Double = -3.407): String = {
    val toks = TextOps.tokensSql("text")
    s"""WITH toks_tr AS (
       |  SELECT unnest($toks) AS tok FROM $table WHERE lang = '$trainLang'),
       |vocab AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks_tr GROUP BY tok),
       |stats AS (SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
       |toks AS (
       |  SELECT doc_id, CAST(len($toks) AS BIGINT) AS dl, unnest($toks) AS tok
       |  FROM $table),
       |scored AS (
       |  SELECT t.doc_id, t.dl,
       |    ROUND(LN(CAST(COALESCE(v.c, 0) + 1 AS DOUBLE) / CAST(s.n + s.v AS DOUBLE)), 6) AS lp
       |  FROM toks t LEFT JOIN vocab v ON t.tok = v.tok CROSS JOIN stats s),
       |agg AS (
       |  SELECT doc_id, dl AS n_tokens,
       |    ROUND(CAST(CAST(SUM(CAST(lp AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE)
       |      / CAST(dl AS DOUBLE), 6) AS lp_per_tok
       |  FROM scored GROUP BY doc_id, dl)
       |SELECT doc_id, n_tokens, lp_per_tok,
       |  CASE WHEN lp_per_tok >= $headTh THEN 'head'
       |       WHEN lp_per_tok >= $midTh THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM agg ORDER BY doc_id""".stripMargin
  }

  /** Per-language CCNet bucketing — the reference pipeline's actual
    * shape (CCNet trains one KenLM per language): a separate
    * Laplace-smoothed unigram LM per `lang`, each document scored
    * under ITS OWN language's model, bucketed at shared thresholds.
    * Same determinism contract as [[unigramLm]]; the vocab join keys
    * on (lang, tok) and the per-lang stats table is
    * language-cardinality-sized (broadcast). Returns
    * (doc_id, lang, n_tokens, lp_per_tok, bucket) ordered by doc_id. */
  def unigramLmByLang(docs: DataFrame,
                      headTh: Double = -3.396, midTh: Double = -3.406): DataFrame = {
    require(headTh >= midTh, "unigramLmByLang: headTh must be >= midTh")
    val vocab = docs
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).cast(LongType).as("c"))
    val stats = vocab.groupBy("lang").agg(sum(col("c")).cast(LongType).as("n"),
      count(lit(1)).cast(LongType).as("v"))
    val toks = docs
      .select(col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("w"))
      .select(col("doc_id"), col("lang"), size(col("w")).cast(LongType).as("dl"),
        explode(col("w")).as("tok"))
    val scored = toks
      .join(vocab, Seq("lang", "tok"), "left")
      .join(broadcast(stats), Seq("lang"))
      .withColumn("lp", lp6(coalesce(col("c"), lit(0L)), col("n"), col("v")))
    scored.groupBy("doc_id", "lang", "dl")
      .agg(graft.util.D.dsumd(col("lp")).as("s"))
      .select(col("doc_id"), col("lang"), col("dl").as("n_tokens"),
        graft.util.D.r(col("s") / col("dl").cast(DoubleType), 6).as("lp_per_tok"))
      .withColumn("bucket",
        when(col("lp_per_tok") >= headTh, "head")
          .when(col("lp_per_tok") >= midTh, "middle")
          .otherwise("tail"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[unigramLmByLang]]. */
  def unigramLmByLangSql(table: String,
                         headTh: Double = -3.396, midTh: Double = -3.406): String = {
    val toks = TextOps.tokensSql("text")
    s"""WITH toks_tr AS (
       |  SELECT lang, unnest($toks) AS tok FROM $table),
       |vocab AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks_tr GROUP BY lang, tok),
       |stats AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v
       |  FROM vocab GROUP BY lang),
       |toks AS (
       |  SELECT doc_id, lang, CAST(len($toks) AS BIGINT) AS dl, unnest($toks) AS tok
       |  FROM $table),
       |scored AS (
       |  SELECT t.doc_id, t.lang, t.dl,
       |    ROUND(LN(CAST(COALESCE(v.c, 0) + 1 AS DOUBLE) / CAST(s.n + s.v AS DOUBLE)), 6) AS lp
       |  FROM toks t
       |  LEFT JOIN vocab v ON t.lang = v.lang AND t.tok = v.tok
       |  JOIN stats s ON t.lang = s.lang),
       |agg AS (
       |  SELECT doc_id, lang, dl AS n_tokens,
       |    ROUND(CAST(CAST(SUM(CAST(lp AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE)
       |      / CAST(dl AS DOUBLE), 6) AS lp_per_tok
       |  FROM scored GROUP BY doc_id, lang, dl)
       |SELECT doc_id, lang, n_tokens, lp_per_tok,
       |  CASE WHEN lp_per_tok >= $headTh THEN 'head'
       |       WHEN lp_per_tok >= $midTh THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM agg ORDER BY doc_id""".stripMargin
  }

  /** Interpolated bigram LM scoring — the higher-order form of
    * [[unigramLm]] (CCNet's actual filter is a 5-gram KenLM; a
    * Jelinek-Mercer-interpolated bigram is the smallest model with the
    * same structure: context-conditional ML estimates smoothed by a
    * lower order). Trained on the `lang = trainLang` slice:
    * p(w2|w1) = λ·c(w1 w2)/c(w1) + (1−λ)·(c(w2)+1)/(N+V) — the ML
    * bigram term (0 when w1 is unseen) interpolated with the same
    * Laplace unigram [[unigramLm]] uses, so every transition has
    * positive mass. Each doc is scored by its mean per-transition
    * log-probability over consecutive token pairs; docs with fewer
    * than 2 tokens have no transitions and are omitted (documented
    * contract — the rule-based length filters upstream of any LM
    * filter already drop them). Returns (doc_id, n_bigrams,
    * lp_per_big, bucket) ordered by doc_id.
    *
    * Determinism: per-transition logs rounded 6dp before the exact
    * DECIMAL sum (the [[lp6]] contract); the interpolation arithmetic
    * is IEEE double on identical long operands in both engines, and
    * both compute `1.0 − λ` as a double subtraction of the same
    * literals.
    *
    * Scale (100 TB): training aggregations are reference-slice-sized
    * (CCNet trains on Wikipedia, not the corpus being scored); bigrams
    * come from the native one-pass [[graft.functions.WordNgrams]] (no
    * interpreted HOF, no re-split — see Vocab.bpePairs). The corpus
    * side explodes transitions once, its three model joins are
    * reference-sized (left to AQE to broadcast), and the per-doc
    * aggregation is the single corpus-cardinality shuffle. */
  def bigramLm(docs: DataFrame, trainLang: String = "en", lam: Double = 0.9,
               headTh: Double = -3.393, midTh: Double = -3.443): DataFrame = {
    require(lam > 0 && lam < 1, "bigramLm: lambda must be in (0, 1)")
    require(headTh >= midTh, "bigramLm: headTh must be >= midTh")
    val tr = docs.filter(col("lang") === trainLang)
    val uni = tr.select(explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).cast(LongType).as("cu"))
    val stats = uni.agg(sum(col("cu")).cast(LongType).as("n"),
      count(lit(1)).cast(LongType).as("v"))
    val big = tr.select(explode(graft.functions.WordNgrams(col("text"), 2)).as("big"))
      .groupBy("big").agg(count(lit(1)).cast(LongType).as("cb"))
    val trans = docs
      .select(col("doc_id"), explode(graft.functions.WordNgrams(col("text"), 2)).as("big"))
      .withColumn("w1", substring_index(col("big"), " ", 1))
      .withColumn("w2", substring_index(col("big"), " ", -1))
    val scored = trans
      .join(big, Seq("big"), "left")
      .join(uni.select(col("tok").as("w1"), col("cu").as("cu1")), Seq("w1"), "left")
      .join(uni.select(col("tok").as("w2"), col("cu").as("cu2")), Seq("w2"), "left")
      .crossJoin(broadcast(stats))
      .withColumn("lp", graft.util.D.r(log(
        lit(lam) * when(col("cu1").isNotNull && col("cu1") > 0,
          coalesce(col("cb"), lit(0L)).cast(DoubleType) / col("cu1").cast(DoubleType))
          .otherwise(lit(0.0)) +
        lit(1.0 - lam) * (coalesce(col("cu2"), lit(0L)) + lit(1L)).cast(DoubleType) /
          (col("n") + col("v")).cast(DoubleType)), 6))
    scored.groupBy("doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_bigrams"),
        graft.util.D.dsumd(col("lp")).as("s"))
      .select(col("doc_id"), col("n_bigrams"),
        graft.util.D.r(col("s") / col("n_bigrams").cast(DoubleType), 6).as("lp_per_big"))
      .withColumn("bucket",
        when(col("lp_per_big") >= headTh, "head")
          .when(col("lp_per_big") >= midTh, "middle")
          .otherwise("tail"))
      .orderBy("doc_id")
  }

  /** DuckDB mirror of [[bigramLm]]. */
  def bigramLmSql(table: String, trainLang: String = "en", lam: Double = 0.9,
                  headTh: Double = -3.393, midTh: Double = -3.443): String = {
    val toks = TextOps.tokensSql("text")
    val bigs = s"list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])"
    s"""WITH uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS cu
       |  FROM (SELECT unnest($toks) AS tok FROM $table WHERE lang = '$trainLang') GROUP BY tok),
       |stats AS (SELECT CAST(SUM(cu) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v FROM uni),
       |big AS (SELECT big, CAST(COUNT(*) AS BIGINT) AS cb
       |  FROM (SELECT unnest($bigs) AS big
       |        FROM (SELECT $toks AS w FROM $table WHERE lang = '$trainLang')) GROUP BY big),
       |trans AS (SELECT doc_id, unnest($bigs) AS big
       |  FROM (SELECT doc_id, $toks AS w FROM $table)),
       |scored AS (
       |  SELECT t.doc_id,
       |    ROUND(LN($lam * (CASE WHEN u1.cu IS NOT NULL AND u1.cu > 0
       |        THEN CAST(COALESCE(b.cb, 0) AS DOUBLE) / CAST(u1.cu AS DOUBLE) ELSE 0.0 END)
       |      + (1.0 - $lam) * CAST(COALESCE(u2.cu, 0) + 1 AS DOUBLE) / CAST(s.n + s.v AS DOUBLE)), 6) AS lp
       |  FROM trans t
       |  LEFT JOIN big b ON t.big = b.big
       |  LEFT JOIN uni u1 ON split_part(t.big, ' ', 1) = u1.tok
       |  LEFT JOIN uni u2 ON split_part(t.big, ' ', 2) = u2.tok
       |  CROSS JOIN stats s),
       |agg AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       |    ROUND(CAST(CAST(SUM(CAST(lp AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS DOUBLE)
       |      / CAST(COUNT(*) AS DOUBLE), 6) AS lp_per_big
       |  FROM scored GROUP BY doc_id)
       |SELECT doc_id, n_bigrams, lp_per_big,
       |  CASE WHEN lp_per_big >= $headTh THEN 'head'
       |       WHEN lp_per_big >= $midTh THEN 'middle'
       |       ELSE 'tail' END AS bucket
       |FROM agg ORDER BY doc_id""".stripMargin
  }

  /** The trained unigram LM folded to ONE broadcastable row
    * (lp: map token → 6dp log-prob, lp_oov: the smoothing mass) — the
    * deployable form of [[unigramLm]]'s model for scoring OUTSIDE the
    * training job: other batches, or a stream (see [[scoreUnigram]]).
    * Reference-slice-sized by the same contract as unigramLm. */
  def unigramModel(train: DataFrame, trainLang: String = "en"): DataFrame = {
    val vocab = train.filter(col("lang") === trainLang)
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).cast(LongType).as("c"))
    val stats = vocab.agg(sum(col("c")).cast(LongType).as("n"),
      count(lit(1)).cast(LongType).as("v"))
    vocab.crossJoin(broadcast(stats))
      .select(col("tok"), lp6(col("c"), col("n"), col("v")).as("lp"),
        lp6(lit(0L), col("n"), col("v")).as("lp_oov"))
      .groupBy()
      .agg(map_from_arrays(collect_list(col("tok")), collect_list(col("lp"))).as("lp"),
        min(col("lp_oov")).as("lp_oov"))
  }

  /** Stateless per-row scoring against a folded [[unigramModel]]:
    * each document's tokens fold into an exact DECIMAL accumulator
    * (decimal addition is associative, so the sequential array fold
    * equals [[unigramLm]]'s hash-aggregated decimal sum bit-for-bit —
    * StreamingSpec asserts the parity). No shuffle, no state — runs
    * unchanged on a stream with the model as the static broadcast
    * side. Returns (doc_id, n_tokens, lp_per_tok). */
  def scoreUnigram(docs: DataFrame, model: DataFrame): DataFrame = {
    val zero = lit(BigDecimal(0)).cast(graft.util.D.dec25)
    docs.crossJoin(broadcast(model))
      .select(col("doc_id"), TextOps.tokens(col("text")).as("w"),
        col("lp"), col("lp_oov"))
      .select(col("doc_id"), size(col("w")).cast(LongType).as("n_tokens"),
        graft.util.D.r(
          aggregate(col("w"), zero,
            (acc, t) => (acc + coalesce(element_at(col("lp"), t), col("lp_oov"))
              .cast(graft.util.D.dec25)).cast(graft.util.D.dec25))
            .cast(DoubleType) / size(col("w")).cast(DoubleType), 6)
          .as("lp_per_tok"))
  }

  /** Token → feature bucket: first 60 bits of md5 mod `buckets` —
    * non-negative, so `%` and `pmod` agree. Same hash family as
    * Corpus.hashFrac (one spelling per coin, shared mirror). */
  private def bucketOf(tok: Column, buckets: Int): Column =
    conv(substring(md5(tok.cast(BinaryType)), 1, 15), 16, 10)
      .cast(LongType) % buckets

  private def bucketOfSql(tok: String, buckets: Int): String =
    s"('0x' || substr(md5($tok), 1, 15))::BIGINT % $buckets"

  /** DSIR importance resampling (Xie et al. 2023): documents are
    * featurized as hashed-unigram counts over `buckets` buckets, the
    * target distribution is estimated from the `lang = targetLang`
    * slice and the raw distribution from the whole corpus (both
    * Laplace-smoothed), each document gets the log importance weight
    * log w = Σ_tokens (log p_target[b] − log p_raw[b]), and the top-k
    * selection draws WITHOUT replacement via deterministic Gumbel
    * top-k — key = log w + Gumbel(md5-coin) — so reruns and both
    * engines pick the identical sample. Returns
    * (rank, doc_id, n_tokens, log_weight, key) for the k selected
    * docs, best key first. */
  def dsir(docs: DataFrame, targetLang: String = "en",
           buckets: Int = 256, k: Int = 50): DataFrame = {
    require(buckets > 0 && k > 0, "dsir: buckets and k must be positive")
    // ONE tokenize + explode + shuffle: the per-(doc, bucket) count
    // table. All three consumers below (target counts, raw counts,
    // scoring join) hang off this same aggregate, so the corpus is
    // scanned once and the exchange is reused, not recomputed.
    // the explicit isnotnull(b) pin is the semdedup subtree-identity
    // trick: the scoring join below INFERS isnotnull on its join key
    // and pushes it into its copy of this subtree, while the dist
    // consumer doesn't — without the pin the two copies never
    // canonicalize equal and the corpus tokenize-aggregate runs TWICE
    // (b is never null, so the filter is semantically free)
    val g = docs
      .select(col("doc_id"), col("lang"), TextOps.tokens(col("text")).as("w"))
      .select(col("doc_id"), col("lang"), size(col("w")).cast(LongType).as("dl"),
        explode(col("w")).as("tok"))
      .withColumn("b", bucketOf(col("tok"), buckets))
      .filter(col("b").isNotNull)
      .groupBy("doc_id", "lang", "dl", "b")
      .agg(count(lit(1)).cast(LongType).as("tf"))
    // BOTH distributions from ONE re-aggregation of g: the earlier
    // filtered-branch form (tc = g.filter(lang = target).groupBy(b))
    // let Catalyst push the lang predicate below g's aggregate into the
    // scan, SPECIALIZING that subtree — no longer identical to g, so
    // runtime exchange reuse failed and the final adaptive plan ran the
    // corpus tokenize-aggregate FOUR times (the tfidf/semdedup
    // pushdown-defeats-reuse failure mode; found profiling the sf1
    // floor). The conditional sum keeps every consumer on the identical
    // g subtree: one corpus aggregate, reused. A bucket with no
    // target-slice tokens has tc NULL (sum over no rows) — coalesce(0)
    // below preserves the old left-join + smoothing-mass semantics
    // bit-for-bit.
    val dist = g.groupBy("b").agg(
      sum(col("tf")).cast(LongType).as("rc"),
      sum(when(col("lang") === targetLang, col("tf"))).cast(LongType).as("tc"))
    // global masses via an unpartitioned window over dist — dist is
    // bucket-bounded (≤ `buckets` rows, a fixed parameter) so the
    // single-reducer frame holds ≤ 256 rows; a separate dist.agg()
    // branch measured as a THIRD corpus aggregate (its g subtree
    // missed AQE stage reuse), where this form keeps g at exactly two
    // consumers (scoring join + dist), which reuse to one computation.
    // ScaleSpec's unpartitioned-window pin allowlists exactly this
    // bucket-grouped shape.
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val delta = dist
      .select(col("b"), col("rc"), col("tc"),
        sum(col("rc")).over(wAll).as("rn"), sum(col("tc")).over(wAll).as("tn"))
      .select(col("b"),
        (lp6(coalesce(col("tc"), lit(0L)), col("tn"), lit(buckets.toLong)) -
          lp6(col("rc"), col("rn"), lit(buckets.toLong))).as("d"))
    // Σ_tokens d = tf · d exactly: d is an exact 6-decimal value, so
    // the scale-12 product equals the per-token decimal sum bit-for-bit
    val logw = g
      .join(broadcast(delta), Seq("b"))
      .groupBy("doc_id", "dl")
      .agg(graft.util.D.dsumprod(col("tf").cast(DoubleType), col("d")).as("lw"))
    val keyed = logw.select(col("doc_id"), col("dl").as("n_tokens"),
      col("lw").as("log_weight"),
      (col("lw") + graft.util.D.r(
        -log(-log(Corpus.hashFrac(col("doc_id")))), 6)).as("key"))
    val top = keyed.orderBy(col("key").desc, col("doc_id")).limit(k)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("key").desc, col("doc_id")))
          .cast(LongType))
      .select("rank", "doc_id", "n_tokens", "log_weight", "key")
      .orderBy("rank")
  }

  /** DuckDB mirror of [[dsir]]. */
  def dsirSql(table: String, targetLang: String = "en",
              buckets: Int = 256, k: Int = 50): String = {
    val toks = TextOps.tokensSql("text")
    val b = bucketOfSql("tok", buckets)
    val coin = Corpus.hashFracSql("doc_id")
    s"""WITH g AS (
       |  SELECT doc_id, lang, CAST(len($toks) AS BIGINT) AS dl,
       |    $b AS b, CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, lang, text, unnest($toks) AS tok FROM $table)
       |  GROUP BY doc_id, lang, dl, b),
       |tc AS (SELECT b, CAST(SUM(tf) AS BIGINT) AS tc FROM g WHERE lang = '$targetLang' GROUP BY b),
       |rc AS (SELECT b, CAST(SUM(tf) AS BIGINT) AS rc FROM g GROUP BY b),
       |tn AS (SELECT CAST(SUM(tc) AS BIGINT) AS tn FROM tc),
       |rn AS (SELECT CAST(SUM(rc) AS BIGINT) AS rn FROM rc),
       |delta AS (
       |  SELECT r.b,
       |    ROUND(LN(CAST(COALESCE(t.tc, 0) + 1 AS DOUBLE) / CAST(tn.tn + $buckets AS DOUBLE)), 6)
       |    - ROUND(LN(CAST(r.rc + 1 AS DOUBLE) / CAST(rn.rn + $buckets AS DOUBLE)), 6) AS d
       |  FROM rc r LEFT JOIN tc t ON r.b = t.b CROSS JOIN tn CROSS JOIN rn),
       |logw AS (
       |  SELECT g.doc_id, g.dl,
       |    CAST(ROUND(SUM(CAST(g.tf AS DECIMAL(18,6)) * CAST(d.d AS DECIMAL(18,6))), 6) AS DOUBLE) AS lw
       |  FROM g JOIN delta d ON g.b = d.b GROUP BY g.doc_id, g.dl),
       |keyed AS (
       |  SELECT doc_id, dl AS n_tokens, lw AS log_weight,
       |    lw + ROUND(-LN(-LN($coin)), 6) AS key
       |  FROM logw)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY key DESC, doc_id) AS BIGINT) AS rank,
       |  doc_id, n_tokens, log_weight, key
       |FROM keyed ORDER BY key DESC, doc_id LIMIT $k""".stripMargin
  }
}
