package graft.text

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Merges a [[bpeFit]] run learns. A def (read during `defs` init). */
  private[graft] def BpeFitMerges = 8

  /** Spaced-symbol encoding of a word: each character wrapped as
    * ` c ` and concatenated, so adjacent symbols are separated by TWO
    * spaces and the ends carry one — `"abc"` → `" a  b  c "`. The
    * double separator is the merge-rewrite trick: the pattern
    * `" l  r "` carries its OWN boundary characters, so consecutive
    * merge sites share no bytes and a plain left-to-right
    * non-overlapping `replace` (identical scan semantics in Spark's
    * UTF8String.replace and DuckDB's replace) rewrites `a a a a` →
    * `aa aa`, matching canonical leftmost-first BPE merging. Symbols
    * never contain spaces (words are space-split), so the encoding is
    * unambiguous at every round. */
  private def bpeEncode(word: Column): Column =
    regexp_replace(word, "(.)", " $1 ")

  /** BPE TRAINER LOOP (Sennrich et al. 2016, "Neural Machine
    * Translation of Rare Words with Subword Units", alg. 1): learn the
    * first `merges` merge rules over the corpus — per round, count
    * adjacent-symbol pairs weighted by word frequency, take the argmax
    * (ties to the lexicographically smaller pair), rewrite every word,
    * repeat. Output: the ordered merge table
    * (merge_rank, lhs, rhs, merged, n) — the artifact a subword
    * tokenizer ships, completing the story q_bpe_pairs (single
    * merge-candidate scan), q_vocab_build, q_vocab_coverage and
    * q_tok_fertility surround. Cf. reference utils text-prep scope;
    * the trainer itself is standard public knowledge.
    *
    * Scale (100 TB): the corpus is reduced ONCE — a single
    * map-side-combined (word → freq) aggregation; every training round
    * runs on the WORD TABLE (type-cardinality, ≪ corpus — Heaps' law),
    * never rescans documents. The loop follows the kmeansFit/pagerankFit
    * convention: the word table stays a DataFrame with
    * `localCheckpoint`-bounded lineage per round; only the 1-row argmax
    * reaches the driver (a bounded scalar collect), which then enters
    * the next round's plan as a LITERAL replace — codegen'd, no UDF, no
    * join. Rounds are a fixed `merges` count, so the plan depth is
    * bounded by construction. HOF lambdas appear only on the word table
    * (array zip of adjacent symbols), never in the corpus scan.
    *
    * Words containing astral-plane codepoints are excluded on both
    * engines (documented contract): Java regex `.` walks UTF-16 code
    * units while RE2 walks codepoints, so surrogate pairs would encode
    * differently — the standard BPE answer is byte-level fallback,
    * out of scope for this word-level trainer. */
  /** Fail-fast bound on the collected word-frequency table (distinct
    * corpus words — Heaps-law sublinear in corpus size; at 4M entries
    * the trainer state is ~hundreds of MB and a bigger vocabulary means
    * the tokenizer should train on a word-count SAMPLE anyway). Mutable
    * for callers who knowingly train on a larger universe. Declared Int
    * (not Long): the bound feeds `.limit(...)`, whose argument is an Int,
    * and the driver-side collect can't hold >2^31 rows anyway — a Long
    * here would silently overflow at `.toInt`. */
  @volatile var MaxTrainWords: Int = 4000000

  def bpeFit(docs: DataFrame, merges: Int = BpeFitMerges): DataFrame = {
    require(merges > 0, "bpeFit: merges must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    // The DISTRIBUTED part is the corpus reduction to the word-frequency
    // table (one scan, map-side combined). The merge LOOP then runs on
    // that table DRIVER-SIDE — the production BPE-trainer shape
    // (Sennrich et al. 2016; HF trainers do exactly this): the table is
    // vocabulary-bounded (fail-fast at MaxTrainWords), and k sequential
    // merges over it are pure in-memory rescans, so the loop costs zero
    // Spark jobs instead of 2 jobs + a checkpoint per merge (measured
    // 1.7 s → ~0.4 s at sf1 for the default 8 merges).
    // clamp before the +1 sentinel: a caller who sets MaxTrainWords to
    // Int.MaxValue ("train on the full universe") must get the largest
    // representable limit, not an Int overflow into a negative .limit()
    // (which Spark rejects with an AnalysisException)
    val maxWords = math.min(MaxTrainWords, Int.MaxValue - 1)
    val collected = docs
      .select(explode(TextOps.tokens(col("text"))).as("word"))
      .filter(length(col("word")) > 0 && !col("word").rlike("[\\uD800-\\uDFFF]"))
      .groupBy("word").agg(count(lit(1)).cast(LongType).as("freq"))
      .select(bpeEncode(col("word")).as("enc"), col("freq"))
      .limit(maxWords + 1)
      .collect()
    if (collected.length > maxWords) throw new IllegalStateException(
      s"bpeFit: word-frequency table exceeds $maxWords distinct words — " +
        "train on a word-count sample, or raise graft.text.Vocab.MaxTrainWords " +
        "if the vocabulary size is intentional.")
    // encoded form: symbols separated by DOUBLE space, padded — split on
    // "  " after trim, exactly the distributed form's parsing
    val words: Array[(Array[String], Long)] =
      collected.map(r => (r.getString(0).trim.split("  "), r.getLong(1)))
    val learned = Seq.newBuilder[(Long, String, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= merges && !exhausted) {
      val counts = new java.util.HashMap[(String, String), java.lang.Long]()
      words.foreach { case (syms, freq) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          val cur = counts.get(k)
          counts.put(k, if (cur == null) freq else cur + freq)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true // corpus smaller than the merge budget
      else {
        // deterministic pick: max n, then (lhs, rhs) ascending — the
        // same tie-break the distributed orderBy used
        var best: ((String, String), Long) = null
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val c = (e.getKey, e.getValue.longValue())
          if (best == null || c._2 > best._2 ||
            (c._2 == best._2 && (c._1._1 < best._1._1 ||
              (c._1._1 == best._1._1 && c._1._2 < best._1._2)))) best = c
        }
        val ((l, r), n) = best
        learned += ((rank.toLong, l, r, l + r, n))
        val merged = l + r
        words.indices.foreach { wi =>
          val (syms, freq) = words(wi)
          var has = false
          var i = 0
          while (!has && i < syms.length - 1) {
            if (syms(i) == l && syms(i + 1) == r) has = true; i += 1
          }
          if (has) {
            val out = Array.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == l && syms(j + 1) == r) {
                out += merged; j += 2
              } else { out += syms(j); j += 1 }
            }
            words(wi) = (out.result(), freq)
          }
        }
        rank += 1
      }
    }
    learned.result()
      .toDF("merge_rank", "lhs", "rhs", "merged", "n")
      .orderBy("merge_rank")
  }

  /** DuckDB mirror of [[bpeFit]] — the identical loop UNROLLED into
    * `merges` CTE stages (pairs → argmax → literal-free rewrite via a
    * scalar subquery), since SQL has no driver. The coalesce-to-chr(1)
    * guard makes an exhausted round's rewrite a no-op instead of a
    * NULL poison (chr(1) cannot appear in space-split words). Every
    * stage is AS MATERIALIZED — DuckDB inlines plain CTEs, and each
    * round references its predecessor twice, so unmaterialized stages
    * would expand to 2^merges corpus scans (the Spark side's
    * localCheckpoint plays the same lineage-pinning role). */
  def bpeFitSql(table: String, merges: Int = BpeFitMerges): String = {
    val w = TextOps.tokensSql("text")
    val rounds = (0 until merges).map { i =>
      val pat = s"' ' || (SELECT lhs FROM b$i) || '  ' || (SELECT rhs FROM b$i) || ' '"
      val rep = s"' ' || (SELECT lhs FROM b$i) || (SELECT rhs FROM b$i) || ' '"
      s"""p$i AS MATERIALIZED (SELECT s[i] AS lhs, s[i+1] AS rhs,
         |    CAST(SUM(freq) AS BIGINT) AS n
         |  FROM (SELECT string_split(trim(enc), '  ') AS s, freq,
         |          unnest(range(1, len(string_split(trim(enc), '  ')))) AS i
         |        FROM w$i)
         |  GROUP BY 1, 2),
         |b$i AS MATERIALIZED (SELECT lhs, rhs, n FROM p$i
         |  ORDER BY n DESC, lhs, rhs LIMIT 1),
         |w${i + 1} AS MATERIALIZED (SELECT replace(enc,
         |    COALESCE($pat, chr(1)), COALESCE($rep, chr(1))) AS enc, freq
         |  FROM w$i)""".stripMargin
    }.mkString(",\n")
    val legs = (0 until merges).map(i =>
      s"SELECT ${i + 1} AS merge_rank, lhs, rhs, lhs || rhs AS merged, n FROM b$i")
      .mkString("\n  UNION ALL ")
    s"""WITH w0 AS MATERIALIZED (
       |  SELECT regexp_replace(word, '(.)', ' \\1 ', 'g') AS enc,
       |    CAST(COUNT(*) AS BIGINT) AS freq
       |  FROM (SELECT unnest($w) AS word FROM $table)
       |  WHERE strlen(word) > 0
       |    AND NOT regexp_matches(word, '[\\x{10000}-\\x{10FFFF}]')
       |  GROUP BY word),
       |$rounds
       |SELECT CAST(merge_rank AS BIGINT) AS merge_rank, lhs, rhs, merged, n
       |FROM ($legs)
       |ORDER BY merge_rank""".stripMargin
  }
}
