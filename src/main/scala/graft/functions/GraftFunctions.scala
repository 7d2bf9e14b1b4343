package graft.functions

import org.apache.spark.sql.SparkSession

/** Registers the native expressions in the session's FunctionRegistry so
  * they are usable from `spark.sql(...)` alongside the Column API. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val fr = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    // every registration validates arity: a silently-ignored extra
    // argument (e.g. a user passing a delimiter to a unary function)
    // would return a wrong answer instead of a loud analysis error
    def arity(name: String, n: Int, exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]): Unit =
      if (exprs.length != n) throw new IllegalArgumentException(
        s"$name takes exactly $n argument${if (n == 1) "" else "s"}, got ${exprs.length}")
    fr.createOrReplaceTempFunction("cosine_similarity",
      exprs => { arity("cosine_similarity(a, b)", 2, exprs)
        CosineSimilarity(exprs(0), exprs(1)) }, "built-in")
    fr.createOrReplaceTempFunction("fixed_dot",
      exprs => { arity("fixed_dot(a, b)", 2, exprs)
        FixedDot(exprs(0), exprs(1)) }, "built-in")
    // one-pass corpus-prep text ops (bit-identical to their regex chains)
    fr.createOrReplaceTempFunction("ascii_normalize",
      exprs => { arity("ascii_normalize(s)", 1, exprs)
        AsciiNormalize(exprs(0)) }, "built-in")
    fr.createOrReplaceTempFunction("stripped_count",
      exprs => { arity("stripped_count(s)", 1, exprs)
        StrippedCount(exprs(0)) }, "built-in")
    // one-pass signature ops (bit-identical to their HOF chains)
    fr.createOrReplaceTempFunction("word_shingles",
      exprs => { arity("word_shingles(s)", 1, exprs)
        WordShingles(exprs(0)) }, "built-in")
    fr.createOrReplaceTempFunction("shingle_hashes",
      exprs => { arity("shingle_hashes(s)", 1, exprs)
        ShingleHashes(exprs(0)) }, "built-in")
    fr.createOrReplaceTempFunction("simhash60",
      exprs => { arity("simhash60(s)", 1, exprs)
        SimHash60(exprs(0)) }, "built-in")
    fr.createOrReplaceTempFunction("fixed_scale",
      exprs => { arity("fixed_scale(arr)", 1, exprs)
        FixedScale(exprs(0)) }, "built-in")
    // argmax_by(id, score): hash-aggregable argmax (id of the max score,
    // ties to the smallest id) — the aggregate the Column API's IVF
    // centroid assignment uses; registered so SQL users get the
    // ObjectHashAggregate plan instead of max_by's SortAggregate.
    fr.createOrReplaceTempFunction("argmax_by",
      exprs => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"argmax_by(id, score) takes exactly 2 arguments, got ${exprs.length}")
        ArgMaxBy(exprs(0), exprs(1)).toAggregateExpression()
      }, "built-in")
    // one-pass language-signal ops (bit-identical to their HOF/regex forms)
    fr.createOrReplaceTempFunction("cjk_count",
      exprs => { arity("cjk_count(s)", 1, exprs)
        CjkCount(exprs(0)) }, "built-in")
    fr.createOrReplaceTempFunction("alpha_tokens",
      exprs => { arity("alpha_tokens(s)", 1, exprs)
        AlphaTokens(exprs(0)) }, "built-in")
    // stop_hits(text, lang): lang must be a constant string from the
    // known language set (validated in the StopHits constructor)
    fr.createOrReplaceTempFunction("stop_hits",
      exprs => {
        arity("stop_hits(text, lang)", 2, exprs)
        val lang = exprs(1) match {
          case e if e.foldable => e.eval() match {
            case s: org.apache.spark.unsafe.types.UTF8String => s.toString
            case other => throw new IllegalArgumentException(
              s"stop_hits(text, lang): lang must be a constant string (got $other)")
          }
          case other => throw new IllegalArgumentException(
            s"stop_hits(text, lang): lang must be a constant string expression, got $other")
        }
        StopHits(exprs(0), lang)
      }, "built-in")
    // word_ngrams(s, n): native one-pass word n-gram shingles (the
    // parameterized WordShingles) — n must be a constant integral
    // expression, same contract as kmin's k.
    fr.createOrReplaceTempFunction("word_ngrams",
      exprs => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"word_ngrams(s, n) takes exactly 2 arguments, got ${exprs.length}")
        val n = exprs(1) match {
          case e if e.foldable => e.eval() match {
            case v: Int => v
            case v: Long if v.isValidInt => v.toInt
            case v: Short => v.toInt
            case v: Byte => v.toInt
            case other => throw new IllegalArgumentException(
              s"word_ngrams(s, n): n must be a constant integer (got $other)")
          }
          case other => throw new IllegalArgumentException(
            s"word_ngrams(s, n): n must be a constant integer expression, got $other")
        }
        if (n < 1) throw new IllegalArgumentException(
          s"word_ngrams(s, n): n must be >= 1, got $n")
        WordNgrams(exprs.head, n)
      }, "built-in")
    // kmin(col, k): bounded k-minimum-values sketch aggregate; k must be
    // a constant (foldable) integral expression — INT or BIGINT literal,
    // a CAST of one, etc. Positivity is validated in ONE place,
    // KMinAgg.checkInputDataTypes, at analysis time.
    fr.createOrReplaceTempFunction("kmin",
      exprs => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"kmin(col, k) takes exactly 2 arguments, got ${exprs.length}")
        val k = exprs(1) match {
          case e if e.foldable => e.eval() match {
            case v: Int => v
            case v: Long if v.isValidInt => v.toInt
            case v: Short => v.toInt
            case v: Byte => v.toInt
            case other => throw new IllegalArgumentException(
              s"kmin(col, k): k must be a constant integer (got $other)")
          }
          case other => throw new IllegalArgumentException(
            s"kmin(col, k): k must be a constant integer expression, got $other")
        }
        KMinAgg(exprs.head, k).toAggregateExpression()
      }, "built-in")
  }
}
