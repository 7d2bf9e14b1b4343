package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The native-expression SQL surface: one builder list, two registration
  * paths.
  *
  *  - [[GraftFunctions.register]] installs the functions into an existing
  *    session's FunctionRegistry (temp functions — the notebook/test path).
  *  - [[GraftExtensions]] is a `SparkSessionExtensions` injector for
  *    cluster-wide deployment: `--conf spark.sql.extensions=
  *    graft.functions.GraftExtensions` makes every session on the cluster
  *    (including ones the library never touches directly, e.g. a Thrift
  *    server) resolve the same functions at analysis time — the idiomatic
  *    Spark mechanism, no session-by-session setup call required.
  *
  * Both paths share the SAME builders, so SQL behavior cannot drift
  * between a locally-registered session and an extensions-configured one.
  */
object GraftFunctions {

  private type Builder = Seq[Expression] => Expression

  /** Every registration validates arity: a silently-ignored extra
    * argument (e.g. a user passing a delimiter to a unary function)
    * would return a wrong answer instead of a loud analysis error. */
  private def arity(name: String, n: Int, exprs: Seq[Expression]): Unit =
    if (exprs.length != n) throw new IllegalArgumentException(
      s"$name takes exactly $n argument${if (n == 1) "" else "s"}, got ${exprs.length}")

  /** Extract a constant (foldable) integer argument — the contract shared
    * by `kmin`'s k and `word_ngrams`' n. */
  private def constInt(fn: String, arg: String, e: Expression): Int = e match {
    case c if c.foldable => c.eval() match {
      case v: Int => v
      case v: Long if v.isValidInt => v.toInt
      case v: Short => v.toInt
      case v: Byte => v.toInt
      case other => throw new IllegalArgumentException(
        s"$fn: $arg must be a constant integer (got $other)")
    }
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a constant integer expression, got $other")
  }

  /** (name, implementing class, builder) for every SQL-exposed native
    * expression. The class name feeds ExpressionInfo so `DESCRIBE
    * FUNCTION` points at the real implementation. */
  private[functions] val descriptions: Seq[(String, Class[_], Builder)] = Seq(
    ("cosine_similarity", classOf[CosineSimilarity],
      (exprs: Seq[Expression]) => { arity("cosine_similarity(a, b)", 2, exprs)
        CosineSimilarity(exprs(0), exprs(1)) }),
    ("fixed_dot", classOf[FixedDot],
      (exprs: Seq[Expression]) => { arity("fixed_dot(a, b)", 2, exprs)
        FixedDot(exprs(0), exprs(1)) }),
    // one-pass corpus-prep text ops (bit-identical to their regex chains)
    ("ascii_normalize", classOf[AsciiNormalize],
      (exprs: Seq[Expression]) => { arity("ascii_normalize(s)", 1, exprs)
        AsciiNormalize(exprs(0)) }),
    ("stripped_count", classOf[StrippedCount],
      (exprs: Seq[Expression]) => { arity("stripped_count(s)", 1, exprs)
        StrippedCount(exprs(0)) }),
    // one-pass signature ops (bit-identical to their HOF chains)
    ("word_shingles", classOf[WordShingles],
      (exprs: Seq[Expression]) => { arity("word_shingles(s)", 1, exprs)
        WordShingles(exprs(0)) }),
    ("shingle_hashes", classOf[ShingleHashes],
      (exprs: Seq[Expression]) => { arity("shingle_hashes(s)", 1, exprs)
        ShingleHashes(exprs(0)) }),
    ("simhash60", classOf[SimHash60],
      (exprs: Seq[Expression]) => { arity("simhash60(s)", 1, exprs)
        SimHash60(exprs(0)) }),
    ("fixed_scale", classOf[FixedScale],
      (exprs: Seq[Expression]) => { arity("fixed_scale(arr)", 1, exprs)
        FixedScale(exprs(0)) }),
    // argmax_by(id, score): hash-aggregable argmax (id of the max score,
    // ties to the smallest id) — the aggregate the Column API's IVF
    // centroid assignment uses; registered so SQL users get the
    // ObjectHashAggregate plan instead of max_by's SortAggregate.
    ("argmax_by", classOf[ArgMaxBy],
      (exprs: Seq[Expression]) => { arity("argmax_by(id, score)", 2, exprs)
        ArgMaxBy(exprs(0), exprs(1)).toAggregateExpression() }),
    // one-pass language-signal ops (bit-identical to their HOF/regex forms)
    ("cjk_count", classOf[CjkCount],
      (exprs: Seq[Expression]) => { arity("cjk_count(s)", 1, exprs)
        CjkCount(exprs(0)) }),
    ("alpha_tokens", classOf[AlphaTokens],
      (exprs: Seq[Expression]) => { arity("alpha_tokens(s)", 1, exprs)
        AlphaTokens(exprs(0)) }),
    // stop_hits(text, lang): lang must be a constant string from the
    // known language set (validated in the StopHits constructor)
    ("stop_hits", classOf[StopHits],
      (exprs: Seq[Expression]) => {
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
        StopHits(exprs(0), lang) }),
    // word_ngrams(s, n): native one-pass word n-gram shingles (the
    // parameterized WordShingles) — n must be a constant integral
    // expression, same contract as kmin's k.
    ("word_ngrams", classOf[WordNgrams],
      (exprs: Seq[Expression]) => {
        arity("word_ngrams(s, n)", 2, exprs)
        val n = constInt("word_ngrams(s, n)", "n", exprs(1))
        if (n < 1) throw new IllegalArgumentException(
          s"word_ngrams(s, n): n must be >= 1, got $n")
        WordNgrams(exprs.head, n) }),
    // kmin(col, k): bounded k-minimum-values sketch aggregate; k must be
    // a constant (foldable) integral expression — INT or BIGINT literal,
    // a CAST of one, etc. Positivity is validated in ONE place,
    // KMinAgg.checkInputDataTypes, at analysis time.
    ("kmin", classOf[KMinAgg],
      (exprs: Seq[Expression]) => {
        arity("kmin(col, k)", 2, exprs)
        val k = constInt("kmin(col, k)", "k", exprs(1))
        KMinAgg(exprs.head, k).toAggregateExpression() }),
    // mask_pair_count(mask, width): triangular pair co-occurrence counts
    // over set-bitmask rows (basket mining k=2 kernel); width must be a
    // constant integer in [1, 63] — validated in the constructor.
    ("mask_pair_count", classOf[MaskPairCountAgg],
      (exprs: Seq[Expression]) => {
        arity("mask_pair_count(mask, width)", 2, exprs)
        val w = constInt("mask_pair_count(mask, width)", "width", exprs(1))
        MaskPairCountAgg(exprs.head, w).toAggregateExpression() })
  )

  /** Registers the native expressions in the session's FunctionRegistry so
    * they are usable from `spark.sql(...)` alongside the Column API. */
  def register(spark: SparkSession): Unit = {
    val fr = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    descriptions.foreach { case (name, _, builder) =>
      fr.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}

/** Cluster-wide injector: `spark.sql.extensions=graft.functions.GraftExtensions`.
  * Injected functions live in the shared function registry every new
  * session inherits — unlike [[GraftFunctions.register]]'s temp functions,
  * they survive `spark.newSession()` and appear in `SHOW FUNCTIONS`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptions.foreach { case (name, cls, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(cls.getCanonicalName, name), builder))
    }
}
