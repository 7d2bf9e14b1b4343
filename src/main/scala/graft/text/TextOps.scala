package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared text primitives for the LLM-pipeline operators (SURVEY.md
  * §2.3/§2.5). Each helper has a Spark Column form and an equivalent
  * DuckDB SQL form; both operate on single-space-separated text.
  *
  * All functions are built-in/codegen'd (split/transform/sequence/md5) —
  * no UDFs in the hot path. */
object TextOps {

  def tokens(c: Column): Column = split(c, " ")

  def tokensSql(c: String): String = s"string_split($c, ' ')"

  /** Word 3-gram shingles from a PRE-TOKENIZED array column (empty when
    * fewer than 3 tokens). `w` must be a bound attribute (materialize the
    * token array once per row with `.withColumn("w", tokens(col))`):
    * inside the `transform` lambda every subexpression is re-evaluated
    * per element, so referencing `split(text)` there re-splits the whole
    * text 3× per shingle — a ~10× slowdown measured on the corpus. */
  def shinglesOf(w: Column): Column =
    when(size(w) >= 3,
      transform(sequence(lit(1), size(w) - 2),
        i => concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Word 3-gram shingles straight from raw text — the native one-pass
    * form ([[graft.functions.WordShingles]]), bit-identical to
    * `shinglesOf(tokens(c))` but free of the interpreted HOF lambda.
    * This is the hot-path form; [[shinglesOf]] remains for callers that
    * already hold a token array. */
  def shingles(c: Column): Column = graft.functions.WordShingles(c)

  /** 60-bit md5-prefix hashes of the word-3-gram shingles, fused into
    * one native pass ([[graft.functions.ShingleHashes]]) — bit-identical
    * to `transform(shingles(c), s -> conv(substring(md5(s), 1, 15), 16,
    * 10) :: long)`, the hashed-signature form every dedup/sketch
    * consumer uses. */
  def shingleHashes(c: Column): Column = graft.functions.ShingleHashes(c)

  def shinglesSql(c: String): String = {
    val w = s"string_split($c, ' ')"
    s"list_transform(range(1, len($w) - 1), i -> $w[i] || ' ' || $w[i+1] || ' ' || $w[i+2])"
  }

  /** Stopword lists used by the language-ID heuristic (public common
    * function words; zh is detected via CJK codepoints instead). */
  val langWords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "ein", "zu", "auf", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pour", "dans", "un", "une", "sur"),
    "es" -> Seq("el", "los", "las", "y", "es", "para", "como", "un", "una", "con"))

  /** HOF form over a token array — kept as the parity reference for
    * [[langHitsText]]'s native expression. */
  def langHits(toks: Column, lang: String): Column =
    size(filter(toks, x => array_contains(array(langWords(lang).map(lit): _*), x)))

  /** Stopword hits straight from raw text — the native one-pass form
    * ([[graft.functions.StopHits]]), bit-identical to
    * `langHits(tokens(c), lang)` without the interpreted HOF lambda. */
  def langHitsText(c: Column, lang: String): Column =
    graft.functions.StopHits(c, lang)

  def langHitsSql(toksExpr: String, lang: String): String = {
    val lst = langWords(lang).map(w => s"'$w'").mkString("[", ", ", "]")
    s"len(list_filter($toksExpr, x -> list_contains($lst, x)))"
  }

  /** Count of CJK codepoints (zh signal) — native one-pass
    * ([[graft.functions.CjkCount]]), bit-identical to the former
    * `length(c) - length(regexp_replace(c, "[\\u4e00-\\u9fff]", ""))`. */
  def cjkCount(c: Column): Column = graft.functions.CjkCount(c)

  def cjkCountSql(c: String): String =
    s"len(regexp_extract_all($c, '[\\x{4e00}-\\x{9fff}]'))"

  /** Bag fingerprint: md5 of the sorted distinct token set. */
  /** NULL text → NULL fingerprint (concat_ws would silently fold a null
    * array into "", merging null-text docs with empty-text docs — the
    * SQL mirror's md5(NULL) keeps them distinct, so must we). */
  def bagFingerprint(c: Column): Column =
    when(c.isNull, lit(null).cast("string"))
      .otherwise(md5(concat_ws(" ", array_sort(array_distinct(tokens(c)))).cast(BinaryType)))

  def bagFingerprintSql(c: String): String =
    s"md5(array_to_string(list_sort(list_distinct(${tokensSql(c)})), ' '))"
}
