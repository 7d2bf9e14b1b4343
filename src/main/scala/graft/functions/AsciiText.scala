package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native text normalization / scoring over UTF8String bytes.
  *
  * The corpus-prep queries normalize or score every document with
  * regex chains (`lower` → strip `[^a-z0-9 ]` → squeeze spaces → trim,
  * and the quality score's stripped-char count). Two regex passes per
  * document are a real constant at 100 TB — each builds an intermediate
  * string and walks a `java.util.regex` automaton per char. These
  * expressions do the same work in ONE branchy byte loop inside
  * whole-stage codegen, falling back — per row, only when a non-ASCII
  * byte appears — to the exact library chain semantics
  * (`UTF8String.toLowerCase`, the same method Spark's `Lower` calls,
  * plus `String.replaceAll`, which shares `Pattern` semantics with
  * `RegExpReplace`). Results are bit-identical to the regex chain on
  * ALL inputs; the fast path is just the ASCII specialization.
  * (Mirrors how [[FixedDot]] replaced interpreted lambda math.)
  */
object AsciiTextHelper {

  /** trim(regexp_replace(regexp_replace(lower(s), "[^a-z0-9 ]", ""), " +", " ")) */
  def norm(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    val in = s.getBytes
    val out = new Array[Byte](n)
    var o = 0
    var pend = false // a space is owed before the next kept char
    var i = 0
    while (i < n) {
      var b = in(i)
      if (b < 0) return normSlow(s) // non-ASCII byte: exact fallback
      if (b >= 'A' && b <= 'Z') b = (b + 32).toByte
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pend) { out(o) = ' '; o += 1; pend = false }
        out(o) = b
        o += 1
      } else if (b == ' ' && o > 0) pend = true
      // other ASCII chars are stripped; leading spaces never emit (trim)
      i += 1
    }
    UTF8String.fromBytes(out, 0, o) // trailing pend never flushes (trim)
  }

  private def normSlow(s: UTF8String): UTF8String = {
    // UTF8String.toLowerCase == Spark Lower; replaceAll == RegExpReplace
    // (same compiled Pattern, literal replacement); the final trim is
    // equal for StringTrim (0x20 only) and String.trim (<= 0x20) because
    // only [a-z0-9 ] survives the strip.
    UTF8String.fromString(s.toLowerCase.toString
      .replaceAll("[^a-z0-9 ]", "").replaceAll(" +", " ").trim)
  }

  /** length(s) - length(regexp_replace(s, "[^a-z0-9 ]", "")): the number
    * of codepoints outside [a-z0-9 ] (NO lowercasing — uppercase counts
    * as stripped, matching the quality score's oracle SQL exactly). */
  def strippedCount(s: UTF8String): Int = {
    val n = s.numBytes()
    val in = s.getBytes
    var cnt = 0
    var i = 0
    while (i < n) {
      val b = in(i)
      if (b < 0) return strippedCountSlow(s)
      if (!((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') || b == ' ')) cnt += 1
      i += 1
    }
    cnt
  }

  private def strippedCountSlow(s: UTF8String): Int = {
    // Java regex deletes per CODEPOINT, and Spark length() counts
    // codepoints, so the count is the per-codepoint class test.
    val str = s.toString
    var cnt = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (!((cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9') || cp == ' ')) cnt += 1
      i += Character.charCount(cp)
    }
    cnt
  }
}

/** One-pass language-signal counters (the langid/quality scans'
  * remaining interpreted steps): stopword hits ran as a
  * `size(filter(toks, x -> array_contains(...)))` HOF lambda per row,
  * and the CJK count as a full `regexp_replace` building a stripped
  * copy of every document. Both are single passes here. */
object LangSignalHelper {

  private val wordBytes: Map[String, Array[Array[Byte]]] =
    graft.text.TextOps.langWords.map { case (l, ws) =>
      l -> ws.map(_.getBytes("UTF-8")).toArray
    }

  /** Count of tokens (split on single spaces, empties included — they
    * match no stopword) byte-equal to any of `lang`'s stopwords. Equals
    * size(filter(split(s, " "), x -> array_contains(words, x))). */
  def stopHits(s: UTF8String, lang: String): Int = {
    val words = wordBytes(lang)
    val bytes = s.getBytes
    val n = bytes.length
    var cnt = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        val len = i - start
        var w = 0
        var hit = false
        while (!hit && w < words.length) {
          val wb = words(w)
          if (wb.length == len) {
            var j = 0
            while (j < len && bytes(start + j) == wb(j)) j += 1
            hit = j == len
          }
          w += 1
        }
        if (hit) cnt += 1
        start = i + 1
      }
      i += 1
    }
    cnt
  }

  /** Count of tokens (split on single spaces, empties included — they
    * contain no letter) containing at least one ASCII letter. Equals
    * `size(filter(split(s, " "), x -> x rlike "[a-zA-Z]"))` on ALL
    * inputs with no slow path: UTF-8 continuation/lead bytes are
    * >= 0x80, so a byte in [A-Z] or [a-z] is always a literal ASCII
    * letter. (Both cases count — the Gopher alpha-word rule asks for
    * "words containing an alphabetic character", and an all-caps
    * headline is alphabetic.) */
  def alphaTokens(s: UTF8String): Int = {
    val bytes = s.getBytes
    val n = bytes.length
    var cnt = 0
    var hasAlpha = false
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        if (hasAlpha) cnt += 1
        hasAlpha = false
      } else if ((bytes(i) >= 'a' && bytes(i) <= 'z') ||
        (bytes(i) >= 'A' && bytes(i) <= 'Z')) hasAlpha = true
      i += 1
    }
    cnt
  }

  /** Count of codepoints in [U+4E00, U+9FFF]. Equals
    * length(s) - length(regexp_replace(s, "[\\u4e00-\\u9fff]", "")). */
  def cjkCount(s: UTF8String): Int = {
    val bytes = s.getBytes
    val n = bytes.length
    var ascii = true
    var i = 0
    while (ascii && i < n) { if (bytes(i) < 0) ascii = false; i += 1 }
    if (ascii) return 0
    val str = s.toString
    var cnt = 0
    i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp >= 0x4e00 && cp <= 0x9fff) cnt += 1
      i += Character.charCount(cp)
    }
    cnt
  }
}

/** Stopword-hit count for a language (see [[LangSignalHelper]]). */
case class StopHits(child: Expression, lang: String) extends UnaryExpression {

  require(graft.text.TextOps.langWords.contains(lang),
    s"stop_hits: unknown language '$lang' (have ${graft.text.TextOps.langWords.keys.mkString(",")})")

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any =
    LangSignalHelper.stopHits(input.asInstanceOf[UTF8String], lang)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"""graft.functions.LangSignalHelper.stopHits($c, "$lang")""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "stop_hits"
}

/** CJK-codepoint count (see [[LangSignalHelper]]). */
case class CjkCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any =
    LangSignalHelper.cjkCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangSignalHelper.cjkCount($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "cjk_count"
}

/** Alpha-bearing-token count (see [[LangSignalHelper.alphaTokens]]) —
  * the Gopher alpha-word rule's scan without the interpreted
  * `filter(w, x -> rlike)` HOF lambda. */
case class AlphaTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any =
    LangSignalHelper.alphaTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangSignalHelper.alphaTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "alpha_tokens"
}

object StopHits {
  def apply(c: Column, lang: String): Column =
    GraftShims.column(StopHits(GraftShims.expression(c), lang))
}

object AlphaTokens {
  def apply(c: Column): Column = GraftShims.column(AlphaTokens(GraftShims.expression(c)))
}

object CjkCount {
  def apply(c: Column): Column = GraftShims.column(CjkCount(GraftShims.expression(c)))
}

/** Column form of [[AsciiTextHelper.norm]] — bit-identical replacement
  * for the `trim(regexp_replace(regexp_replace(lower(c), ...)))` chain. */
case class AsciiNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    AsciiTextHelper.norm(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AsciiTextHelper.norm($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column form of [[AsciiTextHelper.strippedCount]] — bit-identical
  * replacement for `length(c) - length(regexp_replace(c, "[^a-z0-9 ]", ""))`. */
case class StrippedCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(input: Any): Any =
    AsciiTextHelper.strippedCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.AsciiTextHelper.strippedCount($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AsciiNormalize {
  def apply(c: Column): Column = GraftShims.column(AsciiNormalize(GraftShims.expression(c)))
}

object StrippedCount {
  def apply(c: Column): Column = GraftShims.column(StrippedCount(GraftShims.expression(c)))
}
