package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass word-3-gram shingling.
  *
  * The dedup family's signature scans were built on
  * `transform(sequence(...), i -> concat_ws(...))` — higher-order
  * functions are CodegenFallback in Spark, so every document paid an
  * interpreted per-shingle lambda (plus, for the hashed form, an
  * interpreted md5 per element). Two observations make a native
  * expression both faster and trivially parity-safe:
  *
  *  1. tokens are `split(text, " ")` — single-space delimiters — so a
  *     3-token shingle joined with single spaces IS the contiguous
  *     substring of the original text from token i's first byte to
  *     token i+2's last byte (empty tokens from doubled spaces
  *     included, exactly as concat_ws produces);
  *  2. 0x20 never occurs inside a multi-byte UTF-8 sequence, so space
  *     scanning is a plain byte loop.
  *
  * [[WordShingles]] therefore emits each shingle as a slice of the
  * input's byte array (`UTF8String.fromBytes(bytes, start, len)` shares
  * the array — no copy), and [[ShingleHashes]] goes one step further
  * for the hashed consumers: it feeds each slice straight into a
  * thread-local MD5 (`digest.update(bytes, start, len)` — the shingle
  * string is never materialized) and parses the first 15 hex digits as
  * the 60-bit hash long, bit-identical to
  * `conv(substring(md5(sh), 1, 15), 16, 10)` (15 hex digits = the top
  * 60 bits of the big-endian digest = first-8-bytes >>> 4).
  */
object ShingleHelper {

  private val Empty = new GenericArrayData(Array.empty[Any])

  /** All consecutive `win`-token substrings (single-space joined =
    * contiguous byte slices, see the class doc); empty array for fewer
    * than `win` tokens. */
  def ngrams(s: UTF8String, win: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    var spaces = 0
    var i = 0
    while (i < n) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val ntok = spaces + 1
    if (ntok < win) return Empty
    val starts = new Array[Int](ntok)
    val ends = new Array[Int](ntok)
    var tok = 0
    i = 0
    while (i < n) {
      if (bytes(i) == ' ') { ends(tok) = i; starts(tok + 1) = i + 1; tok += 1 }
      i += 1
    }
    ends(ntok - 1) = n
    val out = new Array[Any](ntok - win + 1)
    var k = 0
    while (k < ntok - win + 1) {
      out(k) = UTF8String.fromBytes(bytes, starts(k), ends(k + win - 1) - starts(k))
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Equivalent of shinglesOf(split(s, " ")): all consecutive 3-token
    * substrings; empty array for fewer than 3 tokens. */
  def shingles3(s: UTF8String): ArrayData = ngrams(s, 3)

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private[functions] def md5(): java.security.MessageDigest = md5Local.get()

  /** Equivalent of transform(ngrams(s, win),
    * sh -> conv(substring(md5(sh), 1, 15), 16, 10) :: long). */
  def ngramHashes(s: UTF8String, win: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    var spaces = 0
    var i = 0
    while (i < n) { if (bytes(i) == ' ') spaces += 1; i += 1 }
    val ntok = spaces + 1
    if (ntok < win) return Empty
    val starts = new Array[Int](ntok)
    val ends = new Array[Int](ntok)
    var tok = 0
    i = 0
    while (i < n) {
      if (bytes(i) == ' ') { ends(tok) = i; starts(tok + 1) = i + 1; tok += 1 }
      i += 1
    }
    ends(ntok - 1) = n
    val md = md5Local.get()
    val out = new Array[Any](ntok - win + 1)
    var k = 0
    while (k < ntok - win + 1) {
      md.reset()
      md.update(bytes, starts(k), ends(k + win - 1) - starts(k))
      val d = md.digest()
      // first 15 hex digits = top 60 bits: unsigned big-endian first
      // 8 bytes, dropping the 16th hex digit (low nibble of byte 7)
      val top = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      out(k) = top >>> 4
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Equivalent of transform(shingles3(s),
    * sh -> conv(substring(md5(sh), 1, 15), 16, 10) :: long). */
  def shingleHashes3(s: UTF8String): ArrayData = ngramHashes(s, 3)
}

/** Additions to [[ShingleHelper]]'s one-pass family: the 60-bit
  * SimHash, computed per document with zero explode / zero shuffle. */
object SimHashHelper {

  private val Bits = 60

  /** Equivalent of exploding split(text, " "), hashing each token
    * (md5 top-60-bits, as [[ShingleHelper.shingleHashes3]]), summing
    * per-bit ±1 contributions over ALL occurrences (empty tokens from
    * doubled/leading/trailing spaces included — split emits them and
    * both engines hash them), and setting bit j when its sum is
    * strictly positive. */
  def simhash60(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    val acc = new Array[Int](Bits)
    val md = ShingleHelper.md5()
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        val top = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
          ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
          ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
        var j = 0
        while (j < Bits) {
          acc(j) += ((top >>> (Bits - 1 - j)) & 1L).toInt * 2 - 1
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < Bits) {
      if (acc(j) > 0) sim |= 1L << (Bits - 1 - j)
      j += 1
    }
    sim
  }
}

/** 60-bit SimHash of a document (see [[SimHashHelper]]). */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    SimHashHelper.simhash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashHelper.simhash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {
  def apply(c: Column): Column = GraftShims.column(SimHash60(GraftShims.expression(c)))
}

/** array<string> of word-3-gram shingles (see [[ShingleHelper]]). */
case class WordShingles(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleHelper.shingles3(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHelper.shingles3($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<long> of 60-bit md5-prefix shingle hashes (see [[ShingleHelper]]). */
case class ShingleHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleHelper.shingleHashes3(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHelper.shingleHashes3($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {
  def apply(c: Column): Column = GraftShims.column(WordShingles(GraftShims.expression(c)))
}

/** array<string> of word n-gram shingles for any window (see
  * [[ShingleHelper.ngrams]]) — the parameterized form of
  * [[WordShingles]]; bit-identical to the transform/concat_ws HOF
  * chain over split(text, " ") at the same window. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "WordNgrams: window must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleHelper.ngrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHelper.ngrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordNgrams {
  def apply(c: Column, n: Int): Column =
    GraftShims.column(WordNgrams(GraftShims.expression(c), n))
}

/** array<long> of 60-bit md5-prefix hashes of word n-grams for any
  * window (see [[ShingleHelper.ngramHashes]]) — the parameterized form
  * of [[ShingleHashes]]; bit-identical to hashing each [[WordNgrams]]
  * element with conv(substring(md5(sh), 1, 15), 16, 10). */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "NgramHashes: window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    ShingleHelper.ngramHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHelper.ngramHashes($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NgramHashes {
  def apply(c: Column, n: Int): Column =
    GraftShims.column(NgramHashes(GraftShims.expression(c), n))
}

object ShingleHashes {
  def apply(c: Column): Column = GraftShims.column(ShingleHashes(GraftShims.expression(c)))
}
