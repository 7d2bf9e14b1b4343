package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Unordered-pair co-occurrence counts over set-bitmask rows — the
  * market-basket / tag-co-occurrence k=2 kernel for bounded item
  * vocabularies (reference: pd-explain's pandas frequency tables;
  * association-rule support/lift per Agrawal-Srikant Apriori, k=2).
  *
  * Input: one BIGINT bitmask per basket (bit i set = item i present,
  * i < `width` ≤ 63). Output: ONE row — the upper-triangular cell
  * vector c where c[tri(i,j)] = #baskets containing both i and j
  * (diagonal = per-item marginals; callers add a sentinel bit to carry
  * the basket total in the same pass).
  *
  * Why an imperative aggregate: the explode form materializes
  * m(m+1)/2 rows per basket (~22M rows at sf1) just to hash-count 351
  * cells; here the per-partition state is ONE w(w+1)/2 long vector
  * updated by set-bit iteration (numberOfTrailingZeros — ~m²/2 adds
  * per basket, no row churn), merged as a vector add. The exchange
  * carries |partitions| buffers of w(w+1)/2 longs, nothing else —
  * at 1000 executors that is 1000 × ~3 KB. Counts are exact long adds
  * (order-independent → deterministic across partitionings).
  *
  * Width contract: the item vocabulary must fit one long mask (≤ 63
  * ids after dictionary-encoding — brands/tags/domain buckets; loud
  * failure above). Wider vocabularies take the pair-explode form,
  * whose per-basket fanout is the same but whose cell table is no
  * longer driver-bounded.
  */
case class MaskPairCountAgg(
    child: Expression,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(width > 0 && width <= 63,
    s"mask_pair_count: width must be in [1, 63], got $width")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mask_pair_count requires BIGINT mask input, got ${other.simpleString}")
  }

  private val cells = width * (width + 1) / 2

  /** Triangular offset of pair (i, j), i ≤ j < width: row i starts at
    * i*width - i(i-1)/2. */
  @inline private def rowStart(i: Int): Int = i * width - i * (i - 1) / 2

  override def createAggregationBuffer(): Array[Long] = new Array[Long](cells)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val mask = v.asInstanceOf[Long]
    if (mask >>> width != 0) throw new IllegalStateException(
      s"mask_pair_count: mask $mask has bits ≥ width $width")
    var rest = mask
    while (rest != 0) {
      val i = java.lang.Long.numberOfTrailingZeros(rest)
      val base = rowStart(i) - i
      var hi = rest // bits j ≥ i, so the diagonal counts marginals
      while (hi != 0) {
        buf(base + java.lang.Long.numberOfTrailingZeros(hi)) += 1L
        hi &= hi - 1
      }
      rest &= rest - 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < cells) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): MaskPairCountAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MaskPairCountAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MaskPairCountAgg =
    copy(child = newChild)

  override def prettyName: String = "mask_pair_count"
}

object MaskPairCountAgg {
  /** Upper-triangular pair-count vector of a BIGINT bitmask column. */
  def maskPairCount(c: Column, width: Int): Column =
    GraftShims.column(
      MaskPairCountAgg(GraftShims.expression(c), width).toAggregateExpression())

  /** Triangular offset of (i, j), i ≤ j < width — the decode-side twin
    * of the update loop's layout. */
  def tri(width: Int)(i: Int, j: Int): Int = i * width - i * (i - 1) / 2 + (j - i)
}
