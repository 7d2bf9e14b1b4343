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

/** Fold a column of 60-bit hashes into an m-bit Bloom bitmap
  * (ARRAY<BIGINT> of m/64 words) in ONE map-side-combined aggregation.
  *
  * Replaces the explode(4 bit positions) → distinct → groupBy(word) →
  * bit_or → scatter chain in [[graft.text.Bloom.bitmapOfHashes]]: that
  * form shuffled three times to build what is a 16 KB commutative OR.
  * Here each partition ORs its keys' bits into a local m/64-word array
  * and the exchange carries one m/8-byte partial per partition — the
  * build side of a Bloom runtime-filter join costs one scan at any
  * build-side size, which is the property that makes the pre-filter
  * worth it at 100 TB.
  *
  * Bit positions are the Kirsch–Mitzenmacher expansion the whole Bloom
  * surface shares (and the DuckDB mirror reproduces): with
  * h1 = h mod 2^30 and h2 = (h >> 30) | 1,
  * bit_j = (h1 + j·h2) mod m for j < numHashes. floorMod matches
  * Spark's/DuckDB's pmod on the (possibly signed) hash. OR is
  * commutative and idempotent, so the result is order- and
  * partitioning-independent — bit-identical to the exploded form.
  */
case class BloomBitsAgg(
    child: Expression,
    m: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] {

  require(m >= 64 && (m & (m - 1)) == 0, s"m must be a power of two >= 64, got $m")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_bits requires BIGINT input, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buf
    val h = v.asInstanceOf[Long]
    val h1 = java.lang.Math.floorMod(h, 1073741824L) // 2^30
    val h2 = (h >> 30) | 1L
    var j = 0
    while (j < numHashes) {
      val bit = java.lang.Math.floorMod(h1 + j * h2, m.toLong).toInt
      buf(bit >> 6) |= (1L << (bit & 63))
      j += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBitsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBitsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBitsAgg =
    copy(child = newChild)

  override def prettyName: String = "bloom_bits"
}

object BloomBitsAgg {
  /** The m-bit Bloom bitmap (m/64 BIGINT words) of a BIGINT hash column. */
  def bloomBits(c: Column, m: Int, numHashes: Int): Column =
    GraftShims.column(
      BloomBitsAgg(GraftShims.expression(c), m, numHashes).toAggregateExpression())
}
