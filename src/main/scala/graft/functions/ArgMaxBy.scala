package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Mutable (found, score, id) argmax state — 17 serialized bytes. */
final class ArgMaxBuf(var has: Boolean, var score: Double, var id: Long)

/** Hash-aggregable argmax: the long `id` with the maximum double
  * `score`, ties broken toward the SMALLEST id — exactly
  * `max_by(id, struct(score, -id))` / the oracle's
  * `ROW_NUMBER() OVER (ORDER BY score DESC, id ASC) = 1`.
  *
  * Why not max_by itself: its aggregation buffer holds the struct
  * ordering key, and struct buffer slots are not mutable-buffer types,
  * so Spark plans the whole aggregation as SortAggregate — for the IVF
  * centroid assignment that meant per-partition SORTS of the N×K scored
  * table (at sf1, 169M rows) just to take a per-vector maximum. As a
  * TypedImperativeAggregate this runs in ObjectHashAggregate with
  * map-side combine and constant 17-byte state per group (raise
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` when
  * per-partition group counts exceed its conservative default — the
  * state here is fixed-size, unlike collect_list's).
  *
  * Score comparison uses plain `>` / `==`, matching SQL numeric
  * comparison (-0.0 == 0.0, so a -0.0/+0.0 "tie" breaks toward the
  * smaller id exactly as the SQL mirror's ORDER BY does). NaN scores
  * never win a comparison and are effectively ignored — out of this
  * aggregate's domain (cosines are NaN-free by construction). Rows
  * with a NULL id or score are skipped; an all-NULL group evaluates
  * to NULL (max_by over a struct ordering would instead tie-break
  * among the null-score rows — the SQL mirrors never rank NULL
  * scores, so skipping matches the oracle). */
case class ArgMaxBy(
    id: Expression,
    score: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArgMaxBuf]
  with BinaryLike[Expression] {

  override def left: Expression = id
  override def right: Expression = score

  override def checkInputDataTypes(): TypeCheckResult =
    if (id.dataType != LongType) TypeCheckResult.TypeCheckFailure(
      s"argmax_by requires a BIGINT id, got ${id.dataType.simpleString}")
    else if (score.dataType != DoubleType) TypeCheckResult.TypeCheckFailure(
      s"argmax_by requires a DOUBLE score, got ${score.dataType.simpleString}")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): ArgMaxBuf = new ArgMaxBuf(false, 0.0, 0L)

  private def add(buf: ArgMaxBuf, sc: Double, idv: Long): Unit = {
    if (!buf.has) { buf.has = true; buf.score = sc; buf.id = idv }
    else if (sc > buf.score || (sc == buf.score && idv < buf.id)) {
      buf.score = sc; buf.id = idv
    }
  }

  override def update(buf: ArgMaxBuf, input: InternalRow): ArgMaxBuf = {
    val sc = score.eval(input)
    val idv = id.eval(input)
    if (sc != null && idv != null)
      add(buf, sc.asInstanceOf[Double], idv.asInstanceOf[Long])
    buf
  }

  override def merge(buf: ArgMaxBuf, other: ArgMaxBuf): ArgMaxBuf = {
    if (other.has) add(buf, other.score, other.id)
    buf
  }

  override def eval(buf: ArgMaxBuf): Any = if (buf.has) buf.id else null

  override def serialize(buf: ArgMaxBuf): Array[Byte] = {
    val bb = ByteBuffer.allocate(17)
    bb.put(if (buf.has) 1.toByte else 0.toByte)
    bb.putDouble(buf.score)
    bb.putLong(buf.id)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArgMaxBuf = {
    val bb = ByteBuffer.wrap(bytes)
    new ArgMaxBuf(bb.get() == 1, bb.getDouble(), bb.getLong())
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(newOffset: Int): ArgMaxBy =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArgMaxBy =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgMaxBy =
    copy(id = newLeft, score = newRight)

  override def prettyName: String = "argmax_by"
}

object ArgMaxBy {
  /** id of the max score; ties to the smallest id. */
  def argmax(id: Column, score: Column): Column =
    GraftShims.column(
      ArgMaxBy(GraftShims.expression(id), GraftShims.expression(score)).toAggregateExpression())
}
