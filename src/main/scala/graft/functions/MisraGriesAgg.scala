package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-state Misra-Gries heavy-hitter sketch aggregate: keeps at
  * most `cap` (token, counter) pairs and evaluates to the candidate
  * token set (sorted ascending).
  *
  * Guarantee (Misra & Gries 1982; merge rule per Agarwal et al. 2012,
  * "Mergeable summaries"): over N total inputs, every counter
  * underestimates its token's true frequency by at most N/(cap+1), so
  * ANY token with true frequency > N/(cap+1) is guaranteed present in
  * the final summary — regardless of partitioning or merge order. The
  * candidate SET itself is partitioning-dependent below that
  * threshold, which is why [[graft.text.Heavy.heavyHitters]] re-counts
  * candidates exactly and filters on the exact threshold: the QUERY
  * output is deterministic even though the sketch is not.
  *
  * This is the scale-correct first pass for "top terms of 100 TB":
  * per-partition state is ≤ cap entries, partial aggregation applies,
  * and merge is a bounded map union + one subtract-and-evict — the
  * corpus's token column is never shuffled (contrast a full
  * groupBy(token), which shuffles the term universe).
  */
case class MisraGriesAgg(
    child: Expression,
    cap: Int,
    withCounts: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (cap < 1) TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires cap >= 1, got $cap")
    else if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires STRING input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): java.util.HashMap[String, java.lang.Long] =
    new java.util.HashMap[String, java.lang.Long]()

  override def update(
      buf: java.util.HashMap[String, java.lang.Long],
      input: InternalRow): java.util.HashMap[String, java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val tok = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(tok)
      if (cur != null) { buf.put(tok, cur + 1L); () }
      else if (buf.size() < cap) { buf.put(tok, 1L); () }
      else {
        // classic MG step: a miss with a full summary decrements every
        // counter (the new token is absorbed by the decrement); zeros
        // evict. O(cap) on this branch, amortized O(1) per input.
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(
      buf: java.util.HashMap[String, java.lang.Long],
      other: java.util.HashMap[String, java.lang.Long]): java.util.HashMap[String, java.lang.Long] =
    MisraGriesAgg.mergeInto(buf, other, cap)

  override def eval(buf: java.util.HashMap[String, java.lang.Long]): Any = {
    val keys = new Array[String](buf.size())
    buf.keySet().toArray(keys)
    java.util.Arrays.sort(keys, java.util.Comparator.naturalOrder[String]())
    if (!withCounts)
      new GenericArrayData(keys.map(UTF8String.fromString(_).asInstanceOf[AnyRef]))
    else
      new GenericArrayData(keys.map { k =>
        InternalRow(UTF8String.fromString(k), buf.get(k).longValue()).asInstanceOf[AnyRef]
      })
  }

  override def serialize(buf: java.util.HashMap[String, java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, java.lang.Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.put(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def dataType: DataType =
    if (!withCounts) ArrayType(StringType, containsNull = false)
    else ArrayType(StructType(Seq(
      StructField("token", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)

  override def prettyName: String = "misra_gries"
}

object MisraGriesAgg {
  /** Heavy-hitter CANDIDATE tokens of `c` (≤ cap, sorted ascending) —
    * a guaranteed superset of every token with frequency > N/(cap+1). */
  def mgCandidates(c: Column, cap: Int): Column =
    GraftShims.column(MisraGriesAgg(GraftShims.expression(c), cap).toAggregateExpression())

  /** The summary WITH its counters — array<struct<token,cnt>> sorted by
    * token. Each counter UNDERESTIMATES the token's true frequency by at
    * most N/(cap+1). This is the mergeable form a caller holds across
    * scans/micro-batches ([[graft.streaming.HeavyHitters]]): two
    * summaries combine with [[mergeInto]] and keep the additive bound
    * (Agarwal et al. 2012). */
  def mgSummary(c: Column, cap: Int): Column =
    GraftShims.column(
      MisraGriesAgg(GraftShims.expression(c), cap, withCounts = true).toAggregateExpression())

  /** The mergeable-summaries combine rule, shared by the aggregate's
    * executor-side merge and driver-side stream folds: add `other`'s
    * counters into `buf`, then — if over cap — subtract the (cap+1)-th
    * largest counter from all and evict ≤ 0, so at most cap counters
    * stay > 0 and the total error keeps the additive N/(cap+1) bound. */
  def mergeInto(
      buf: java.util.HashMap[String, java.lang.Long],
      other: java.util.HashMap[String, java.lang.Long],
      cap: Int): java.util.HashMap[String, java.lang.Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (buf.size() > cap) {
      val counts = new Array[Long](buf.size())
      var i = 0
      val vs = buf.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next().longValue(); i += 1 }
      java.util.Arrays.sort(counts)
      val sub = counts(counts.length - (cap + 1)) // (cap+1)-th largest
      val es = buf.entrySet().iterator()
      while (es.hasNext) {
        val e = es.next()
        if (e.getValue <= sub) es.remove() else e.setValue(e.getValue - sub)
      }
    }
    buf
  }
}
