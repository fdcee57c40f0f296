package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters aggregate (TypedImperativeAggregate tier
  * of SURVEY §3): `freq_items(token, capacity)` maintains at most
  * `capacity` counters and returns (token, estimated count) pairs with
  * the classic guarantee: every token with true frequency >
  * n/(capacity+1) is present, and each estimate is within
  * [true − n/(capacity+1), true].
  *
  * This is the 100 TB path for vocabulary / top-token extraction
  * (C16's scale variant): an exact token groupBy shuffles the whole
  * token stream on token — the sketch ships at most `capacity`
  * counters per map task regardless of input size, and the merge is
  * the Agarwal et al. (PODS'12) mergeable-summaries reduction (sum
  * counters, then subtract the (capacity+1)-th largest and drop
  * non-positives), which preserves the error bound.
  */
case class FreqAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqAgg.Sketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("token", StringType),
      StructField("est", LongType))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (capacity < 1)
      TypeCheckResult.TypeCheckFailure(s"freq_items requires capacity >= 1, got $capacity")
    else if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"freq_items expects a string column, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): FreqAgg.Sketch = new FreqAgg.Sketch(capacity)

  override def update(buf: FreqAgg.Sketch, input: InternalRow): FreqAgg.Sketch = {
    val v = child.eval(input)
    // UTF8String from an unsafe row points into a reused buffer — copy
    // via toString before storing as a map key
    if (v != null) buf.offer(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: FreqAgg.Sketch, other: FreqAgg.Sketch): FreqAgg.Sketch = {
    buf.mergeIn(other)
    buf
  }

  /** Entries count-desc, token-asc (deterministic output order). */
  override def eval(buf: FreqAgg.Sketch): Any = {
    val sorted = buf.entries.toSeq.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    }.toArray[Any])
  }

  override def serialize(buf: FreqAgg.Sketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.entries.size)
    buf.entries.foreach { case (t, c) =>
      val b = t.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): FreqAgg.Sketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new FreqAgg.Sketch(capacity)
    var j = 0
    while (j < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.put(new String(b, StandardCharsets.UTF_8), in.readLong())
      j += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FreqAgg =
    copy(child = c.head)
}

object FreqAgg {

  /** Mutable Misra–Gries summary with at most `capacity` counters. */
  final class Sketch(capacity: Int) {
    private val counts = mutable.HashMap.empty[String, Long]

    def entries: Iterator[(String, Long)] = counts.iterator

    /** Restore a counter (deserialization path — no MG step). */
    private[graft] def put(token: String, c: Long): Unit = counts(token) = c

    /** MG update: increment if tracked or if a slot is free; otherwise
      * decrement every counter (the "pay one from everyone" step) and
      * evict zeros.
      */
    def offer(token: String): Unit = {
      counts.get(token) match {
        case Some(c) => counts(token) = c + 1
        case None if counts.size < capacity => counts(token) = 1L
        case None =>
          val dead = mutable.ArrayBuffer.empty[String]
          counts.mapValuesInPlace { (_, c) => c - 1 }
          counts.foreach { case (t, c) => if (c <= 0) dead += t }
          dead.foreach(counts.remove)
      }
    }

    /** Mergeable-summaries reduction: sum counters, and if over
      * capacity subtract the (capacity+1)-th largest value from all and
      * drop non-positives — error bounds add, keeping the global
      * guarantee.
      */
    def mergeIn(other: Sketch): Unit = {
      other.counts.foreach { case (t, c) =>
        counts(t) = counts.getOrElse(t, 0L) + c
      }
      if (counts.size > capacity) {
        val cut = counts.values.toArray.sorted(Ordering[Long].reverse).apply(capacity)
        val dead = mutable.ArrayBuffer.empty[String]
        counts.mapValuesInPlace { (_, c) => c - cut }
        counts.foreach { case (t, c) => if (c <= 0) dead += t }
        dead.foreach(counts.remove)
      }
    }
  }

  import org.apache.spark.sql.GraftBridge.{column, expression}

  /** Column face: array of (token, est) structs, count-desc. */
  def freq_items(token: Column, capacity: Int): Column =
    column(FreqAgg(expression(token), capacity).toAggregateExpression())
}
