package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Element-wise EXACT sum of long arrays (TypedImperativeAggregate tier
  * of SURVEY §3): `vec_sum128(array<bigint>)` → `array<decimal(38,0)>`.
  *
  * Each slot accumulates in 128-bit two's complement (hi, lo long
  * pairs), so the sum is exact and order-independent at any group size
  * — no wrap, no float drift — while the per-row cost stays two long
  * adds per slot. This is the reduction that turns per-row product
  * vectors (covariance upper triangles, gradient/feature sums) into
  * one fixed-size buffer per task: the exchange carries
  * O(partitions × slots × 16 B) instead of |rows| × slots exploded
  * rows through a hash aggregate.
  */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[VecSumAgg.Acc] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(DecimalType(38, 0), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"vec_sum128 expects array<bigint>, got ${other.catalogString}")
    }
  }

  override def createAggregationBuffer(): VecSumAgg.Acc = new VecSumAgg.Acc

  override def update(buf: VecSumAgg.Acc, input: InternalRow): VecSumAgg.Acc = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(buf: VecSumAgg.Acc, other: VecSumAgg.Acc): VecSumAgg.Acc = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: VecSumAgg.Acc): Any = {
    val n = buf.size
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) = org.apache.spark.sql.types.Decimal(
        new java.math.BigDecimal(buf.valueAt(i)), 38, 0)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: VecSumAgg.Acc): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) { out.writeLong(buf.hiAt(i)); out.writeLong(buf.loAt(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): VecSumAgg.Acc = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new VecSumAgg.Acc
    buf.initRaw(n)
    var i = 0
    while (i < n) { buf.setRaw(i, in.readLong(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): VecSumAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecSumAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VecSumAgg =
    copy(child = c.head)
}

object VecSumAgg {

  /** Per-slot 128-bit two's-complement accumulator. Lazily sized by the
    * first array seen; a group mixing array lengths is a caller bug and
    * fails loudly.
    */
  final class Acc {
    private var hi: Array[Long] = _
    private var lo: Array[Long] = _

    def size: Int = if (lo == null) 0 else lo.length
    def hiAt(i: Int): Long = hi(i)
    def loAt(i: Int): Long = lo(i)

    def initRaw(n: Int): Unit = { hi = new Array[Long](n); lo = new Array[Long](n) }
    def setRaw(i: Int, h: Long, l: Long): Unit = { hi(i) = h; lo(i) = l }

    /** 128-bit += of signed x at slot i: unsigned carry out of the low
      * word plus x's sign extension into the high word.
      */
    @inline private def add128(i: Int, x: Long): Unit = {
      val l = lo(i)
      val nl = l + x
      val carry = ((l & x) | ((l | x) & ~nl)) >>> 63
      hi(i) += (x >> 63) + carry
      lo(i) = nl
    }

    def add(arr: ArrayData): Unit = {
      val n = arr.numElements()
      if (lo == null || lo.length == 0) initRaw(n)
      else require(n == lo.length,
        s"vec_sum128: array length $n != accumulator length ${lo.length}")
      var i = 0
      while (i < n) { add128(i, arr.getLong(i)); i += 1 }
    }

    def mergeFrom(other: Acc): Unit = {
      // an empty-partition partial serializes as length 0 — identity
      if (other.lo == null || other.lo.length == 0) return
      if (lo == null || lo.length == 0) initRaw(other.lo.length)
      else require(other.lo.length == lo.length,
        s"vec_sum128: merging accumulators of lengths ${other.lo.length} vs ${lo.length}")
      var i = 0
      while (i < lo.length) {
        // add other's unsigned low word, then its high word
        val l = lo(i)
        val x = other.lo(i)
        val nl = l + x
        val carry = ((l & x) | ((l | x) & ~nl)) >>> 63
        hi(i) += other.hi(i) + carry
        lo(i) = nl
        i += 1
      }
    }

    /** Exact value at slot i: hi·2⁶⁴ + unsigned(lo). */
    def valueAt(i: Int): java.math.BigInteger = {
      val unsignedLo = new java.math.BigInteger(1, Array[Byte](
        (lo(i) >>> 56).toByte, (lo(i) >>> 48).toByte, (lo(i) >>> 40).toByte,
        (lo(i) >>> 32).toByte, (lo(i) >>> 24).toByte, (lo(i) >>> 16).toByte,
        (lo(i) >>> 8).toByte, lo(i).toByte))
      java.math.BigInteger.valueOf(hi(i)).shiftLeft(64).add(unsignedLo)
    }
  }

  /** Column face. */
  def vec_sum128(longArray: Column): Column = {
    import org.apache.spark.sql.GraftBridge.{column, expression}
    column(VecSumAgg(expression(longArray)).toAggregateExpression())
  }
}
