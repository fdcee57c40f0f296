package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Fixed-width bitmap EXACT distinct-count aggregate
  * (TypedImperativeAggregate tier of SURVEY §3):
  * `bitmap_distinct(id: bigint, domain)` counts distinct ids in
  * [0, domain) per group by setting bit `id` in a ⌈domain/64⌉-word
  * bitmap; partials merge by bitwise OR, eval is a popcount sum.
  *
  * Why it exists: Spark plans `COUNT(DISTINCT key)` as a two-phase
  * expand — the exchange carries one row PER DISTINCT (group, key)
  * PAIR, i.e. it scales with the data. The bitmap partial is a FIXED
  * `groups × ⌈domain/64⌉ × 8` bytes per map task no matter how many
  * input rows hit it — the classic OLAP bitmap-index trade, right for
  * bounded dimension domains (taxi zones, merchants, calendar days;
  * the reference's location dimension is 265 values — 5 words), wrong
  * for unbounded key spaces (use HLL `q_approx_distinct` or the exact
  * expand there).
  *
  * Out-of-domain ids fail the query loudly (a silently-dropped id
  * would return a plausible wrong count); nulls are skipped like every
  * SQL distinct aggregate.
  */
case class BitmapAgg(
    child: Expression,
    domain: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  private val words = (domain + 63) >>> 6

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (domain < 1)
      TypeCheckResult.TypeCheckFailure(s"bitmap_distinct requires domain >= 1, got $domain")
    else if (domain > (1 << 27))
      // 2^27 bits = 16 MiB per group per task: beyond that the buffer
      // stops being "fixed small state" and HLL/exact-expand win
      TypeCheckResult.TypeCheckFailure(
        s"bitmap_distinct requires domain <= ${1 << 27} (got $domain) — " +
          "use approx_count_distinct or plain COUNT(DISTINCT) for wide domains")
    else if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"bitmap_distinct expects id: bigint, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val id = v.asInstanceOf[Long]
      if (id < 0L || id >= domain)
        throw new IllegalArgumentException(
          s"bitmap_distinct: id $id outside declared domain [0, $domain)")
      buf((id >>> 6).toInt) |= (1L << (id & 63))
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var n = 0L
    var i = 0
    while (i < words) { n += java.lang.Long.bitCount(buf(i)); i += 1 }
    n
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(words * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < words) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](words)
    var i = 0
    while (i < words) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BitmapAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BitmapAgg =
    copy(child = c.head)
}

object BitmapAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.GraftBridge.{column, expression}

  /** Column-API face: exact distinct count of `id` ∈ [0, domain). */
  def bitmap_distinct(id: Column, domain: Int): Column =
    column(BitmapAgg(expression(id), domain).toAggregateExpression())
}
