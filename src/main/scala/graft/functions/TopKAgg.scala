package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate (TypedImperativeAggregate tier of
  * SURVEY §3): `top_k(struct(score: double, id: long), k)` keeps the k
  * highest-scoring (score, id) pairs per group, ties broken by lower
  * id. Partial aggregation means each map task ships at most k pairs
  * per group — versus a window row_number, which shuffles and sorts
  * EVERY scored row. At 100 TB corpus × q queries that's k·q rows on
  * the wire instead of |corpus|·q.
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Heap] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)

  // Analysis-time contract: update() reads getDouble(0)/getLong(1), so
  // anything but struct(double, long) must fail BEFORE execution (a
  // float/int struct would otherwise misread unsafe-row bytes at
  // runtime); k < 1 would silently return empty arrays.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"top_k requires k >= 1, got $k")
    else if (k > (1 << 20))
      // the heap is a per-group in-memory buffer on every map task; a
      // "top million+" ask is a sort, not a bounded-heap aggregation
      TypeCheckResult.TypeCheckFailure(
        s"top_k requires k <= ${1 << 20} (got $k) — use a window rank for unbounded k")
    else child.dataType match {
      case StructType(fields)
          if fields.length == 2 && fields(0).dataType == DoubleType &&
            fields(1).dataType == LongType =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          "top_k expects struct(score: double, id: bigint), got " +
            other.catalogString)
    }
  }

  override def createAggregationBuffer(): TopKAgg.Heap = new TopKAgg.Heap(k)

  override def update(buf: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val v = child.eval(input)
    if (v != null) {
      val row = v.asInstanceOf[InternalRow]
      buf.offer(row.getDouble(0), row.getLong(1))
    }
    buf
  }

  override def merge(buf: TopKAgg.Heap, other: TopKAgg.Heap): TopKAgg.Heap = {
    other.foreach(buf.offer)
    buf
  }

  override def eval(buf: TopKAgg.Heap): Any = {
    val sorted = buf.sortedDesc
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    }.toArray[Any])
  }

  override def serialize(buf: TopKAgg.Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new TopKAgg.Heap(k)
    var j = 0
    while (j < n) { buf.offer(in.readDouble(), in.readLong()); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKAgg =
    copy(child = c.head)
}

object TopKAgg {

  /** Min-heap of (score, id) capped at k; "worst" = lowest score, ties
    * → higher id (so the kept set prefers high score, low id).
    */
  final class Heap(k: Int) {
    private val scores = new Array[Double](k)
    private val ids = new Array[Long](k)
    private var n = 0

    def size: Int = n

    @inline private def worseThan(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 < s2 || (s1 == s2 && i1 > i2)

    def offer(s: Double, id: Long): Unit = {
      if (n < k) {
        scores(n) = s; ids(n) = id; n += 1; siftUp(n - 1)
      } else if (k > 0 && worseThan(scores(0), ids(0), s, id)) {
        scores(0) = s; ids(0) = id; siftDown(0)
      }
    }

    private def siftUp(start: Int): Unit = {
      var i = start
      while (i > 0) {
        val p = (i - 1) / 2
        if (worseThan(scores(i), ids(i), scores(p), ids(p))) {
          swap(i, p); i = p
        } else return
      }
    }

    private def siftDown(start: Int): Unit = {
      var i = start
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var w = i
        if (l < n && worseThan(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < n && worseThan(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == i) return
        swap(i, w); i = w
      }
    }

    @inline private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    def foreach(f: (Double, Long) => Unit): Unit = {
      var j = 0
      while (j < n) { f(scores(j), ids(j)); j += 1 }
    }

    /** Entries best-first: score desc, id asc. */
    def sortedDesc: Seq[(Double, Long)] =
      (0 until n).map(j => (scores(j), ids(j)))
        .sortBy { case (s, i) => (-s, i) }
  }

  import org.apache.spark.sql.GraftBridge.{column, expression}

  /** Column face: array of the k best (score, id) structs per group. */
  def top_k(scoreIdStruct: Column, k: Int): Column =
    column(TopKAgg(expression(scoreIdStruct), k).toAggregateExpression())
}
