package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** VecSumAgg (exact 128-bit element-wise array sum) and the covPairs
  * kernel behind q_embed_cov.
  */
class VecSumSpec extends AnyFunSuite {

  private lazy val spark: SparkSession =
    graft.core.Graft.tune(SparkSession.builder().master("local[4]"), 4).getOrCreate()

  private def sum128(rows: Seq[Array[Long]], parts: Int): Seq[BigInt] = {
    import spark.implicits._
    rows.toDF("a").repartition(parts)
      .agg(graft.functions.VecSumAgg.vec_sum128(col("a")).as("s"))
      .collect()(0).getSeq[java.math.BigDecimal](0)
      .map(d => BigInt(d.toBigInteger))
  }

  test("vec_sum128: exact across long-overflow boundaries, any partitioning") {
    val rows = Seq(
      Array(Long.MaxValue, Long.MinValue, 7L),
      Array(Long.MaxValue, -1L, -7L),
      Array(Long.MaxValue, Long.MinValue, 0L),
      Array(1L, 1L, Long.MaxValue))
    val expected = (0 until 3).map(i => rows.map(r => BigInt(r(i))).sum)
    // a plain sum(long) would wrap: column 0 sums to ~3.7e19 > 2^63
    assert(expected(0) > BigInt(Long.MaxValue))
    for (parts <- Seq(1, 2, 4))
      assert(sum128(rows, parts) == expected, s"parts=$parts")
  }

  test("vec_sum128: deep negative accumulation stays exact") {
    val rows = (1 to 1000).map(i => Array(Long.MinValue / 2, i.toLong, -i.toLong))
    val expected = Seq(
      BigInt(Long.MinValue / 2) * 1000, BigInt(500500), BigInt(-500500))
    assert(sum128(rows, 4) == expected)
  }

  test("vec_sum128: rejects mixed array lengths loudly") {
    import spark.implicits._
    val bad = Seq(Array(1L, 2L), Array(1L, 2L, 3L)).toDF("a").coalesce(1)
    val e = intercept[Exception](
      bad.agg(graft.functions.VecSumAgg.vec_sum128(col("a"))).collect())
    assert(e.getMessage.contains("vec_sum128") ||
      e.getCause != null && e.getCause.getMessage.contains("vec_sum128"))
  }

  test("covPairs kernel equals the per-element decimal-fix formulation") {
    import spark.implicits._
    val vecs = Seq(
      Array(0.25f, -0.5f, 0.1234567f),
      Array(1.0f, 0.0f, -1.0f),
      Array(0.0000001f, 299.0f, -0.9999999f))
    val df = vecs.toDF("embedding")
      .select(col("embedding").cast("array<float>").as("embedding"))
    val kernel = df.select(
      graft.functions.NativeExprs.cov_pairs(col("embedding")).as("p"))
      .collect().map(_.getSeq[Long](0))
    val viaFix = vecs.map { v =>
      val fx = v.map(x => java.math.BigDecimal.valueOf(x.toDouble)
        .setScale(7, java.math.RoundingMode.HALF_UP).unscaledValue().longValueExact())
      (for (i <- fx.indices; j <- i until fx.length) yield fx(i) * fx(j)).toSeq
    }
    assert(kernel.toSeq.map(_.toSeq) == viaFix)
  }
}
