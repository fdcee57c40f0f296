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

  test("bitmap_distinct: equals countDistinct at any partitioning, word boundaries included") {
    import spark.implicits._
    // ids straddle the 64-bit word boundaries (63, 64, 127, 128)
    val rows = Seq(0L, 63L, 63L, 64L, 127L, 128L, 128L, 128L, 5L, 200L)
      .map(id => (id % 2, id))
    for (parts <- Seq(1, 3, 8)) {
      val df = rows.toDF("g", "id").repartition(parts)
      val got = df.groupBy("g")
        .agg(graft.functions.BitmapAgg.bitmap_distinct(col("id"), 201).as("d"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exp = df.groupBy("g").agg(countDistinct(col("id")).as("d"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == exp, s"parts=$parts")
    }
    // SQL registration path
    rows.toDF("g", "id").createOrReplaceTempView("bm")
    graft.core.GraftExtensions.register(spark)
    val viaSql = spark.sql(
      "SELECT g, graft_bitmap_distinct(id, 201) AS d FROM bm GROUP BY g")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql.values.sum == 7L) // {0,5,63,64,127,128,200}
  }

  test("bitmap_distinct: out-of-domain id fails loudly, nulls are skipped") {
    import spark.implicits._
    val bad = Seq(0L, 300L).toDF("id").coalesce(1)
    val e = intercept[Exception](
      bad.agg(graft.functions.BitmapAgg.bitmap_distinct(col("id"), 201)).collect())
    def mentions(t: Throwable): Boolean =
      t != null && (t.getMessage != null && t.getMessage.contains("bitmap_distinct")
        || mentions(t.getCause))
    assert(mentions(e))
    val withNull = Seq(Some(1L), None, Some(1L)).toDF("id")
    val n = withNull
      .agg(graft.functions.BitmapAgg.bitmap_distinct(col("id"), 201))
      .collect()(0).getLong(0)
    assert(n == 1L)
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
