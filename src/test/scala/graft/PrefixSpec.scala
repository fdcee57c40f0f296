package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Randomized-trial properties for the distributed prefix primitives
  * ([[graft.operators.Corpus.globalIndex]] / `prefixSum`) — sizes
  * around partition boundaries, duplicate order keys, skewed single
  * values, empty input — each checked against the (non-scalable)
  * single-window formulation.
  */
class PrefixSpec extends AnyFunSuite {

  private lazy val spark: SparkSession =
    graft.core.Graft.tune(SparkSession.builder().master("local[4]"), 4).getOrCreate()

  private def trial(n: Int, seed: Long, maxKey: Long): Unit = {
    import spark.implicits._
    val rnd = new java.util.Random(seed)
    val rows = (0 until n).map { i =>
      (i.toLong, rnd.nextLong() % maxKey, math.abs(rnd.nextLong() % 50L))
    }
    val df = rows.toDF("id", "key", "v")
      .repartition(1 + rnd.nextInt(7)) // arbitrary input partitioning

    val gi = graft.operators.Corpus.globalIndex(
      df, Seq(col("key"), col("id")), "pos")
    val wGi = df.withColumn("pos",
      row_number().over(Window.orderBy(col("key"), col("id"))).cast("long") - 1)
    assert(gi.exceptAll(wGi).count() == 0 && wGi.exceptAll(gi).count() == 0,
      s"globalIndex mismatch n=$n seed=$seed maxKey=$maxKey")

    val ps = graft.operators.Corpus.prefixSum(
      df, Seq(col("key"), col("id")), "v", "run")
    val wPs = df.withColumn("run",
      coalesce(sum(col("v")).over(Window.orderBy(col("key"), col("id"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    assert(ps.exceptAll(wPs).count() == 0 && wPs.exceptAll(ps).count() == 0,
      s"prefixSum mismatch n=$n seed=$seed maxKey=$maxKey")
  }

  test("prefix primitives handle null order keys (nulls-first, same as window)") {
    import spark.implicits._
    val df = (0 until 200).map(i => (i.toLong, i % 7L, (i % 50).toLong))
      .toDF("id", "key", "v")
      .withColumn("key",
        when(col("key") === 0L, lit(null).cast("long")).otherwise(col("key")))
      .repartition(3)
    val gi = graft.operators.Corpus.globalIndex(df, Seq(col("key"), col("id")), "pos")
    val w = row_number().over(Window.orderBy(col("key"), col("id"))).cast("long") - 1
    val ref = df.withColumn("pos", w)
    assert(gi.exceptAll(ref).count() == 0 && ref.exceptAll(gi).count() == 0)
  }

  test("prefixSum is exact past the range-sampler divergence regime (>=20k rows)") {
    // Regression: planning the sort twice drew different range boundaries
    // from ~20k rows up (RangePartitioner seeds its sample with rdd.id),
    // silently corrupting offsets. Both passes now share one RDD instance.
    trial(25000, 42L, 1000000L)
    trial(25000, 43L, 7L) // heavy duplicate keys at the same size
  }

  test("prefix primitives match the window faces across random shapes") {
    // sizes straddle empty/one/partition-count/larger; maxKey=1 forces
    // every row into ONE range-partition key (worst-case skew), large
    // maxKey makes keys unique
    for ((n, seed) <- Seq((0, 1L), (1, 2L), (4, 3L), (33, 4L), (1000, 5L));
         maxKey <- Seq(1L, 3L, 1000000L))
      trial(n, seed, maxKey)
  }
}
