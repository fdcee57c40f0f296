package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Partition-count invariance — the property SURVEY §8's arithmetic
  * discipline buys: a query's RESULT must be bit-identical no matter
  * how the cluster splits the work. Each representative query runs
  * under two different `spark.sql.shuffle.partitions` settings (which
  * changes partial-agg grouping, sort ranges, and join layouts) and the
  * row sets must match exactly — including every double.
  */
class InvarianceSpec extends AnyFunSuite {

  private lazy val spark: SparkSession =
    graft.core.Graft.tune(SparkSession.builder().master("local[4]"), 4).getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  private def collectWith(name: String, partitions: Int): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
    try SparkEntry.queries(name)(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  // queries spanning every arithmetic class: decimal money sums, IEEE
  // division, window frames, prefix primitives, sketch-free filters
  private val Representative = Seq(
    "q1_pricing", "q_monthly_rollup", "q_outliers", "q_unigram_logprob",
    "q_seq_pack", "q_corpus_shuffle", "q_reservoir_sample",
    "q_moving_avg", "q_asof_native", "q_mixture_rebalance")

  Representative.foreach { name =>
    test(s"$name is partition-count invariant (5 vs 17 shuffle partitions)") {
      assert(collectWith(name, 5) == collectWith(name, 17), name)
    }
  }
}
