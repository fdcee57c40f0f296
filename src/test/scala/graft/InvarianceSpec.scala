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

  // Blanket: EVERY query must be partition-invariant — except operators
  // whose SKETCH is inherently merge-order sensitive (GK/KLL quantile
  // digests give different — but bounded — answers under different
  // merges; HLL by contrast is a commutative lattice and stays).
  private val MergeOrderSensitive = Set("q_approx_percentiles")

  SparkEntry.queries.keys.toSeq.sorted
    .filterNot(MergeOrderSensitive).foreach { name =>
      test(s"$name is partition-count invariant (5 vs 17 shuffle partitions)") {
        assert(collectWith(name, 5) == collectWith(name, 17), name)
      }
    }
}
