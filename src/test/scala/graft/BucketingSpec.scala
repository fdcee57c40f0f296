package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Bucketing: pre-partitioning fact tables on the join key removes the
  * per-query exchange entirely — the SURVEY §5 co-location story,
  * asserted on the physical plan. At 100 TB this turns the nightly
  * lineitem⋈orders from a 2×full-shuffle into a zero-shuffle merge.
  */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val wh = java.nio.file.Files.createTempDirectory("graft_buckets").toString
    graft.core.Graft.tune(SparkSession.builder().master("local[4]"), 4)
      .config("spark.sql.warehouse.dir", wh)
      // isolate from any other suite's in-memory catalog state
      .getOrCreate()
  }

  private def shuffles(plan: org.apache.spark.sql.execution.SparkPlan): Int = {
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: (p match {
        case a: AdaptiveSparkPlanExec => walk(a.inputPlan)
        case _ => p.children.flatMap(walk)
      })
    walk(plan).count(_.isInstanceOf[ShuffleExchangeExec])
  }

  test("bucketed fact-fact join plans with zero shuffle exchanges") {
    val t = Tables(spark, "/root/testdata/sf0.001")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // the in-memory catalog forgets tables across JVMs while their
    // warehouse directories persist — clear the locations as well
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("li_b", "ord_b").foreach { t =>
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        import scala.reflect.io.Directory
        new Directory(d).deleteRecursively()
      }
    }
    t.lineitem.select("l_orderkey", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").saveAsTable("li_b")
    t.orders.select("o_orderkey", "o_orderdate")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").saveAsTable("ord_b")

    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
    val nShuffles = shuffles(joined.queryExecution.executedPlan)
    assert(nShuffles == 0, s"expected bucket co-location, got $nShuffles shuffles\n" +
      joined.queryExecution.executedPlan.toString.take(1500))
    // and the join is still correct
    assert(joined.count() ==
      t.lineitem.join(t.orders, col("l_orderkey") === col("o_orderkey")).count())
  }
}
