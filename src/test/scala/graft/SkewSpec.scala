package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew
import graft.sources.Tables

/** Salting utilities must be result-identical to their unsalted forms. */
class SkewSpec extends AnyFunSuite {

  private lazy val spark: SparkSession =
    graft.core.Graft.tune(SparkSession.builder().master("local[4]"), 4).getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  test("saltedAgg == plain agg (count + decimal sum per returnflag)") {
    val li = Tables(spark, dir).lineitem
    val plain = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    val salted = Skew.saltedAgg(
      li,
      key = Seq(col("l_returnflag")),
      saltSource = col("l_orderkey"),
      factor = 8,
      aggs = Seq(
        ("n", c => count(c), c => sum(c)),
        ("q", c => sum(c.cast("decimal(18,2)")), c => sum(c))),
      valueCols = Seq(lit(1), col("l_quantity")))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    assert(salted == plain)
  }

  test("saltedJoin == plain join (lineitem x supplier)") {
    val t = Tables(spark, dir)
    val li = t.lineitem.select(col("l_orderkey"), col("l_linenumber"),
      col("l_suppkey").as("s_suppkey"))
    val plain = li.join(t.supplier, Seq("s_suppkey"))
      .select("l_orderkey", "l_linenumber", "s_suppkey", "s_name")
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(li, t.supplier, "s_suppkey",
        bigSaltSource = col("l_orderkey") * 16 + col("l_linenumber"), factor = 4)
      .select("l_orderkey", "l_linenumber", "s_suppkey", "s_name")
      .collect().map(_.toString).sorted
    assert(salted.sameElements(plain))
  }

  test("annIvf returns ranked neighbors per query") {
    val d = graft.operators.Ann.annIvf(spark, dir)
    val rows = d.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(1) <= 10))
    // every query's rank sequence starts at 1
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.map(_.getInt(1)).min == 1))
  }
}
