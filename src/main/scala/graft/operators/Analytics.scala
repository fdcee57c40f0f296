package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fns._
import graft.sources.Tables

/** Headline analytics (SURVEY §2 B-block): the TPC-H-shaped scan-agg and
  * join pipelines used as the bench set. These exercise the same engine
  * muscles the reference's core models need — wide aggregation, star
  * joins, top-k — declared as DataFrame plans so Catalyst handles
  * pushdown, join strategy, and AQE re-planning.
  */
object Analytics {

  /** B1: wide scan-aggregate (TPC-H Q1 shape). Filter is pushed to the
    * parquet scan; single shuffle on the 6-value grouping key;
    * map-side partial aggregation makes the exchange tiny.
    */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    val one = lit(1).cast("decimal(8,4)")
    val discDec = dec(col("l_discount"), 8, 4)
    val taxDec = dec(col("l_tax"), 8, 4)
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decSum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_base_price"),
        decSumProd(dec(col("l_extendedprice")) * (one - discDec)).as("sum_disc_price"),
        decSumProd(dec(col("l_extendedprice")) * (one - discDec) * (one + taxDec)).as("sum_charge"),
        decAvg(col("l_quantity")).as("avg_qty"),
        decAvg(col("l_extendedprice")).as("avg_price"),
        decAvg(col("l_discount"), 8, 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))) * (CAST(1 AS DECIMAL(8,4)) + CAST(l_tax AS DECIMAL(8,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** B5: promotion revenue share per month (TPC-H Q14 shape) — the
    * lineitem⋈part enrichment join the other headliners don't exercise.
    * part scales with SF, so no broadcast hint (AQE decides); revenue
    * math follows the §8 decimal discipline, and the percentage is one
    * double division at the end with a stated operand order.
    */
  def q14Promo(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val one = lit(1).cast("decimal(8,4)")
    val rev = dec(col("l_extendedprice")) * (one - dec(col("l_discount"), 8, 4))
    t.lineitem
      .join(t.part, col("l_partkey") === col("p_partkey"))
      .groupBy(date_trunc("month", col("l_shipdate")).as("month"))
      .agg(
        decSumProd(when(col("p_type") === "PROMO", rev).otherwise(lit(0))).as("promo_revenue"),
        decSumProd(rev).as("total_revenue"),
        count(lit(1)).as("n_items"))
      .select(col("month"), col("promo_revenue"), col("total_revenue"),
        (col("promo_revenue") * 100 / col("total_revenue")).as("promo_pct"),
        col("n_items"))
  }

  val q14PromoSql: String = {
    val rev = "CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))"
    s"""SELECT date_trunc('month', l_shipdate) AS month,
       |  CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $rev ELSE 0 END) AS DECIMAL(38,6)) AS DOUBLE) AS promo_revenue,
       |  CAST(CAST(SUM($rev) AS DECIMAL(38,6)) AS DOUBLE) AS total_revenue,
       |  CAST(CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $rev ELSE 0 END) AS DECIMAL(38,6)) AS DOUBLE) * 100
       |    / CAST(CAST(SUM($rev) AS DECIMAL(38,6)) AS DOUBLE) AS promo_pct,
       |  COUNT(*) AS n_items
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY 1""".stripMargin
  }

  /** B2: shipping-priority top-k (TPC-H Q3 shape). customer scales with
    * SF, so no hard broadcast hint — AQE picks broadcast when the
    * filtered side is small and falls back to shuffle join at scale;
    * orders⋈lineitem is the only unavoidable big exchange; top-k via
    * deterministic order + limit.
    */
  def q3TopK(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val cust = t.customer.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = t.orders
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = t.lineitem
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord.join(cust, col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(decSumProd(dec(col("l_extendedprice")) * (lit(1).cast("decimal(8,4)") - dec(col("l_discount"), 8, 4)))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** B4 (TPC-H Q18 shape): large-quantity orders — aggregate lineitem
    * per order, HAVING-filter the heavy ones, join back to
    * orders+customer for attribution. The having-aggregate is the
    * semi-join driver: only qualifying orderkeys (a sliver) reach the
    * enrichment joins, so at 100 TB the big join probes shrink to the
    * filter's selectivity. Quantity sums are exact decimals.
    */
  def q18BigOrders(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val heavy = t.lineitem
      .groupBy(col("l_orderkey"))
      .agg(decSum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 250.0)
    heavy
      .join(t.orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.customer.select("c_custkey", "c_name"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_custkey").as("c_custkey"),
        col("o_orderkey"), col("o_orderdate"),
        dec(col("o_totalprice")).cast("double").as("o_totalprice"),
        col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18BigOrdersSql: String =
    """WITH heavy AS (
      |  SELECT l_orderkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |  FROM lineitem GROUP BY 1
      |  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250.0)
      |SELECT c_name, c_custkey, o_orderkey, o_orderdate,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
      |  total_qty
      |FROM heavy
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  val q3TopKSql: String =
    """SELECT l_orderkey, o_orderdate,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** B3: 6-way star join (TPC-H Q5 shape). region/nation are true
    * fixed-size dims and carry broadcast hints; customer/supplier scale
    * with SF, so their join strategy is left to AQE (broadcast while
    * the region-filtered side fits, shuffle join past the threshold).
    * lineitem⋈orders is the fact exchange. The n_nationkey = c_nationkey
    * = s_nationkey constraint mirrors Q5's "local supplier" semantics.
    */
  def q5Join5(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    val nr = t.nation.join(
      broadcast(t.region.filter(col("r_name") === "ASIA")),
      col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = t.customer.join(broadcast(nr), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"))
    val supp = t.supplier.join(broadcast(nr), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"))
    val ord = t.orders
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    t.lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp,
        col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .join(broadcast(t.nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(decSumProd(dec(col("l_extendedprice")) * (lit(1).cast("decimal(8,4)") - dec(col("l_discount"), 8, 4)))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Join5Sql: String =
    """SELECT n_name,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin
}
