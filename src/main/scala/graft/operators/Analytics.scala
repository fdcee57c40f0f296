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
    *
    * r8: the aggregation runs on the Fns fixed-point money kernels —
    * per-row exact cents/bp, long split-accumulator sums, decimal
    * reconstruction only on the |groups| frame — because decimal(38,…)
    * sum buffers leave Spark's compact-long representation and run the
    * hash-agg update loop 4–7× slower (measured at 64× sf0.1). The
    * emitted doubles are bit-for-bit the previous decimal face's (same
    * exact rationals, same final cast chain); the oracle is unchanged.
    */
  def q1Pricing(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    val c = cents(col("l_extendedprice"))
    val qc = cents(col("l_quantity"))
    val d = bp(col("l_discount"))
    val t = bp(col("l_tax"))
    val p1 = c * (lit(10000L) - d) // extprice·(1−disc), scale-6 integer
    val p2 = p1 * (lit(10000L) + t) // ·(1+tax), scale-10 integer
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .select(col("l_returnflag"), col("l_linestatus"),
        qc.as("qc"), c.as("c"), d.as("d"),
        splitHi(p1).as("p1h"), splitLo(p1).as("p1l"),
        splitHi(p2).as("p2h"), splitLo(p2).as("p2l"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("qc")).as("sqc"), sum(col("c")).as("sc"), sum(col("d")).as("sd"),
        sum(col("p1h")).as("sp1h"), sum(col("p1l")).as("sp1l"),
        sum(col("p2h")).as("sp2h"), sum(col("p2l")).as("sp2l"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"),
        fixedToDouble(col("sqc"), 100L).as("sum_qty"),
        fixedToDouble(col("sc"), 100L).as("sum_base_price"),
        split6ToDouble(col("sp1h"), col("sp1l")).as("sum_disc_price"),
        split10ToDouble(col("sp2h"), col("sp2l")).as("sum_charge"),
        (fixedToDouble(col("sqc"), 100L) / col("count_order")).as("avg_qty"),
        (fixedToDouble(col("sc"), 100L) / col("count_order")).as("avg_price"),
        (fixedToDouble(col("sd"), 10000L) / col("count_order")).as("avg_disc"),
        col("count_order"))
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
    // fixed-point revenue (r8, see q1Pricing): scale-6 integer per row,
    // split long sums, decimal reconstruction on the |months| frame
    val rev = cents(col("l_extendedprice")) * (lit(10000L) - bp(col("l_discount")))
    val promoRev = when(col("p_type") === "PROMO", rev).otherwise(lit(0L))
    t.lineitem
      .join(t.part, col("l_partkey") === col("p_partkey"))
      .select(date_trunc("month", col("l_shipdate")).as("month"),
        splitHi(rev).as("rh"), splitLo(rev).as("rl"),
        splitHi(promoRev).as("ph"), splitLo(promoRev).as("pl"))
      .groupBy(col("month"))
      .agg(sum(col("ph")).as("sph"), sum(col("pl")).as("spl"),
        sum(col("rh")).as("srh"), sum(col("rl")).as("srl"),
        count(lit(1)).as("n_items"))
      .select(col("month"),
        split6ToDouble(col("sph"), col("spl")).as("promo_revenue"),
        split6ToDouble(col("srh"), col("srl")).as("total_revenue"),
        col("n_items"))
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
    // fixed-point revenue (r8, see q1Pricing) — the grouping key here is
    // high-cardinality (every qualifying order), exactly where decimal
    // partial-agg buffers hurt most
    val rev = cents(col("l_extendedprice")) * (lit(10000L) - bp(col("l_discount")))
    li.join(ord.join(cust, col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("o_orderdate"),
        splitHi(rev).as("rh"), splitLo(rev).as("rl"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(col("rh")).as("srh"), sum(col("rl")).as("srl"))
      .select(col("l_orderkey"), col("o_orderdate"),
        split6ToDouble(col("srh"), col("srl")).as("revenue"))
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
    // fixed-point quantity cents (r8, see q1Pricing): long sum per order
    // (bounded: ≤ 5000/row), exact reconstruction, identical double
    val heavy = t.lineitem
      .select(col("l_orderkey"), cents(col("l_quantity")).as("qc"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("qc")).as("sqc"))
      .select(col("l_orderkey"), fixedToDouble(col("sqc"), 100L).as("total_qty"))
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
      // fixed-point revenue (r8, see q1Pricing)
      .select(col("n_name"),
        splitHi(cents(col("l_extendedprice")) * (lit(10000L) - bp(col("l_discount")))).as("rh"),
        splitLo(cents(col("l_extendedprice")) * (lit(10000L) - bp(col("l_discount")))).as("rl"))
      .groupBy(col("n_name"))
      .agg(sum(col("rh")).as("srh"), sum(col("rl")).as("srl"))
      .select(col("n_name"), split6ToDouble(col("srh"), col("srl")).as("revenue"))
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
