package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fns._
import graft.sources.Tables

/** Core-layer operators (SURVEY §2 A6–A10) — the engine's equivalents of
  * fact_trips.sql (tagged union-all + double role-join to a filtered
  * dim), dm_monthly_zone_revenue.sql / dm_monthly_zone_statistics
  * (grouped monthly rollups), and the README's dbt metric
  * (time-grained filtered average).
  *
  * Scale notes: the only wide exchange in the fact build is
  * lineitem ⋈ orders on the order key (fact-fact); every dim side
  * (nation⋈region dim, supplier, customer) is broadcast- or
  * AQE-eligible. At 1000 executors the union-all is free (no shuffle —
  * it's plan-level concatenation), and the rollups reuse the fact's
  * exchange only through their own groupBy keys.
  */
object Facts {

  /** A6: the fact build (fact_trips.sql). Two tagged sources union-all'd
    * (green/yellow → 'Open'/'Final' line status), then two role-joins to
    * the same filtered dim (pickup/dropoff zone → supplier-side and
    * customer-side nation zone), inner joins dropping unmatched rows.
    */
  def factLineitem(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    // ref_dim_zones analog: dim filtered like `borough != 'Unknown'`
    val dim = Staging.seedDim(spark, dir).filter(col("region_name") =!= "AFRICA")
    val suppDim = dim.select(col("n_nationkey").as("supp_nationkey"),
      col("zone_name").as("supp_zone"), col("region_name").as("supp_region"))
    val custDim = dim.select(col("n_nationkey").as("cust_nationkey"),
      col("zone_name").as("cust_zone"), col("region_name").as("cust_region"))

    // green_data / yellow_data analog: tagged subsets. r11 (guide
    // §2.3): the tag used to be a unionByName of two filtered scans —
    // 2 full lineitem reads per fact build, feeding every downstream
    // rollup. The registered oracle has always stated the single-scan
    // form (`CASE l_linestatus WHEN 'O' THEN 'Open' ELSE 'Final' END`
    // over the unfiltered table), so the case-map is the EXACT oracle
    // shape: one scan, same rows, same values (the feed's linestatus
    // domain is {O, F}; on any other value the case-map matches the
    // oracle where the union silently dropped the row).
    val unioned = t.lineitem.withColumn("service_type",
      when(col("l_linestatus") === "O", "Open").otherwise("Final"))

    // suppDim/custDim are nation-scale (fixed 25 rows) → safe broadcast
    // hints; supplier/customer scale with SF, so AQE decides their join
    // strategy (broadcast at small SF, shuffle join at scale).
    unioned
      .join(t.supplier.select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppDim), col("s_nationkey") === col("supp_nationkey"))
      .join(t.orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.customer.select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(custDim), col("c_nationkey") === col("cust_nationkey"))
      .select(
        surrogateKey(col("l_orderkey"), col("l_linenumber")).as("tripid"),
        col("l_orderkey"), col("l_linenumber"), col("service_type"),
        col("l_suppkey"), col("supp_zone"), col("supp_region"),
        col("o_custkey"), col("cust_zone"), col("cust_region"),
        col("l_shipdate"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"), col("l_returnflag"))
  }

  val factLineitemSql: String =
    """SELECT
      |  md5(concat_ws('-', coalesce(CAST(l_orderkey AS VARCHAR), ''), coalesce(CAST(l_linenumber AS VARCHAR), ''))) AS tripid,
      |  l_orderkey, l_linenumber,
      |  CASE l_linestatus WHEN 'O' THEN 'Open' ELSE 'Final' END AS service_type,
      |  l_suppkey, supp.zone_name AS supp_zone, supp.region_name AS supp_region,
      |  o_custkey, cust.zone_name AS cust_zone, cust.region_name AS cust_region,
      |  l_shipdate, l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN (SELECT n_nationkey, replace(n_name,'NATION_','ZONE_') AS zone_name, replace(r_name,'MIDDLE ','M_') AS region_name
      |      FROM nation JOIN region ON n_regionkey = r_regionkey WHERE r_name != 'AFRICA') supp
      |  ON s_nationkey = supp.n_nationkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN (SELECT n_nationkey, replace(n_name,'NATION_','ZONE_') AS zone_name, replace(r_name,'MIDDLE ','M_') AS region_name
      |      FROM nation JOIN region ON n_regionkey = r_regionkey WHERE r_name != 'AFRICA') cust
      |  ON c_nationkey = cust.n_nationkey""".stripMargin

  /** A7: dm_monthly_zone_revenue.sql — group by (zone, month-truncated
    * ts, service tag); monthly revenue sums + trip count + averages.
    * Partial (map-side) aggregation shrinks the exchange to
    * |zones|×|months|×2 rows per task.
    */
  def monthlyRollup(spark: SparkSession, dir: String): DataFrame =
    monthlyRollupFrom(factLineitem(spark, dir))

  /** Same rollup over an already-materialized fact table (the dbt-style
    * build path: downstream models read upstream materializations).
    */
  def monthlyRollupFrom(fact: DataFrame): DataFrame = {
    // fixed-point money kernels (r8, see Analytics.q1Pricing): exact
    // integer cents/bp per row, long split-accumulator partials over the
    // exchange, decimal reconstruction on the (zone, month, type) frame —
    // bit-identical doubles to the previous decimal aggregation
    val c = cents(col("l_extendedprice"))
    val qc = cents(col("l_quantity"))
    val d = bp(col("l_discount"))
    val tx = bp(col("l_tax"))
    val pd = c * d                   // ep·disc, scale 6
    val pt = c * tx                  // ep·tax, scale 6
    val p1 = c * (lit(10000L) - d)   // ep·(1−disc), scale 6
    val p2 = p1 * (lit(10000L) + tx) // ·(1+tax), scale 10
    fact
      .select(col("supp_zone"), col("l_shipdate"), col("service_type"),
        col("tripid"), qc.as("qc"), c.as("c"),
        splitHi(pd).as("pdh"), splitLo(pd).as("pdl"),
        splitHi(pt).as("pth"), splitLo(pt).as("ptl"),
        splitHi(p1).as("p1h"), splitLo(p1).as("p1l"),
        splitHi(p2).as("p2h"), splitLo(p2).as("p2l"))
      .groupBy(col("supp_zone").as("revenue_zone"),
        date_trunc("month", col("l_shipdate")).as("revenue_month"),
        col("service_type"))
      .agg(sum(col("qc")).as("sqc"), sum(col("c")).as("sc"),
        sum(col("pdh")).as("spdh"), sum(col("pdl")).as("spdl"),
        sum(col("pth")).as("spth"), sum(col("ptl")).as("sptl"),
        sum(col("p1h")).as("sp1h"), sum(col("p1l")).as("sp1l"),
        sum(col("p2h")).as("sp2h"), sum(col("p2l")).as("sp2l"),
        count(col("tripid")).as("total_monthly_trips"))
      .select(col("revenue_zone"), col("revenue_month"), col("service_type"),
        fixedToDouble(col("sqc"), 100L).as("revenue_monthly_quantity"),
        fixedToDouble(col("sc"), 100L).as("revenue_monthly_base"),
        split6ToDouble(col("spdh"), col("spdl")).as("revenue_monthly_discount"),
        split6ToDouble(col("spth"), col("sptl")).as("revenue_monthly_tax"),
        split6ToDouble(col("sp1h"), col("sp1l")).as("revenue_monthly_disc_price"),
        split10ToDouble(col("sp2h"), col("sp2l")).as("revenue_monthly_total"),
        col("total_monthly_trips"),
        (fixedToDouble(col("sqc"), 100L) / col("total_monthly_trips"))
          .as("avg_monthly_quantity"),
        (fixedToDouble(col("sc"), 100L) / col("total_monthly_trips"))
          .as("avg_monthly_price"))
  }

  private val factCte: String =
    """WITH fact AS (
      |  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, l_shipdate,
      |    CASE l_linestatus WHEN 'O' THEN 'Open' ELSE 'Final' END AS service_type,
      |    supp.zone_name AS supp_zone, supp.region_name AS supp_region,
      |    cust.zone_name AS cust_zone, cust.region_name AS cust_region
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN (SELECT n_nationkey, replace(n_name,'NATION_','ZONE_') AS zone_name, replace(r_name,'MIDDLE ','M_') AS region_name
      |        FROM nation JOIN region ON n_regionkey = r_regionkey WHERE r_name != 'AFRICA') supp
      |    ON s_nationkey = supp.n_nationkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN (SELECT n_nationkey, replace(n_name,'NATION_','ZONE_') AS zone_name, replace(r_name,'MIDDLE ','M_') AS region_name
      |        FROM nation JOIN region ON n_regionkey = r_regionkey WHERE r_name != 'AFRICA') cust
      |    ON c_nationkey = cust.n_nationkey
      |)""".stripMargin

  val monthlyRollupSql: String = factCte +
    """
      |SELECT supp_zone AS revenue_zone,
      |  CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS revenue_month,
      |  service_type,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS revenue_monthly_quantity,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue_monthly_base,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(8,4))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue_monthly_discount,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(8,4))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue_monthly_tax,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue_monthly_disc_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(8,4)) - CAST(l_discount AS DECIMAL(8,4))) * (CAST(1 AS DECIMAL(8,4)) + CAST(l_tax AS DECIMAL(8,4)))) AS DECIMAL(38,6)) AS DOUBLE) AS revenue_monthly_total,
      |  COUNT(*) AS total_monthly_trips,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_monthly_quantity,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_monthly_price
      |FROM fact
      |GROUP BY 1, 2, 3""".stripMargin

  /** Rollup rows whose total revenue is NULL — the oracle face of the
    * core schema.yml not_null guard (severity error), consumed by
    * Checks.checkSummarySql. DuckDB accepts the rollup CTE nested in a
    * subquery.
    */
  val rollupTotalNullsSql: String =
    s"SELECT 1 FROM (\n$monthlyRollupSql\n) r WHERE revenue_monthly_total IS NULL"

  /** A8: dm_monthly_zone_statistics.sql (README step 2a) — same grouping
    * keys, count + averages only.
    */
  def monthlyStats(spark: SparkSession, dir: String): DataFrame =
    monthlyStatsFrom(factLineitem(spark, dir))

  def monthlyStatsFrom(fact: DataFrame): DataFrame =
    fact
      .groupBy(col("supp_zone").as("stats_zone"),
        date_trunc("month", col("l_shipdate")).as("stats_month"),
        col("service_type"))
      .agg(
        count(col("tripid")).as("total_monthly_trips"),
        decAvg(col("l_quantity")).as("avg_monthly_quantity"),
        decAvg(col("l_extendedprice")).as("avg_monthly_price"))

  val monthlyStatsSql: String = factCte +
    """
      |SELECT supp_zone AS stats_zone,
      |  CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS stats_month,
      |  service_type,
      |  COUNT(*) AS total_monthly_trips,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_monthly_quantity,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_monthly_price
      |FROM fact
      |GROUP BY 1, 2, 3""".stripMargin

  /** A9: the dbt metric (README §4–5): average of a measure at month
    * grain with two dim equality filters (pickup_borough = 'Manhattan'
    * AND dropoff_borough = 'Manhattan' → supp/cust region = 'EUROPE').
    */
  def metricMonthly(spark: SparkSession, dir: String): DataFrame =
    metricMonthlyFrom(factLineitem(spark, dir))

  def metricMonthlyFrom(fact: DataFrame): DataFrame =
    fact
      .filter(col("supp_region") === "EUROPE" && col("cust_region") === "EUROPE")
      .groupBy(date_trunc("month", col("l_shipdate")).as("grain_month"))
      .agg(decAvg(col("l_quantity")).as("average_quantity"))

  val metricMonthlySql: String = factCte +
    """
      |SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS grain_month,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS average_quantity
      |FROM fact
      |WHERE supp_region = 'EUROPE' AND cust_region = 'EUROPE'
      |GROUP BY 1""".stripMargin

  /** A10b: quarter grain of the same metric. */
  def metricQuarterly(spark: SparkSession, dir: String): DataFrame =
    metricQuarterlyFrom(factLineitem(spark, dir))

  def metricQuarterlyFrom(fact: DataFrame): DataFrame =
    fact
      .filter(col("supp_region") === "EUROPE" && col("cust_region") === "EUROPE")
      .groupBy(date_trunc("quarter", col("l_shipdate")).as("grain_quarter"))
      .agg(decAvg(col("l_quantity")).as("average_quantity"))

  val metricQuarterlySql: String = factCte +
    """
      |SELECT CAST(date_trunc('quarter', l_shipdate) AS TIMESTAMP) AS grain_quarter,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS average_quantity
      |FROM fact
      |WHERE supp_region = 'EUROPE' AND cust_region = 'EUROPE'
      |GROUP BY 1""".stripMargin

  /** A10: same metric at year grain (time_grains: [month, quarter,
    * year] parameterization).
    */
  def metricYearly(spark: SparkSession, dir: String): DataFrame =
    metricYearlyFrom(factLineitem(spark, dir))

  def metricYearlyFrom(fact: DataFrame): DataFrame =
    fact
      .filter(col("supp_region") === "EUROPE" && col("cust_region") === "EUROPE")
      .groupBy(date_trunc("year", col("l_shipdate")).as("grain_year"))
      .agg(decAvg(col("l_quantity")).as("average_quantity"))

  val metricYearlySql: String = factCte +
    """
      |SELECT CAST(date_trunc('year', l_shipdate) AS TIMESTAMP) AS grain_year,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS average_quantity
      |FROM fact
      |WHERE supp_region = 'EUROPE' AND cust_region = 'EUROPE'
      |GROUP BY 1""".stripMargin
}
