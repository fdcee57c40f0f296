package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fns._
import graft.sources.Tables

/** Table profiling — the PipeRider side of the reference (the workshop
  * pairs dbt models with PipeRider data profiling; see
  * /root/reference README's `piperider run` step). A profile is a
  * per-column summary: row count, null count, distinct count, min /
  * max / mean.
  *
  * Scale shape: ALL columns' metrics come from ONE aggregation pass
  * over the table (multi-distinct lowered by Catalyst to a single
  * Expand), then the one 1-row result is unpivoted to long form —
  * versus a per-column loop, which scans the table once per column.
  * Averages follow the §8 decimal discipline so the profile is
  * bit-identical to the DuckDB oracle.
  */
object Profile {

  /** (column, decimal precision, decimal scale) for the mean. */
  private val Cols = Seq(
    ("l_quantity", 18, 2), ("l_extendedprice", 18, 2), ("l_discount", 8, 4))

  /** One profile row per numeric lineitem column. */
  def profileNumeric(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir).lineitem
    def metrics(c: String, p: Int, s: Int): Seq[Column] = Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nnull"),
      countDistinct(col(c)).as(s"${c}_ndist"),
      min(col(c)).cast("double").as(s"${c}_min"),
      max(col(c)).cast("double").as(s"${c}_max"),
      (sum(dec(col(c), p, s)).cast("double") / count(lit(1))).as(s"${c}_avg"))
    val aggs = count(lit(1)).as("n_rows") +:
      Cols.flatMap { case (c, p, s) => metrics(c, p, s) }
    val one = li.agg(aggs.head, aggs.tail: _*)
    val structs = Cols.map { case (c, _, _) =>
      struct(lit(c).as("column_name"), col("n_rows"),
        col(s"${c}_nnull").as("n_null"), col(s"${c}_ndist").as("n_distinct"),
        col(s"${c}_min").as("min_v"), col(s"${c}_max").as("max_v"),
        col(s"${c}_avg").as("avg_v"))
    }
    one.select(explode(array(structs: _*)).as("p")).select(col("p.*"))
  }

  val profileNumericSql: String = {
    def m(c: String, short: String, p: Int, s: Int): String =
      s"""CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ${short}_nnull,
         |    COUNT(DISTINCT $c) AS ${short}_ndist,
         |    CAST(MIN($c) AS DOUBLE) AS ${short}_min,
         |    CAST(MAX($c) AS DOUBLE) AS ${short}_max,
         |    CAST(SUM(CAST($c AS DECIMAL($p,$s))) AS DOUBLE) / COUNT(*) AS ${short}_avg""".stripMargin
    s"""WITH a AS (
       |  SELECT COUNT(*) AS n_rows,
       |    ${m("l_quantity", "q", 18, 2)},
       |    ${m("l_extendedprice", "e", 18, 2)},
       |    ${m("l_discount", "d", 8, 4)}
       |  FROM lineitem)
       |SELECT 'l_quantity' AS column_name, n_rows, q_nnull AS n_null,
       |  q_ndist AS n_distinct, q_min AS min_v, q_max AS max_v, q_avg AS avg_v
       |FROM a
       |UNION ALL
       |SELECT 'l_extendedprice', n_rows, e_nnull, e_ndist, e_min, e_max, e_avg FROM a
       |UNION ALL
       |SELECT 'l_discount', n_rows, d_nnull, d_ndist, d_min, d_max, d_avg FROM a""".stripMargin
  }
}
