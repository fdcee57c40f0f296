package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every implemented operator is exposed here as a `(spark, sfDir) =>
  * DataFrame` plus (where portably expressible) a DuckDB oracle SQL.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B: headline analytics
    "q1_pricing" -> (Analytics.q1Pricing _),
    "q3_topk" -> (Analytics.q3TopK _),
    "q5_join5" -> (Analytics.q5Join5 _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing" -> Analytics.q1PricingSql,
    "q3_topk" -> Analytics.q3TopKSql,
    "q5_join5" -> Analytics.q5Join5Sql,
  )
}
