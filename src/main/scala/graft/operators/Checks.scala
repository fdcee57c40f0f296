package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-quality check operators (SURVEY §2 A11–A14) — the engine's
  * equivalents of the reference's dbt schema tests
  * (models/staging/schema.yml: `unique`, `not_null`, `relationships`,
  * `accepted_values`). Like dbt, each check is a query returning the
  * VIOLATING rows (a passing check returns 0 rows); counts are grouped
  * so the result stays tiny at any scale.
  */
object Checks {

  /** A11: `unique` test on the staging dedup key (schema.yml tripid
    * unique) — duplicate (user_id, event_type) keys with multiplicity.
    */
  def checkUnique(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") > 1)

  val checkUniqueSql: String =
    """SELECT user_id, event_type, COUNT(*) AS n_rows
      |FROM events
      |GROUP BY user_id, event_type
      |HAVING COUNT(*) > 1""".stripMargin

  /** A12: `not_null` test — null counts per guarded column, one summary
    * row (schema.yml tripid not_null).
    */
  def checkNotNull(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).events
      .agg(
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("null_user_id"),
        sum(when(col("event_type").isNull, 1L).otherwise(0L)).as("null_event_type"),
        sum(when(col("ts").isNull, 1L).otherwise(0L)).as("null_ts"),
        count(lit(1)).as("total_rows"))

  // DuckDB SUM(BIGINT) yields HUGEINT, which the python client narrows
  // to float64 — CAST to BIGINT so the oracle's dtype matches Spark's
  // int64 (COUNT needs no cast: it is already BIGINT).
  val checkNotNullSql: String =
    """SELECT
      |  CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user_id,
      |  CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_event_type,
      |  CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_ts,
      |  COUNT(*) AS total_rows
      |FROM events""".stripMargin

  /** A13: `relationships` test (schema.yml pickup_locationid →
    * taxi_zone_lookup.locationid) — FK orphans via broadcast left-anti
    * join: events.user_id with no matching customer.c_custkey.
    */
  def checkRelationships(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir)
    t.events
      .join(broadcast(t.customer.select("c_custkey")),
        col("user_id") === col("c_custkey"), "left_anti")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_orphans"))
  }

  val checkRelationshipsSql: String =
    """SELECT user_id, COUNT(*) AS n_orphans
      |FROM events
      |WHERE user_id NOT IN (SELECT c_custkey FROM customer)
      |GROUP BY user_id""".stripMargin

  /** A14: `accepted_values` test (schema.yml payment_type in
    * var('payment_type_values')) — rows whose status falls outside the
    * accepted domain, with counts.
    */
  def checkAcceptedValues(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).orders
      .filter(!col("o_orderstatus").isin("O", "F"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_rows"))

  val checkAcceptedValuesSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_rows
      |FROM orders
      |WHERE o_orderstatus NOT IN ('O', 'F')
      |GROUP BY o_orderstatus""".stripMargin

  /** A21: the `dbt test` run itself — every schema test executed and
    * folded to one (test_name, severity, n_violations, passed, status)
    * row each, exactly the summary dbt prints. Severity mirrors the
    * reference's schema.yml: every staging test is `severity: warn`
    * (models/staging/schema.yml:37,39,59,92), the core revenue not_null
    * is `severity: error` (models/core/schema.yml:23–24). `status` is
    * what a dbt user reads first: pass, warn (violations on a warn-level
    * test), or fail (violations on an error-level test). Composes
    * A11–A14 + the core rollup guard; each arm is its own bounded
    * aggregate, so the report costs what the checks cost.
    */
  def checkSummary(spark: SparkSession, dir: String): DataFrame = {
    def arm(name: String, severity: String, violations: DataFrame): DataFrame =
      violations.agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("test_name"), lit(severity).as("severity"),
          col("n_violations"), (col("n_violations") === 0).as("passed"),
          when(col("n_violations") === 0, "pass")
            .otherwise(if (severity == "warn") "warn" else "fail").as("status"))
    arm("unique_events_key", "warn", checkUnique(spark, dir))
      .unionByName(arm("not_null_events", "warn",
        checkNotNull(spark, dir).filter(
          col("null_user_id") + col("null_event_type") + col("null_ts") > 0)))
      .unionByName(arm("relationships_user_customer", "warn",
        checkRelationships(spark, dir)))
      .unionByName(arm("accepted_values_orderstatus", "warn",
        checkAcceptedValues(spark, dir)))
      .unionByName(arm("not_null_revenue_monthly_total", "error",
        Facts.monthlyRollup(spark, dir)
          .filter(col("revenue_monthly_total").isNull)))
  }

  /** A24: dbt_utils.expression_is_true analog — an arbitrary row-level
    * invariant asserted over a model, reported dbt-style as one
    * (expression, n_violations, passed) row. The invariant here is the
    * lineitem sanity contract (positive quantity/price, discount a
    * fraction, non-negative tax); the count is a single partial-agg
    * pass, so the check costs one scan at any scale.
    */
  def checkExpression(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir).lineitem
      .agg(sum(when(
        !(col("l_quantity") > 0 && col("l_extendedprice") > 0 &&
          col("l_discount").between(0, 1) && col("l_tax") >= 0), 1L)
        .otherwise(0L)).as("n_violations"))
      .select(
        lit("lineitem_sanity").as("expression"),
        col("n_violations"),
        (col("n_violations") === 0L).as("passed"))

  val checkExpressionSql: String =
    """SELECT 'lineitem_sanity' AS expression,
      |  CAST(SUM(CASE WHEN NOT (l_quantity > 0 AND l_extendedprice > 0
      |                          AND l_discount BETWEEN 0 AND 1 AND l_tax >= 0)
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
      |  SUM(CASE WHEN NOT (l_quantity > 0 AND l_extendedprice > 0
      |                     AND l_discount BETWEEN 0 AND 1 AND l_tax >= 0)
      |      THEN 1 ELSE 0 END) = 0 AS passed
      |FROM lineitem""".stripMargin

  /** A26: dbt_utils.equal_rowcount analog — two models that must stay
    * row-for-row in sync, compared by COUNT: the staged (deduped) model
    * against the distinct dedup keys of its source. Each side is one
    * partial-agg scan folded to a single row; the report is the dbt
    * test's (rows_a, rows_b, passed) shape.
    */
  def checkRowcount(spark: SparkSession, dir: String): DataFrame = {
    val staged = Staging.windowDedup(spark, dir)
      .agg(count(lit(1)).as("model_rows"))
    val source = Tables(spark, dir).events
      .select(col("user_id"), col("event_type")).distinct()
      .agg(count(lit(1)).as("source_keys"))
    staged.crossJoin(source)
      .select(lit("stg_events_vs_source_keys").as("comparison"),
        col("model_rows"), col("source_keys"),
        (col("model_rows") === col("source_keys")).as("passed"))
  }

  val checkRowcountSql: String =
    """SELECT 'stg_events_vs_source_keys' AS comparison,
      |  (SELECT COUNT(*) FROM (
      |     SELECT user_id, event_type FROM events GROUP BY 1, 2)) AS model_rows,
      |  (SELECT COUNT(*) FROM (
      |     SELECT DISTINCT user_id, event_type FROM events)) AS source_keys,
      |  (SELECT COUNT(*) FROM (SELECT user_id, event_type FROM events GROUP BY 1, 2))
      |    = (SELECT COUNT(*) FROM (SELECT DISTINCT user_id, event_type FROM events)) AS passed""".stripMargin

  val checkSummarySql: String =
    """SELECT 'unique_events_key' AS test_name, 'warn' AS severity,
      |  CAST(COUNT(*) AS BIGINT) AS n_violations, COUNT(*) = 0 AS passed,
      |  CASE WHEN COUNT(*) = 0 THEN 'pass' ELSE 'warn' END AS status
      |FROM (SELECT user_id, event_type FROM events
      |      GROUP BY 1, 2 HAVING COUNT(*) > 1)
      |UNION ALL
      |SELECT 'not_null_events', 'warn',
      |  CAST(COUNT(*) AS BIGINT), COUNT(*) = 0,
      |  CASE WHEN COUNT(*) = 0 THEN 'pass' ELSE 'warn' END
      |FROM (SELECT 1 FROM events
      |      HAVING SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
      |        + SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
      |        + SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) > 0)
      |UNION ALL
      |SELECT 'relationships_user_customer', 'warn',
      |  CAST(COUNT(*) AS BIGINT), COUNT(*) = 0,
      |  CASE WHEN COUNT(*) = 0 THEN 'pass' ELSE 'warn' END
      |FROM (SELECT user_id FROM events
      |      WHERE user_id NOT IN (SELECT c_custkey FROM customer)
      |      GROUP BY 1)
      |UNION ALL
      |SELECT 'accepted_values_orderstatus', 'warn',
      |  CAST(COUNT(*) AS BIGINT), COUNT(*) = 0,
      |  CASE WHEN COUNT(*) = 0 THEN 'pass' ELSE 'warn' END
      |FROM (SELECT o_orderstatus FROM orders
      |      WHERE o_orderstatus NOT IN ('O', 'F') GROUP BY 1)
      |UNION ALL
      |SELECT 'not_null_revenue_monthly_total', 'error',
      |  CAST(COUNT(*) AS BIGINT), COUNT(*) = 0,
      |  CASE WHEN COUNT(*) = 0 THEN 'pass' ELSE 'fail' END
      |FROM (""".stripMargin + Facts.rollupTotalNullsSql + ")"
}
