package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** SCD2 snapshots — the engine's analog of dbt's `snapshots/` directory
  * (present in the reference skeleton; dbt's `check` strategy). Each
  * application folds the current source state into a history table:
  * changed/new keys open a new validity interval, disappeared or
  * superseded rows get closed.
  *
  * Versions are explicit longs supplied by the caller (batch ids), not
  * wall-clock timestamps — deterministic and replayable, which dbt's
  * `updated_at` strategy is not.
  *
  * At scale: one shuffle on the snapshot key (the full-outer join of
  * open rows vs current); history rows already closed are passed
  * through untouched (union, no shuffle).
  */
object Snapshot {

  val ValidFrom = "valid_from"
  val ValidTo = "valid_to"

  /** Empty history with the right schema for `current`. */
  def init(current: DataFrame): DataFrame =
    current
      .withColumn(ValidFrom, lit(null).cast("long"))
      .withColumn(ValidTo, lit(null).cast("long"))
      .limit(0)

  /** Fold `current` (source state) into `history` at `version`.
    *
    * @param key       natural-key columns
    * @param checkCols columns whose change opens a new interval
    */
  def apply(
      history: DataFrame,
      current: DataFrame,
      key: Seq[String],
      checkCols: Seq[String],
      version: Long): DataFrame =
    fold(history, current, key, version,
      checkCols.map(c => !(col(c) <=> col("__old").getField(c))).reduce(_ || _))

  /** dbt's `timestamp` strategy: a key re-opens its interval when its
    * `updated_at` column ADVANCED past the stored one — no column-set
    * diff at all (the strategy real sources with reliable audit columns
    * prefer: one comparison instead of N, and a touched-but-identical
    * row still versions). Same one-shuffle fold as the `check` strategy
    * ([[apply]]); only the change predicate differs.
    */
  def applyTimestamp(
      history: DataFrame,
      current: DataFrame,
      key: Seq[String],
      updatedAt: String,
      version: Long): DataFrame =
    fold(history, current, key, version,
      col(updatedAt) > col("__old").getField(updatedAt))

  /** Shared SCD2 fold: `changed` decides (over the joined frame, where
    * current columns are top-level and the open interval rides as
    * `__old`) whether a present key opens a fresh interval.
    */
  private def fold(
      history: DataFrame,
      current: DataFrame,
      key: Seq[String],
      version: Long,
      changed: org.apache.spark.sql.Column): DataFrame = {
    val dataCols = current.columns.toSeq
    val closed = history.filter(col(ValidTo).isNotNull)
    val open = history.filter(col(ValidTo).isNull)

    val cur = current.select(dataCols.map(col): _*)
    val openAliased = open.select(
      (key.map(k => col(k).as(s"__k_$k")) :+ struct(dataCols.map(col): _*).as("__old"))
        :+ col(ValidFrom).as("__old_from"): _*)

    val joined = cur
      .join(openAliased,
        key.map(k => col(k) === col(s"__k_$k")).reduce(_ && _), "full_outer")

    val hasCur = key.map(k => col(k).isNotNull).reduce(_ && _)
    val hasOld = col("__old").isNotNull

    // new or changed keys → open a fresh interval at `version`
    val opened = joined.filter(hasCur && (!hasOld || changed))
      .select(dataCols.map(col) :+ lit(version).as(ValidFrom)
        :+ lit(null).cast("long").as(ValidTo): _*)
    // unchanged keys → carry the existing open interval
    val carried = joined.filter(hasCur && hasOld && !changed)
      .select(dataCols.map(c => col("__old").getField(c).as(c))
        :+ col("__old_from").as(ValidFrom) :+ lit(null).cast("long").as(ValidTo): _*)
    // superseded or deleted keys → close the old interval at `version`
    val nowClosed = joined.filter(hasOld && (!hasCur || changed))
      .select(dataCols.map(c => col("__old").getField(c).as(c))
        :+ col("__old_from").as(ValidFrom) :+ lit(version).as(ValidTo): _*)

    closed.select((dataCols :+ ValidFrom :+ ValidTo).map(col): _*)
      .unionByName(nowClosed)
      .unionByName(carried)
      .unionByName(opened)
  }

  /** A15 query face: a deterministic two-version fold. Version 1 sees
    * every order as status 'O'; version 2 sees the real status — so
    * orders whose true status is 'O' carry their v1 interval, and all
    * others close the v1 interval at v2 and open a fresh one. The
    * oracle states the same history as three plain selects (open
    * intervals encode valid_to as 0 so both engines ship non-null
    * BIGINT columns).
    */
  def qScd2(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
    val v1 = o.select(col("o_orderkey"), lit("O").as("status"))
    val v2 = o.select(col("o_orderkey"), col("o_orderstatus").as("status"))
    val h1 = apply(init(v1), v1, Seq("o_orderkey"), Seq("status"), 1L)
    val h2 = apply(h1, v2, Seq("o_orderkey"), Seq("status"), 2L)
    h2.select(col("o_orderkey"), col("status"),
      col(ValidFrom).as("valid_from"),
      coalesce(col(ValidTo), lit(0L)).as("valid_to"))
  }

  val qScd2Sql: String =
    """SELECT o_orderkey, 'O' AS status,
      |  CAST(1 AS BIGINT) AS valid_from, CAST(2 AS BIGINT) AS valid_to
      |FROM orders WHERE o_orderstatus <> 'O'
      |UNION ALL
      |SELECT o_orderkey, o_orderstatus AS status,
      |  CAST(2 AS BIGINT), CAST(0 AS BIGINT)
      |FROM orders WHERE o_orderstatus <> 'O'
      |UNION ALL
      |SELECT o_orderkey, 'O' AS status,
      |  CAST(1 AS BIGINT), CAST(0 AS BIGINT)
      |FROM orders WHERE o_orderstatus = 'O'""".stripMargin

  /** A15b query face: the `timestamp` strategy over a deterministic
    * two-version fold. Version 1 is an initial load whose audit column
    * is capped at 1995-01-01 (`least(o_orderdate, cutoff)`); version 2
    * carries the true order date. Keys whose date advanced past the
    * cutoff close their v1 interval at v2 and open a fresh one; the
    * rest carry v1 open — the exact dbt timestamp-strategy history,
    * stated by the oracle as two plain selects.
    */
  def qScd2Timestamp(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir).orders
    val cutoff = to_date(lit("1995-01-01"))
    val v1 = o.select(col("o_orderkey"),
      least(to_date(col("o_orderdate")), cutoff).as("updated_at"))
    val v2 = o.select(col("o_orderkey"),
      to_date(col("o_orderdate")).as("updated_at"))
    val h1 = applyTimestamp(init(v1), v1, Seq("o_orderkey"), "updated_at", 1L)
    val h2 = applyTimestamp(h1, v2, Seq("o_orderkey"), "updated_at", 2L)
    h2.select(col("o_orderkey"), col("updated_at"),
      col(ValidFrom).as("valid_from"),
      coalesce(col(ValidTo), lit(0L)).as("valid_to"))
  }

  val qScd2TimestampSql: String =
    """SELECT o_orderkey,
      |  LEAST(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS updated_at,
      |  CAST(1 AS BIGINT) AS valid_from,
      |  CAST(CASE WHEN CAST(o_orderdate AS DATE) > DATE '1995-01-01'
      |       THEN 2 ELSE 0 END AS BIGINT) AS valid_to
      |FROM orders
      |UNION ALL
      |SELECT o_orderkey, CAST(o_orderdate AS DATE),
      |  CAST(2 AS BIGINT), CAST(0 AS BIGINT)
      |FROM orders WHERE CAST(o_orderdate AS DATE) > DATE '1995-01-01'""".stripMargin
}
