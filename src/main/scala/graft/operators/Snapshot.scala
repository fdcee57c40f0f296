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
      version: Long): DataFrame = {
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
    val changed = checkCols.map(c => !(col(c) <=> col("__old").getField(c))).reduce(_ || _)

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
}
