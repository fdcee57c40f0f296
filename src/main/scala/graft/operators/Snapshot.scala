package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
