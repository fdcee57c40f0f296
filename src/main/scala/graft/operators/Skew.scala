package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities (SURVEY §5): salting for hot keys, the
  * manual complement to AQE's runtime skew-join splitting. Salts are
  * DETERMINISTIC (hash-derived, never rand()) so results are stable
  * across retries and speculative tasks — a correctness requirement,
  * not a style choice: a nondeterministic salt recomputed on task retry
  * silently duplicates or drops rows.
  */
object Skew {

  /** Two-phase aggregation for skewed grouping keys: rows first combine
    * under (key, salt) — spreading each hot key over `factor` reducers —
    * then the per-salt partials combine under the key alone. The second
    * exchange carries at most `factor` rows per key.
    *
    * `aggs` maps column name → (phase-1 agg of that column, phase-2
    * re-agg of the partial). E.g. count: (count(c), sum(partial)).
    */
  def saltedAgg(
      df: DataFrame,
      key: Seq[Column],
      saltSource: Column,
      factor: Int,
      aggs: Seq[(String, Column => Column, Column => Column)],
      valueCols: Seq[Column]): DataFrame = {
    val salt = pmod(xxhash64(saltSource), lit(factor)).as("__salt")
    val phase1 = df
      .select((key :+ salt) ++ valueCols: _*)
      .groupBy(key :+ col("__salt"): _*)
      .agg(aggs.head._2(valueCols.head).as(aggs.head._1),
        aggs.tail.zip(valueCols.tail).map { case ((n, p1, _), v) => p1(v).as(n) }: _*)
    phase1
      .groupBy(key: _*)
      .agg(aggs.head._3(col(aggs.head._1)).as(aggs.head._1),
        aggs.tail.map { case (n, _, p2) => p2(col(n)).as(n) }: _*)
  }

  /** Salted equi-join for a skewed big side: the big side gets a
    * deterministic salt in [0, factor); the small side is exploded
    * `factor`× so every (key, salt) bucket finds its match. Total
    * shuffle grows by factor×|small| — worth it when one hot key would
    * otherwise pin a single reducer.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      bigSaltSource: Column,
      factor: Int): DataFrame = {
    val bigS = big.withColumn("__salt", pmod(xxhash64(bigSaltSource), lit(factor)))
    val smallS = small
      .withColumn("__salt", explode(sequence(lit(0L), lit(factor - 1L))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }
}
