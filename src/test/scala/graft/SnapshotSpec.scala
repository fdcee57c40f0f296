package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Snapshot

/** SCD2 snapshot semantics (dbt snapshots/ analog): validity intervals
  * open/close deterministically as source state evolves.
  */
class SnapshotSpec extends AnyFunSuite {

  private lazy val spark: SparkSession =
    graft.core.Graft.tune(SparkSession.builder().master("local[4]"), 4).getOrCreate()

  test("SCD2 fold: open, change, delete across three versions") {
    import spark.implicits._
    val v1 = Seq((1L, "BUILDING", 10.0), (2L, "AUTO", 20.0)).toDF("id", "seg", "bal")
    val v2 = Seq((1L, "BUILDING", 10.0), (2L, "AUTO", 25.0), (3L, "SHIP", 5.0))
      .toDF("id", "seg", "bal")
    val v3 = Seq((2L, "AUTO", 25.0), (3L, "SHIP", 5.0)).toDF("id", "seg", "bal")

    val h1 = Snapshot(Snapshot.init(v1), v1, Seq("id"), Seq("seg", "bal"), 1L)
    val h2 = Snapshot(h1, v2, Seq("id"), Seq("seg", "bal"), 2L)
    val h3 = Snapshot(h2, v3, Seq("id"), Seq("seg", "bal"), 3L).cache()

    // at most one open interval per key; keys 2 and 3 open, key 1 closed
    val open = h3.filter(col(Snapshot.ValidTo).isNull)
    assert(open.groupBy("id").count().filter(col("count") > 1).count() == 0)
    assert(open.select("id").collect().map(_.getLong(0)).toSet == Set(2L, 3L))

    // key 2 history: bal 20 valid [1,2), bal 25 open since 2
    val k2 = h3.filter(col("id") === 2).orderBy(Snapshot.ValidFrom).collect()
    assert(k2.length == 2)
    assert(k2(0).getDouble(2) == 20.0 && k2(0).getLong(4) == 2L)
    assert(k2(1).getDouble(2) == 25.0 && k2(1).isNullAt(4))

    // key 1 closed at version 3 (deleted from source)
    val k1 = h3.filter(col("id") === 1).collect()
    assert(k1.length == 1 && k1(0).getLong(4) == 3L)

    // idempotence: re-applying the same state changes nothing
    val h4 = Snapshot(h3, v3, Seq("id"), Seq("seg", "bal"), 4L)
    assert(h4.collect().map(_.toString).sorted
      .sameElements(h3.collect().map(_.toString).sorted))
    h3.unpersist()
  }
}
