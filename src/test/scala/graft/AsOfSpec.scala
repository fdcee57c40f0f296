package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native sort-merge as-of join ([[graft.plans.AsOfJoinExec]]):
  * semantics against the composed window face, merge-edge cases on
  * hand-built frames, and the plan contract (the exec actually plans,
  * with SMJ-style exchanges+sorts).
  */
class AsOfSpec extends AnyFunSuite {

  private lazy val spark: SparkSession =
    graft.core.Graft.tune(SparkSession.builder().master("local[4]"), 4).getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  test("q_asof_native equals the composed union+window face") {
    val native = SparkEntry.queries("q_asof_native")(spark, dir)
    val composed = SparkEntry.queries("q_asof_join")(spark, dir)
    assert(native.exceptAll(composed).count() == 0 &&
      composed.exceptAll(native).count() == 0)
    assert(native.count() > 0)
  }

  test("as-of merge edge cases: equal times, no match, interleaved keys") {
    import spark.implicits._
    val l = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"),
      (3L, 7L, "p4"))
      .toDF("k", "t", "tag")
    val r = Seq((1L, 10L, "c_eq"), (1L, 15L, "c_mid"), (2L, 6L, "c_late"),
      (9L, 1L, "c_other"))
      .toDF("rk", "rt", "rtag")
    val out = graft.plans.AsOf.joinAsOf(
      l, r, Seq(l("k")), Seq(r("rk")), l("t"), r("rt"))
      .select(col("tag"), col("rtag"))
      .collect().map(row => row.getString(0) -> row.getString(1)).toMap
    assert(out == Map(
      "p1" -> "c_eq", // equal time matches (>= semantics)
      "p2" -> "c_mid", // most recent of several
      "p3" -> null, // right exists but only later
      "p4" -> null)) // key absent on the right
  }

  test("NULL join keys never match (single-long-key path)") {
    import spark.implicits._
    // null-key rows on both sides; DuckDB ASOF `ON l.k = r.k` semantics:
    // a null key equals nothing, including another null
    val l = Seq((Some(1L), 10L, "p1"), (None, 10L, "pnull"), (Some(2L), 9L, "p2"))
      .toDF("k", "t", "tag")
    val r = Seq((Some(1L), 5L, "c1"), (None, 1L, "cnull"), (Some(2L), 20L, "c2"))
      .toDF("rk", "rt", "rtag")
    val out = graft.plans.AsOf.joinAsOf(
      l, r, Seq(l("k")), Seq(r("rk")), l("t"), r("rt"))
      .select(col("tag"), col("rtag"))
      .collect().map(row => row.getString(0) -> row.getString(1)).toMap
    assert(out == Map(
      "p1" -> "c1", // normal match unaffected
      "pnull" -> null, // null left key matches nothing — not even cnull
      "p2" -> null)) // right key present but only later
  }

  test("NULL join keys never match (generic multi-key path)") {
    import spark.implicits._
    val l = Seq((Some(1L), "a", 10L, "p1"), (None, "a", 10L, "pn1"),
      (Some(1L), null.asInstanceOf[String], 10L, "pn2"))
      .toDF("k1", "k2", "t", "tag")
    val r = Seq((Some(1L), "a", 5L, "c1"), (None, "a", 1L, "cn1"),
      (Some(1L), null.asInstanceOf[String], 1L, "cn2"))
      .toDF("rk1", "rk2", "rt", "rtag")
    val out = graft.plans.AsOf.joinAsOf(
      l, r, Seq(l("k1"), l("k2")), Seq(r("rk1"), r("rk2")), l("t"), r("rt"))
      .select(col("tag"), col("rtag"))
      .collect().map(row => row.getString(0) -> row.getString(1)).toMap
    assert(out == Map("p1" -> "c1", "pn1" -> null, "pn2" -> null))
  }

  test("as-of exec plans natively with co-partitioned sorted children") {
    val df = SparkEntry.queries("q_asof_native")(spark, dir)
    val s = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(s.contains("AsOfJoin"))
    // SMJ shape: one exchange + one sort per side, nothing else wide
    assert("\\(\\d+\\) Exchange".r.findAllIn(s).size == 2, s)
    assert("\\(\\d+\\) Sort".r.findAllIn(s).size == 2, s)
  }

  test("as-of plans identically with AQE disabled") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val native = SparkEntry.queries("q_asof_native")(spark, dir)
      val composed = SparkEntry.queries("q_asof_join")(spark, dir)
      assert(native.exceptAll(composed).count() == 0 &&
        composed.exceptAll(native).count() == 0)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("as-of survives skewed single-key input (all rows one partition key)") {
    import spark.implicits._
    val l = (0L until 1000L).map(i => (7L, i * 2, i)).toDF("k", "t", "id")
    val r = (0L until 1000L).map(i => (7L, i * 2 + 1, i)).toDF("rk", "rt", "rid")
    val out = graft.plans.AsOf.joinAsOf(
      l, r, Seq(l("k")), Seq(r("rk")), l("t"), r("rt"))
    // left row t=2i matches right rt=2i-1 → rid=i-1; t=0 matches none
    assert(out.filter(col("id") === 0 && col("rid").isNotNull).count() == 0)
    assert(out.filter(col("id") > 0 && col("rid") =!= col("id") - 1).count() == 0)
    assert(out.count() == 1000)
  }
}
