package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 operators: sequence/distribution mining (Mining.scala) and
  * the end-to-end streaming faces D10/D11. Semantic invariants beyond
  * the driver's DuckDB hash-compare.
  */
class MiningSpec extends AnyFunSuite {

  private lazy val spark: SparkSession =
    graft.core.Graft.tune(SparkSession.builder().master("local[4]"), 4).getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q_transition_matrix: rows are a proper conditional distribution") {
    val tm = run("q_transition_matrix").cache()
    // P(to|from) sums to 1 per from_type
    val sums = tm.groupBy("from_type").agg(sum("p").as("s")).collect()
    sums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9, r))
    // total transitions = total events - one per user (first has no prior)
    val ev = graft.sources.Tables(spark, dir).events
    val expected = ev.count() - ev.select("user_id").distinct().count()
    val total = tm.agg(sum("n_trans")).collect()(0).getLong(0)
    assert(total == expected)
    tm.unpersist()
  }

  test("q_zipf: fit is finite and slope non-positive on rank-ordered freqs") {
    val r = run("q_zipf").collect()
    assert(r.length == 1)
    val slope = r(0).getAs[Double]("zipf_slope")
    assert(!slope.isNaN && !slope.isInfinite)
    // frequencies are non-increasing in rank by construction, so the
    // ln-ln least-squares slope cannot be positive
    assert(slope <= 0.0)
  }

  test("q_pmi: support threshold and deterministic cut hold") {
    val p = run("q_pmi").cache()
    assert(p.count() <= 20)
    assert(p.filter(col("cb") < 5).count() == 0)
    // PMI is symmetric-bounded: ln(cb·N²/(B·c1·c2)) must be finite
    assert(p.filter(col("pmi").isNull).count() == 0)
    p.unpersist()
  }

  test("q_embed_cov: upper triangle complete, diagonal is a variance") {
    val c = run("q_embed_cov").cache()
    val dim = graft.sources.Tables(spark, dir).embeddings
      .select(size(col("embedding"))).first().getInt(0)
    assert(c.count() == dim.toLong * (dim + 1) / 2)
    assert(c.filter(col("dim_i") > col("dim_j")).count() == 0)
    // Var(x) >= 0 up to the 6-dp output rounding
    assert(c.filter(col("dim_i") === col("dim_j") && col("cov") < -1e-6).count() == 0)
    c.unpersist()
  }

  test("q_stream_sessionize: stateful streaming run equals batch sessionization") {
    val stream = run("q_stream_sessionize")
    val batch = run("q_sessionize")
      .select(col("user_id"), col("session_start_us"), col("n_events"),
        round(col("total_value"), 2).as("total_value"))
    assert(stream.except(batch).count() == 0)
    assert(batch.except(stream).count() == 0)
  }

  test("q_cdc_apply: deletes vanish, inserts appear, unchanged keys keep base balance") {
    import graft.functions.Fns.nsToUs
    val out = run("q_cdc_apply").cache()
    val ev = graft.sources.Tables(spark, dir).events
    val cust = graft.sources.Tables(spark, dir).customer
    // keys whose LATEST change is a delete must be absent
    val latest = ev.select(col("user_id"), nsToUs(col("ts")).as("s"),
        col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy(col("s").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
    val deleted = latest.filter(col("event_type") === "error")
      .select(col("user_id").as("c_custkey"))
    assert(out.join(deleted, "c_custkey").count() == 0)
    // unchanged = base keys with no changelog entry, balance preserved
    val unchanged = out.filter(col("cdc_action") === "unchanged")
    val expectedUnchanged = cust.join(
      ev.select(col("user_id").as("c_custkey")).distinct(),
      Seq("c_custkey"), "left_anti")
    assert(unchanged.count() == expectedUnchanged.count())
    out.unpersist()
  }

  test("q_sql_model: spark.sql over views equals the DataFrame formulation") {
    val sql = run("q_sql_model")
    val t = graft.sources.Tables(spark, dir)
    val df = t.lineitem
      .join(t.supplier, col("l_suppkey") === col("s_suppkey"))
      .join(t.nation, col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      .agg(count(lit(1)).as("n_items"),
        graft.functions.Fns.decSum(col("l_extendedprice")).as("revenue"))
    assert(sql.except(df).count() == 0)
    assert(df.except(sql).count() == 0)
  }

  test("q_stream_join: streaming interval join equals the batch pair set") {
    import graft.functions.Fns.nsToUs
    val stream = run("q_stream_join")
    val ev = graft.sources.Tables(spark, dir).events
      .select(col("user_id"), col("event_id"), col("event_type"),
        nsToUs(col("ts")).as("t"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_event_id"),
        col("t").as("pt"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("t").as("ct"))
    val batch = p.join(c,
        col("user_id") === col("cu") &&
          col("ct") >= col("pt") - 3600L * 1000000L && col("ct") <= col("pt"))
      .groupBy(col("user_id"), col("purchase_event_id"))
      .agg(count(lit(1)).as("n_clicks"))
    assert(stream.except(batch).count() == 0)
    assert(batch.except(stream).count() == 0)
  }
}
