package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-operator invariants on the sf0.001 tables — complements the
  * driver's DuckDB hash-compare with semantic checks.
  */
class OperatorSpec extends AnyFunSuite {

  private lazy val spark: SparkSession =
    graft.core.Graft.tune(SparkSession.builder().master("local[4]"), 4).getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query key has a runnable plan and every oracle key a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    SparkEntry.queries.foreach { case (name, fn) =>
      assert(fn(spark, dir).columns.nonEmpty, name)
    }
  }

  test("SURVEY §2 inventory and SparkEntry.queries stay in sync") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), java.nio.charset.StandardCharsets.UTF_8)
    val section = survey.substring(
      survey.indexOf("## §2"), survey.indexOf("## §3"))
    val surveyKeys = "`(q[0-9_][0-9a-z_]*)`".r.findAllMatchIn(section)
      .map(_.group(1)).toSet
    val codeKeys = SparkEntry.queries.keySet
    assert(surveyKeys == codeKeys,
      s"survey-only=${surveyKeys -- codeKeys} code-only=${codeKeys -- surveyKeys}")
  }

  test("q_window_dedup: dedup key is unique afterwards") {
    val d = run("q_window_dedup")
    assert(d.count() == d.select("user_id", "event_type").distinct().count())
  }

  test("q_stg_clean: surrogate keys are md5-shaped and unique") {
    val d = run("q_stg_clean").cache()
    assert(d.filter(length(col("event_sk")) =!= 32).count() == 0)
    assert(d.select("event_sk").distinct().count() == d.count())
    d.unpersist()
  }

  test("q_case_map: codes 1-5 described, never null for valid codes") {
    val d = run("q_case_map")
    assert(d.filter(col("priority_code").between(1, 5) &&
      col("priority_description").isNull).count() == 0)
  }

  test("q_seed_dim: zone transform applied") {
    val d = run("q_seed_dim").cache()
    assert(d.count() == 25)
    assert(d.filter(!col("zone_name").startsWith("ZONE_")).count() == 0)
    assert(d.filter(col("region_name") === "MIDDLE EAST").count() == 0)
    d.unpersist()
  }

  test("q_fact_join: filtered dim regions excluded, tripid keys consistent") {
    val d = run("q_fact_join").cache()
    assert(d.filter(col("supp_region") === "AFRICA" ||
      col("cust_region") === "AFRICA").count() == 0)
    // tripid is the surrogate of (orderkey, linenumber) — distinct counts
    // must agree (the synthetic feed, like raw tripdata, has dup keys)
    assert(d.select("tripid").distinct().count() ==
      d.select("l_orderkey", "l_linenumber").distinct().count())
    d.unpersist()
  }

  test("q_monthly_rollup: group keys unique, totals positive") {
    val d = run("q_monthly_rollup").cache()
    assert(d.select("revenue_zone", "revenue_month", "service_type")
      .distinct().count() == d.count())
    assert(d.filter(col("total_monthly_trips") <= 0).count() == 0)
    d.unpersist()
  }

  test("dbt-test analogs: unique violations found, accepted_values catches 'P'") {
    assert(run("q_check_unique").filter(col("n_rows") <= 1).count() == 0)
    val av = run("q_check_accepted_values").collect()
    assert(av.map(_.getString(0)).toSet == Set("P"))
  }

  test("q_dedup_minhash: LSH candidates include every high-jaccard pair") {
    val exact = run("q_ngram_jaccard").filter(col("jaccard") >= 0.8)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = run("q_dedup_minhash").filter(col("is_dup"))
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test data should contain planted near-dups")
    assert(exact.subsetOf(lsh), s"LSH missed ${exact -- lsh}")
  }

  test("q_dedup_simhash: planted near-dup docs have nonzero neighbor counts") {
    val planted = run("q_ngram_jaccard").filter(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(planted.nonEmpty)
    val near = run("q_dedup_simhash")
      .filter(col("doc_id").isin(planted.toSeq: _*))
      .select("n_near").collect().map(_.getLong(0))
    // simhash(hamming<=3) should flag most >=0.9-jaccard docs
    assert(near.count(_ > 0) >= planted.size / 2,
      s"simhash flagged ${near.count(_ > 0)}/${planted.size}")
  }

  test("q_ann_topk: 10 queries × ranks 1..10, self excluded") {
    val d = run("q_ann_topk").cache()
    assert(d.count() == 100)
    assert(d.filter(col("query_id") === col("vec_id")).count() == 0)
    val ranks = d.groupBy("query_id").agg(countDistinct("rank").as("n"))
    assert(ranks.filter(col("n") =!= 10).count() == 0)
    d.unpersist()
  }

  test("q_ann_lsh: results are a subset of candidates scored within own bucket") {
    val d = run("q_ann_lsh")
    assert(d.count() > 0)
    assert(d.filter(col("rank") > 10).count() == 0)
  }

  test("q_lang_id: predictions come from the supported label set") {
    val d = run("q_lang_id")
    assert(d.filter(!col("predicted_lang").isin("en", "de", "es", "und")).count() == 0)
  }

  test("q_quality_score: ratios bounded") {
    val d = run("q_quality_score")
    assert(d.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1 ||
      col("quality_score") < 0 || col("quality_score") > 1).count() == 0)
  }

  test("q_sessionize: events conserved across sessions") {
    val sessions = run("q_sessionize")
    val total = sessions.agg(sum("n_events")).collect()(0).getLong(0)
    val events = graft.sources.Tables(spark, dir).events.count()
    assert(total == events)
  }

  test("q_multimodal_features: stub decode is deterministic and shape-stable") {
    val d = run("q_multimodal_features").cache()
    assert(d.filter(size(col("features")) =!= 8).count() == 0)
    assert(d.filter(col("n_bytes") <= 0).count() == 0)
    d.unpersist()
  }
}
