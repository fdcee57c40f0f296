package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** AQE-off differential — adaptive execution changes join strategies,
  * coalesces partitions, and splits skewed ones at RUNTIME; none of
  * that may change a RESULT. Representative queries from every operator
  * family run with AQE on and off and must match bit-for-bit (same
  * discipline as partition-count invariance: results depend on the
  * declared semantics, never on the physical plan the runtime picked).
  */
class AqeOffSpec extends AnyFunSuite {

  private lazy val spark: SparkSession =
    graft.core.Graft.tune(SparkSession.builder().master("local[4]"), 4).getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  private def collectWith(name: String, aqe: Boolean): Seq[String] = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
    try SparkEntry.queries(name)(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  // one per family: scan-agg, star join, fact build, rollup, multi-
  // distinct, prefix primitives, LSH dedup, packing, kNN, salted join,
  // TF-IDF, window analytics
  private val Representative = Seq(
    "q1_pricing", "q5_join5", "q_fact_join", "q_monthly_rollup",
    "q_distinct_counts", "q_abc_analysis", "q_histogram_depth",
    "q_dedup_minhash", "q_seq_pack", "q_knn_join", "q_skew_join",
    "q_tfidf", "q_window_funcs", "q_asof_native",
    "q_embed_cov", "q_cdc_apply", "q_transition_matrix", "q_pmi",
    "q_heavy_hitters", "q_bitmap_distinct", "q_intransit_sweep",
    "q_ks_drift", "q_bm25", "q_attribution", "q_kaplan_meier", "q_cusum",
    "q_hard_negatives", "q_label_outliers", "q_curriculum",
    "q_audit_diff", "q_table_checksum", "q_bpe_apply")

  Representative.foreach { name =>
    test(s"$name: identical results with adaptive execution disabled") {
      assert(collectWith(name, aqe = true) == collectWith(name, aqe = false), name)
    }
  }
}
