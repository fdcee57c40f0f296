package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract pins for the scale-gate oracle registry (r9 VERDICT #1).
  * The SQL equivalence itself is proven engine-side by
  * tools/oracle_equiv.py (bit-for-bit vs the registered oracle at the
  * driver SFs); these pins keep the REGISTRY wired correctly so the
  * overlay in tools/oracle_check.py --scale-oracles can never silently
  * miss or orphan an entry.
  */
class ScaleOraclesSpec extends AnyFunSuite {

  /** The r9 64× gate's enumerated oracle-timeout class — the only
    * faces a scale restatement is FOR. A key outside this set would
    * mean the overlay silently replaces a healthy registered oracle.
    */
  private val r9TimeoutClass = Set(
    "q_ann_ivf", "q_ann_recall", "q_ann_refine", "q_assoc_rules", "q_bfs",
    "q_dedup_clusters", "q_dedup_fuzzy", "q_dedup_minhash",
    "q_dedup_semantic", "q_dedup_simhash", "q_ivf_rebalance", "q_ivf_stats",
    "q_knn_join", "q_lsh_recall", "q_lsh_tuning", "q_ngram_containment",
    "q_ngram_jaccard", "q_pagerank", "q_setsim_prefix", "q_skyline",
    "q_triangles")

  test("every scale oracle shadows a registered oracle and a queries entry") {
    val orphansOracle = ScaleOracles.sql.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(orphansOracle.isEmpty,
      s"scale oracles with no registered oracle to shadow: $orphansOracle")
    val orphansQuery = ScaleOracles.sql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphansQuery.isEmpty,
      s"scale oracles with no Spark face: $orphansQuery")
  }

  /** r12 extension: restatements that exist because DuckDB's
    * wide-DECIMAL→DOUBLE cast is not correctly rounded above 2^53
    * (ScaleOracles.bollinger's doc has the one-line repro) — the
    * registered oracle is FAST but 1-ulp wrong at 128× volumes. Casts
    * route through VARCHAR; everything else is the registered SQL.
    */
  private val r12CastClass = Set("q_bollinger")

  test("scale oracles stay inside the enumerated restatement classes") {
    val outside = ScaleOracles.sql.keySet.diff(r9TimeoutClass ++ r12CastClass)
    assert(outside.isEmpty,
      s"scale oracle for a face whose registered oracle is healthy: $outside")
  }

  /** The four materialization-pin restatements claim to be the
    * registered oracle's SQL VERBATIM plus `AS MATERIALIZED` keywords
    * (ScaleOracles preamble). They are hand-copied, so without this
    * pin textual drift would surface only when tools/oracle_equiv.py
    * is manually run — not in the unit suite (r10 ADVICE). Strip the
    * keyword, normalize whitespace, and require equality.
    */
  test("materialization-pin restatements match the registered oracle modulo MATERIALIZED") {
    val pinClass = Seq("q_pagerank", "q_triangles", "q_bfs", "q_assoc_rules")
    def canon(sql: String): String =
      sql.replace("AS MATERIALIZED", "AS").replaceAll("\\s+", " ")
        .replace("( ", "(").replace(" )", ")").trim
    pinClass.foreach { name =>
      assert(canon(ScaleOracles.sql(name)) == canon(SparkEntry.oracleSql(name)),
        s"$name: pin drifted from the registered oracle (beyond MATERIALIZED)")
    }
  }

  test("scale oracles are non-empty, alias-complete SQL") {
    ScaleOracles.sql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, name)
      assert(sql.contains("SELECT"), name)
      // object-initialization-order regression guard: a forward val
      // reference in the builder would interpolate "null"
      assert(!sql.contains("null,") && !sql.contains("nullSELECT") &&
        !sql.contains(" null "), s"$name: null leaked into generated SQL")
    }
  }
}
