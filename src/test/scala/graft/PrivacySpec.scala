package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Privacy

/** The production (fresh-entropy) arm of the DP release — r7 VERDICT
  * item #4. The oracle face (`q_dp_counts`, md5-seeded so DuckDB can
  * restate it) stays the hash-checked correctness gate; these tests
  * pin what the oracle CANNOT state: that the salted arm's noise
  * follows the declared two-sided geometric law (the ε = ln 2 DP
  * guarantee), that releases differ across salts, and that the
  * published schema leaks neither true counts nor raw noise.
  */
class PrivacySpec extends AnyFunSuite {

  private lazy val spark: SparkSession =
    graft.core.Graft.tune(SparkSession.builder().master("local[4]"), 4).getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  test("geo sampler: empirical CDF within the KS bound of the two-sided geometric") {
    val n = 200000L
    // deterministic salt for the spec (any salt must pass — the law is
    // salt-independent; a fixed one keeps the suite reproducible)
    val draws = Privacy.geoNoiseSample(spark, n, salt = 0x5eedf00dL)
      .groupBy("noise").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    // theoretical CDF of the α = 1/2 two-sided geometric:
    // P(0) = 1/3, P(±k) = 2^−k / 3
    def cdf(j: Long): Double =
      if (j < 0) math.pow(2.0, -(math.abs(j) - 1).toDouble) / 3.0
      else 1.0 - math.pow(2.0, -j.toDouble) / 3.0

    val support = draws.keySet.toSeq.sorted
    var cum = 0L
    var ks = 0.0
    support.foreach { j =>
      cum += draws(j)
      ks = math.max(ks, math.abs(cum.toDouble / n - cdf(j)))
    }
    // α = 0.05 KS acceptance bound; discrete support makes the test
    // conservative (true rejection rate below α)
    val bound = 1.36 / math.sqrt(n.toDouble)
    assert(ks < bound, s"KS statistic $ks exceeds $bound")
    // sanity on the head of the law, the bins that carry ~90% of mass
    val z = draws.getOrElse(0L, 0L).toDouble / n
    assert(math.abs(z - 1.0 / 3.0) < 0.01, s"P(0) = $z")
    val one = draws.getOrElse(1L, 0L).toDouble / n
    assert(math.abs(one - 1.0 / 6.0) < 0.01, s"P(+1) = $one")
  }

  test("salted release: reproducible per salt, different across salts, schema leak-free") {
    val a1 = Privacy.dpCountsSalted(spark, dir, salt = 17L)
    val a2 = Privacy.dpCountsSalted(spark, dir, salt = 17L)
    assert(a1.except(a2).count() == 0 && a2.except(a1).count() == 0)

    val b = Privacy.dpCountsSalted(spark, dir, salt = 18L)
    // different salt ⇒ at least one group's released count moves
    // (P(all equal) ≈ (1/3 + small)^groups — astronomically unlikely)
    assert(a1.except(b).count() > 0)

    // the production schema publishes ONLY the noisy counts
    assert(a1.columns.toSeq == Seq("lang", "source", "n_noisy"))
    assert(a1.filter(col("n_noisy") < 0).count() == 0)

    // fresh arm runs and carries the same schema
    val f = Privacy.dpCountsFresh(spark, dir)
    assert(f.columns.toSeq == Seq("lang", "source", "n_noisy"))
    assert(f.count() == a1.count())
  }
}
