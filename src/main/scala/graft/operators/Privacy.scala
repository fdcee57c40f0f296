package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Privacy-release operators — the audits and mechanisms a pipeline
  * runs BEFORE publishing per-group statistics or row-level extracts
  * of a 100 TB corpus: a k-anonymity / l-diversity census of the
  * quasi-identifier space (is any released row re-identifiable?) and a
  * differentially-private count release (are the published aggregates
  * themselves safe?). Both are single-aggregation shapes: the raw
  * table folds map-side to the equivalence-class / group frame, and
  * everything after that is arithmetic over a bounded frame — the only
  * shape that survives the row count.
  *
  * Reference behavior matched: the dbt-test ethos of
  * `models/core/schema.yml` (declare the release gate next to the
  * model); these two are the privacy members of that gate family.
  */
object Privacy {

  private val K_THRESHOLD = 5L

  /** P1 `q_k_anonymity`: quasi-identifier census over the customer
    * table. QIs = (nation, account-balance band of width $1000);
    * sensitive attribute = market segment. One row out:
    *
    *   - `k_anonymity`  — min equivalence-class size (the k in
    *     "k-anonymous": every released row hides among ≥ k)
    *   - `l_diversity`  — min distinct sensitive values per class
    *     (k alone is defeated by a homogeneous class)
    *   - `n_unsafe_classes` / `n_unsafe_rows` / `unsafe_row_share` —
    *     the re-identification exposure under k < 5
    *
    * Plan: ONE map-combinable groupBy folds customers to the QI-class
    * frame (bounded by |nations| × |balance bands|, not by row count);
    * the census is a 1-row aggregate over that frame. The distinct
    * sensitive count per class rides the same exchange (two-column
    * Expand — ×2 map-side amplification, the documented A16 contract).
    * Share rounded by the §8(d) floor idiom, never engine `round`.
    */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val classes = Tables(spark, dir).customer
      .groupBy(
        col("c_nationkey").cast("long").as("nation"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band"))
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col("c_mktsegment")).as("n_sensitive"))
    val unsafe = col("class_size") < K_THRESHOLD
    classes.agg(
        sum(col("class_size")).as("n_rows"),
        count(lit(1)).as("n_classes"),
        min(col("class_size")).as("k_anonymity"),
        min(col("n_sensitive")).as("l_diversity"),
        sum(when(unsafe, 1L).otherwise(0L)).as("n_unsafe_classes"),
        sum(when(unsafe, col("class_size")).otherwise(0L)).as("n_unsafe_rows"))
      .select(col("n_rows"), col("n_classes"), col("k_anonymity"),
        col("l_diversity"), col("n_unsafe_classes"), col("n_unsafe_rows"),
        (floor(col("n_unsafe_rows").cast("double") / col("n_rows").cast("double")
          * 1e6 + 0.5) / 1e6).as("unsafe_row_share"))
  }

  val kAnonymitySql: String =
    """WITH classes AS (
      |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
      |    CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
      |    CAST(COUNT(*) AS BIGINT) AS class_size,
      |    CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_sensitive
      |  FROM customer GROUP BY 1, 2)
      |SELECT CAST(SUM(class_size) AS BIGINT) AS n_rows,
      |  CAST(COUNT(*) AS BIGINT) AS n_classes,
      |  CAST(MIN(class_size) AS BIGINT) AS k_anonymity,
      |  CAST(MIN(n_sensitive) AS BIGINT) AS l_diversity,
      |  CAST(SUM(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_unsafe_classes,
      |  CAST(SUM(CASE WHEN class_size < 5 THEN class_size ELSE 0 END) AS BIGINT)
      |    AS n_unsafe_rows,
      |  FLOOR(CAST(SUM(CASE WHEN class_size < 5 THEN class_size ELSE 0 END) AS DOUBLE)
      |    / CAST(SUM(class_size) AS DOUBLE) * 1e6 + 0.5) / 1e6 AS unsafe_row_share
      |FROM classes""".stripMargin

  /** 2^60 — the hash domain size shared by face and oracle. */
  private val P60 = 1L << 60

  /** Magnitude of a two-sided-geometric(α=1/2) sample, given the
    * distance-to-region-end D (as `x = D − 1 ≥ 1`): the bin index is
    * k = 61 − bitlength(x), stated as a when-chain so it stays a pure
    * map-side codegen expression (no join, no loop).
    */
  private def geoMagnitude(x: Column): Column =
    (2 to 60).foldLeft(lit(60L): Column) { (acc, b) =>
      when(x >= lit(1L << (b - 1)), lit(61L - b)).otherwise(acc)
    }

  /** P2 `q_dp_counts`: differentially-private per-(lang, source) doc
    * counts via the TWO-SIDED GEOMETRIC mechanism with α = 1/2
    * (ε = ln 2): P(noise = 0) = 1/3, P(noise = ±k) = 2^−k / 3. The
    * discrete Laplace is the textbook integer mechanism (Ghosh,
    * Roughgarden, Sundararajan 2009, "Universally utility-maximizing
    * privacy mechanisms") — and with α = 1/2 its inverse CDF is exactly
    * DYADIC, so the whole sampler is integer arithmetic: u = 60-bit
    * group hash, H = 3u ∈ [0, 3·2^60), region split
    * [negative | zero | positive] at 2^60 − 1 and 2^61 − 1, magnitude
    * k = 61 − bitlength(2^60 − offset − 1). No ln(), no exp(), no
    * float anywhere — which is what makes a DuckDB oracle possible
    * (§8: libm is not portable; integer arithmetic is).
    *
    * Noise here is SEEDED (hash of the group key), making the face a
    * reproducible demonstration of the mechanism; a production release
    * would draw fresh randomness per publication (and drop `n_true` /
    * `noise` from the output — they are exposed for the oracle gate).
    *
    * Plan: one map-combinable groupBy to the (lang, source) frame;
    * the sampler is a per-group scalar expression. Released counts are
    * clamped at 0 (standard post-processing; DP is closed under it).
    */
  def dpCounts(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables(spark, dir).documents
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_true"))
    val h = conv(substring(md5(concat(col("lang"), lit("|"), col("source"),
      lit("|dp-geo-42"))), 1, 15), 16, 10).cast("long")
    g.select(col("lang"), col("source"), col("n_true"),
        dyadicGeoNoise(h).as("noise"),
        greatest(lit(0L), col("n_true") + dyadicGeoNoise(h)).as("n_noisy"))
  }

  /** The dyadic two-sided-geometric(α=1/2) sampler over a 60-bit
    * uniform `h` — the shared core of the oracle face ([[dpCounts]],
    * md5-seeded so DuckDB can restate it) and the production arm
    * ([[dpCountsFresh]], fresh-entropy-salted). Pure map-side integer
    * expression: H = 3h splits [0, 3·2^60) into
    * [negative | zero | positive] regions, magnitude = 61 − bitlength
    * of the distance to the region end.
    */
  private def dyadicGeoNoise(h: Column): Column = {
    val hh = h * 3L
    val negEnd = lit(P60 - 1L)
    val zeroEnd = lit(2L * P60 - 1L)
    when(hh < negEnd, -geoMagnitude(negEnd - hh)) // x = (P60 − H) − 1
      .when(hh < zeroEnd, lit(0L))
      .otherwise(geoMagnitude(lit(3L * P60 - 2L) - hh)) // (P60 − (H − zeroEnd)) − 1
  }

  /** P2 production arm (r7 VERDICT item #4): the SAME ε = ln 2 dyadic
    * geometric mechanism, seeded from FRESH entropy — `salt` is drawn
    * from `SecureRandom` per publication ([[dpCountsFresh]]), so no
    * adversary can replay the noise from the group key the way the
    * oracle face's md5 seeding allows. Per-group uniformity comes from
    * the low 60 bits of xxhash64(lang, source, salt): the salt is
    * cryptographically fresh per release, the per-group spread within a
    * release is hash-mixed, and the arithmetic stays integer-only (the
    * sampler is bit-for-bit the oracle-checked one — only the entropy
    * source differs). True counts and raw noise are NOT exposed here:
    * a production release publishes `n_noisy` alone.
    *
    * Test-scope contract (PrivacySpec): over many salts the empirical
    * noise law matches the two-sided geometric CDF (KS bound), and two
    * different salts produce different releases while one salt is
    * reproducible.
    */
  def dpCountsSalted(spark: SparkSession, dir: String, salt: Long): DataFrame = {
    val g = Tables(spark, dir).documents
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_true"))
    val h = xxhash64(col("lang"), col("source"), lit(salt))
      .bitwiseAND(lit(P60 - 1L)) // low 60 bits: exact uniform on [0, 2^60)
    g.select(col("lang"), col("source"),
      greatest(lit(0L), col("n_true") + dyadicGeoNoise(h)).as("n_noisy"))
  }

  /** Fresh-entropy publication: one SecureRandom salt per call. */
  def dpCountsFresh(spark: SparkSession, dir: String): DataFrame =
    dpCountsSalted(spark, dir, new java.security.SecureRandom().nextLong())

  /** Diagnostic surface for the sampler itself: `n` independent draws
    * of the two-sided geometric noise under `salt` (ids 0..n−1 hashed
    * with the salt, exactly the production arm's entropy path). This is
    * what PrivacySpec's KS gate runs against — the empirical law of
    * these draws must match the mechanism's stated distribution, which
    * is the ε-DP guarantee's entire load-bearing claim.
    */
  def geoNoiseSample(spark: SparkSession, n: Long, salt: Long): DataFrame = {
    val h = xxhash64(col("id"), lit(salt)).bitwiseAND(lit(P60 - 1L))
    spark.range(n).select(dyadicGeoNoise(h).as("noise"))
  }

  val dpCountsSql: String =
    """WITH RECURSIVE bits(b, p) AS (
      |  SELECT 0, CAST(1 AS BIGINT)
      |  UNION ALL SELECT b + 1, p * 2 FROM bits WHERE b < 59
      |), g AS (
      |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_true,
      |    3 * ('0x' || substr(md5(lang || '|' || source || '|dp-geo-42'),
      |      1, 15))::BIGINT AS hh
      |  FROM documents GROUP BY lang, source
      |), d AS (
      |  SELECT lang, source, n_true,
      |    CASE WHEN hh < 1152921504606846975 THEN -1
      |         WHEN hh < 2305843009213693951 THEN 0 ELSE 1 END AS sgn,
      |    CASE WHEN hh < 1152921504606846975 THEN 1152921504606846975 - hh
      |         WHEN hh < 2305843009213693951 THEN NULL
      |         ELSE 3458764513820540926 - hh END AS x
      |  FROM g
      |), m AS (
      |  SELECT lang, source, n_true,
      |    CASE WHEN sgn = 0 THEN CAST(0 AS BIGINT)
      |         ELSE CAST(sgn * (60 - MAX(b)) AS BIGINT) END AS noise
      |  FROM d LEFT JOIN bits ON p <= x
      |  GROUP BY lang, source, n_true, sgn)
      |SELECT lang, source, n_true, noise,
      |  CAST(GREATEST(0, n_true + noise) AS BIGINT) AS n_noisy
      |FROM m""".stripMargin
}
