package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fns._
import graft.sources.Tables

/** Table profiling — the PipeRider side of the reference (the workshop
  * pairs dbt models with PipeRider data profiling; see
  * /root/reference README's `piperider run` step). A profile is a
  * per-column summary: row count, null count, distinct count, min /
  * max / mean.
  *
  * Scale shape: ALL columns' metrics come from ONE aggregation pass
  * over the table (multi-distinct lowered by Catalyst to a single
  * Expand), then the one 1-row result is unpivoted to long form —
  * versus a per-column loop, which scans the table once per column.
  * Averages follow the §8 decimal discipline so the profile is
  * bit-identical to the DuckDB oracle.
  *
  * WIDE-TABLE CONTRACT (SURVEY §5): the Expand amplifies rows
  * ×(distinct-profiled-columns + 1) BEFORE the partial aggregate, so
  * map-side CPU is ~W× the scan for W columns — but each expanded row
  * is (grouping-id, one value), and the map-side hash aggregate dedups
  * locally, so the EXCHANGE carries only Σ_c |distinct_c| partials per
  * task, never W× the row count. That holds to hundreds of columns;
  * profiling a very wide table where per-column cardinality is also
  * huge (ids, free text) is where the contract bends — there, either
  * batch the profile W′ columns at a time (CPU ∝ W′ per pass), or
  * swap `countDistinct` for `approx_count_distinct` (HLL partials,
  * no Expand at all), accepting ±2% on n_distinct. E4
  * (`q_distinct_counts`) keeps the exact multi-distinct face
  * oracle-checked; this module keeps the one-pass default because
  * profile columns are curated, not arbitrary.
  */
object Profile {

  /** (column, decimal precision, decimal scale) for the mean. */
  private val Cols = Seq(
    ("l_quantity", 18, 2), ("l_extendedprice", 18, 2), ("l_discount", 8, 4))

  /** One profile row per numeric lineitem column. */
  def profileNumeric(spark: SparkSession, dir: String): DataFrame = {
    // the multi-distinct Expand multiplies rows ×(columns+1); spread the
    // single-row-group local file across cores first, shipping only the
    // profiled columns (on a cluster the scan arrives pre-split and this
    // is the same narrow exchange)
    val li = Tables(spark, dir).lineitem
      .select(Cols.map { case (c, _, _) => col(c) }: _*)
      .repartition(spark.sparkContext.defaultParallelism)
    profileFrame(li)
  }

  /** The single-pass profile over an already-projected frame (reused by
    * [[profileNumeric]] and both sides of [[profileDrift]]).
    */
  private def profileFrame(li: DataFrame): DataFrame = {
    // r11 (guide §2.3, E4's lesson): the one-pass multi-distinct agg
    // lowered to an Expand that multiplied every row ×(|cols|+1) before
    // the partial aggregate; per-column CELLS passes carry the same
    // information with NO Expand — each column's pass is a narrow
    // (value → count) partial aggregate whose exchange is
    // |distinct_c|-bounded, and the three passes are independent
    // subtrees of ONE action, so they overlap instead of serializing.
    // High-cardinality caveat (r11 ADVICE #3): for a near-unique column
    // |distinct_c| ≈ |rows|, so that column's exchange is ~full-table —
    // the same order as the Expand plan's partials for it, paid once
    // per column instead of ×(|cols|+1) on every row; re-validate at a
    // larger SF before relying on this shape for near-unique columns.
    // Metric equivalence is exact: n_rows = Σcnt, n_null = the null
    // cell's cnt, n_distinct = non-null cell count (countDistinct
    // ignores nulls), min/max ignore the null cell, and the mean's
    // numerator Σ(dec(v)·cnt) is the same exact decimal as Σdec(v) —
    // identical doubles after the one cast.
    def colProfile(c: String, p: Int, s: Int): DataFrame =
      li.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
        .agg(
          sum(col("cnt")).as("n_rows"),
          coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L)).as("n_null"),
          count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
          min(col("v")).cast("double").as("min_v"),
          max(col("v")).cast("double").as("max_v"),
          (sum(dec(col("v"), p, s) * col("cnt")).cast("double")
            / sum(col("cnt"))).as("avg_v"))
        .select(lit(c).as("column_name"), col("n_rows"), col("n_null"),
          col("n_distinct"), col("min_v"), col("max_v"), col("avg_v"))
    Cols.map { case (c, p, s) => colProfile(c, p, s) }.reduce(_ unionByName _)
  }

  /** PipeRider's compare: profile two snapshots of the fact table (ship
    * months before/after 1995-06-01 — the base vs target run) and emit
    * per-column drift metrics. Each side is the same ONE-pass profile;
    * the join is 3 rows × 3 rows. This is the data-drift gate a
    * pipeline runs between loads; deltas are plain double arithmetic on
    * the already-deterministic profile values.
    */
  def profileDrift(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1995-06-01").cast("date")
    // r12 (r11 VERDICT #6, guide §2.3 — profileFrame's CELLS lesson
    // applied to the drift face): the r11 one-pass side-tagged profile
    // still paid the multi-distinct Expand (×4 row amplification before
    // the partial aggregate). Per-column side-tagged CELLS passes carry
    // the same information with NO Expand: each column's pass is a
    // narrow (side, value) → count partial aggregate whose exchange is
    // 2×|distinct_c|-bounded after map-side combining, and the three
    // passes are independent subtrees of ONE action so they overlap.
    // Folding the base/target split into conditional aggregates over
    // the cells also removes the r11 3×3 self-join and the eager
    // checkpoint. Metric equivalence is exact: per side
    // n_rows = Σcnt, n_distinct = count of non-null cells
    // (countDistinct ignores nulls), and the mean's numerator
    // Σ(dec(v)·cnt) is the same exact decimal as Σdec(v) — identical
    // doubles after the one cast. The side tag mirrors the r11 filters
    // exactly (two `when` arms; null ship dates drop out).
    // High-cardinality caveat (r11 ADVICE #3): for a near-unique column
    // the cells exchange is ~|side rows|-sized — the same order as the
    // Expand plan's partials for that column, paid once per column
    // instead of once for all, so the trade is 3 narrow scans + no ×4
    // map CPU vs 1 scan + Expand; measured faster at sf0.1 (see
    // OPTIMIZATION_r12.md) and strictly less map-side work at scale.
    def colDrift(c: String, p: Int, s: Int): DataFrame = {
      val base = col("side") === "base"
      val tgt = col("side") === "target"
      Tables(spark, dir).lineitem
        .select(when(col("l_shipdate") < cut, "base")
            .when(col("l_shipdate") >= cut, "target").as("side"),
          col(c).as("v"))
        .filter(col("side").isNotNull)
        .repartition(spark.sparkContext.defaultParallelism)
        .groupBy(col("side"), col("v")).agg(count(lit(1)).as("cnt"))
        .agg(
          sum(when(base, col("cnt"))).as("base_rows"),
          sum(when(tgt, col("cnt"))).as("target_rows"),
          count(when(base && col("v").isNotNull, lit(1))).as("base_distinct"),
          count(when(tgt && col("v").isNotNull, lit(1))).as("target_distinct"),
          (sum(when(base, dec(col("v"), p, s) * col("cnt"))).cast("double")
            / sum(when(base, col("cnt")))).as("base_avg"),
          (sum(when(tgt, dec(col("v"), p, s) * col("cnt"))).cast("double")
            / sum(when(tgt, col("cnt")))).as("target_avg"))
        .select(lit(c).as("column_name"),
          col("base_rows"), col("target_rows"),
          col("base_distinct"), col("target_distinct"),
          col("base_avg"), col("target_avg"),
          (col("target_avg") - col("base_avg")).as("avg_shift"),
          (col("target_distinct").cast("double") / col("base_distinct"))
            .as("distinct_ratio"))
    }
    Cols.map { case (c, p, s) => colDrift(c, p, s) }.reduce(_ unionByName _)
  }

  val profileDriftSql: String = {
    def side(tag: String, cond: String): String =
      s"""$tag AS (
         |  SELECT COUNT(*) AS n_rows,
         |    COUNT(DISTINCT l_quantity) AS q_ndist,
         |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS q_avg,
         |    CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS q_nnull,
         |    COUNT(DISTINCT l_extendedprice) AS e_ndist,
         |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS e_avg,
         |    CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS e_nnull,
         |    COUNT(DISTINCT l_discount) AS d_ndist,
         |    CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) / COUNT(*) AS d_avg,
         |    CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS d_nnull
         |  FROM lineitem WHERE $cond)""".stripMargin
    val unions = Seq(("l_quantity", "q"), ("l_extendedprice", "e"), ("l_discount", "d"))
      .map { case (c, s) =>
        s"""SELECT '$c' AS column_name,
           |  b.n_rows AS base_rows, t.n_rows AS target_rows,
           |  b.${s}_ndist AS base_distinct, t.${s}_ndist AS target_distinct,
           |  b.${s}_avg AS base_avg, t.${s}_avg AS target_avg,
           |  t.${s}_avg - b.${s}_avg AS avg_shift,
           |  CAST(t.${s}_ndist AS DOUBLE) / b.${s}_ndist AS distinct_ratio
           |FROM b, t""".stripMargin
      }.mkString("\nUNION ALL\n")
    s"""WITH ${side("b", "l_shipdate < DATE '1995-06-01'")},
       |${side("t", "l_shipdate >= DATE '1995-06-01'")}
       |$unions""".stripMargin
  }

  /** Equi-width histogram (PipeRider's distribution panel): 10 buckets
    * between the global min/max of l_extendedprice. Bounds stay
    * in-plan — the 1-row bounds aggregate is broadcast back over the
    * scan (no driver collect), so the whole profile is two passes over
    * the table and one tiny exchange regardless of size. Bucket edges
    * are pure double arithmetic, stated identically in the oracle.
    */
  def histogram(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables(spark, dir).lineitem.select(col("l_extendedprice").as("v"))
    val bounds = v.agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    v.crossJoin(broadcast(bounds))
      .select(col("v"),
        least(floor((col("v") - col("mn")) / ((col("mx") - col("mn")) / lit(10.0))),
          lit(9L)).cast("long").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("v")).cast("double").as("min_v"),
        max(col("v")).cast("double").as("max_v"))
  }

  val histogramSql: String =
    """WITH b AS (
      |  SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx FROM lineitem),
      |x AS (
      |  SELECT l_extendedprice AS v,
      |    CAST(least(floor((l_extendedprice - mn) / ((mx - mn) / 10.0)), 9.0) AS BIGINT) AS bucket
      |  FROM lineitem, b)
      |SELECT bucket, COUNT(*) AS n_rows,
      |  CAST(MIN(v) AS DOUBLE) AS min_v, CAST(MAX(v) AS DOUBLE) AS max_v
      |FROM x GROUP BY bucket""".stripMargin

  /** E78: 2-D equi-width histogram — the (quantity × price) density
    * grid heatmap panels read (A17 is its 1-D marginal). Both axes'
    * bounds come from ONE 1-row aggregate broadcast into the binning
    * pass; bin ids are the same floor arithmetic as A17 (identical
    * IEEE ops both engines, max clamped into the last bin), so the
    * whole grid is map-side + one (bx, by) keyed aggregate — ≤100
    * groups at any scale.
    */
  def histogram2d(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables(spark, dir).lineitem
      .select(col("l_quantity").as("x"), col("l_extendedprice").as("y"))
    val bounds = v.agg(min(col("x")).as("xmn"), max(col("x")).as("xmx"),
      min(col("y")).as("ymn"), max(col("y")).as("ymx"))
    def bin(c: Column, mn: Column, mx: Column): Column =
      least(floor((c - mn) / ((mx - mn) / lit(10.0))), lit(9.0)).cast("long")
    v.crossJoin(broadcast(bounds))
      .select(bin(col("x"), col("xmn"), col("xmx")).as("bx"),
        bin(col("y"), col("ymn"), col("ymx")).as("by"),
        col("y"))
      .groupBy(col("bx"), col("by"))
      .agg(count(lit(1)).as("n_rows"),
        sum(graft.functions.Fns.dec(col("y"))).cast("double").as("sum_price"))
  }

  val histogram2dSql: String =
    """WITH b AS (
      |  SELECT MIN(l_quantity) AS xmn, MAX(l_quantity) AS xmx,
      |    MIN(l_extendedprice) AS ymn, MAX(l_extendedprice) AS ymx
      |  FROM lineitem),
      |x AS (
      |  SELECT
      |    CAST(least(floor((l_quantity - xmn) / ((xmx - xmn) / 10.0)), 9.0) AS BIGINT) AS bx,
      |    CAST(least(floor((l_extendedprice - ymn) / ((ymx - ymn) / 10.0)), 9.0) AS BIGINT) AS by,
      |    l_extendedprice AS y
      |  FROM lineitem, b)
      |SELECT bx, by, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      |FROM x GROUP BY 1, 2""".stripMargin

  /** A25: equi-DEPTH histogram (deciles) — A17's equal-width companion
    * and the other distribution panel profilers ship: each bucket holds
    * the same row count, bucket edges trace the quantiles. The total
    * order (value, then unique key) makes the cut deterministic; only
    * (value, key) pairs move, through ONE range exchange. E8b's
    * mergeable digest is the declared sketch path when exact deciles
    * aren't required.
    */
  def histogramDepth(spark: SparkSession, dir: String): DataFrame =
      graft.operators.Mining.withStockFanout(spark) {
    // ×1 fan-out scope (r9 VERDICT #4): globalIndex's range exchange is
    // explicitly sized (rangeParts), so the only AQE-planned exchange is
    // the 9-group decile aggregate — which the global ×8 width taxed
    // 2× in scheduling (judge solo 1.45 s, ×1 A/B 0.98 s). The result
    // is localCheckpoint'ed so that tail executes inside the scope.
    //
    // A GLOBAL ntile window would funnel the table through one reducer —
    // instead the total order comes from the distributed prefix
    // primitive (range partition + two-phase offsets) and ntile's
    // bucket-assignment rule is stated arithmetically over that index:
    // with n rows and q = n div 10, rem = n mod 10, the first rem
    // buckets hold q+1 rows. The oracle uses engine-native ntile over
    // the same total order — identical by the rule.
    val vals = Tables(spark, dir).orders
      .select(col("o_orderkey"), col("o_totalprice").as("v"))
    val idx = Corpus.globalIndex(vals, Seq(col("v"), col("o_orderkey")), "idx")
    val total = vals.agg(count(lit(1)).as("n"))
    val q = call_function("div", col("n"), lit(10L))
    val rem = col("n") % 10
    val decile = when(q === 0, col("idx") + 1)
      .when(col("idx") < (q + 1) * rem, call_function("div", col("idx"), q + 1) + 1)
      .otherwise(rem + call_function("div", col("idx") - (q + 1) * rem, q) + 1)
    idx.crossJoin(broadcast(total))
      .select(col("v"), decile.cast("int").as("decile"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("v")).cast("double").as("min_v"),
        max(col("v")).cast("double").as("max_v"))
      .localCheckpoint()
  }

  val histogramDepthSql: String =
    """WITH x AS (
      |  SELECT o_totalprice AS v,
      |    ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      |  FROM orders)
      |SELECT CAST(decile AS INTEGER) AS decile, COUNT(*) AS n_rows,
      |  CAST(MIN(v) AS DOUBLE) AS min_v, CAST(MAX(v) AS DOUBLE) AS max_v
      |FROM x GROUP BY decile""".stripMargin

  /** A28: Benford first-digit audit — the forensic data-quality screen
    * profilers run on monetary columns: natural amounts follow
    * P(d) = log₁₀(1 + 1/d); fabricated or truncated feeds bend the
    * distribution. One map-only digit extraction + a 9-group partial
    * aggregate.
    *
    * Portability: the leading digit comes from INTEGER-cents string
    * formatting (pure bigint-to-text, engine-identical — never
    * log₁₀/floor on a double, whose libm boundaries can flip a digit);
    * expectations are fixed 6 dp literals of log₁₀(1+1/d).
    */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    val expected = Map(1 -> 0.301030, 2 -> 0.176091, 3 -> 0.124939,
      4 -> 0.096910, 5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992,
      8 -> 0.051153, 9 -> 0.045757)
    val o = Tables(spark, dir).orders
      .filter(col("o_totalprice") > 0)
      .select(substring(round(col("o_totalprice") * 100, 0).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
    val tot = o.agg(count(lit(1)).as("n_total"))
    val expect = expected.foldLeft(lit(0.0)) { case (acc, (d, p)) =>
      when(col("digit") === d, p).otherwise(acc)
    }
    o.groupBy(col("digit")).agg(count(lit(1)).as("n_orders"))
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n_orders"),
        round(col("n_orders").cast("double") / col("n_total"), 6).as("observed"),
        expect.as("expected"),
        round(round(col("n_orders").cast("double") / col("n_total"), 6) - expect, 6)
          .as("delta"))
  }

  val benfordSql: String = {
    val caseExpr = Seq(1 -> "0.301030", 2 -> "0.176091", 3 -> "0.124939",
      4 -> "0.096910", 5 -> "0.079181", 6 -> "0.066947", 7 -> "0.057992",
      8 -> "0.051153", 9 -> "0.045757")
      .map { case (d, p) => s"WHEN $d THEN CAST($p AS DOUBLE)" }.mkString(" ")
    s"""WITH d AS (
       |  SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
       |    AS VARCHAR), 1, 1) AS INTEGER) AS digit
       |  FROM orders WHERE o_totalprice > 0),
       |t AS (SELECT COUNT(*) AS n_total FROM d),
       |g AS (SELECT digit, COUNT(*) AS n_orders FROM d GROUP BY digit)
       |SELECT digit, n_orders,
       |  round(CAST(n_orders AS DOUBLE) / n_total, 6) AS observed,
       |  CASE digit $caseExpr ELSE 0.0 END AS expected,
       |  round(round(CAST(n_orders AS DOUBLE) / n_total, 6)
       |    - CASE digit $caseExpr ELSE 0.0 END, 6) AS delta
       |FROM g CROSS JOIN t""".stripMargin
  }

  /** A29: Kolmogorov–Smirnov drift statistic — A19's drift compare
    * quantified: KS = max |ECDF_base − ECDF_target| of the price
    * distribution across the two snapshot windows, the standard
    * numeric-drift significance gate. Both ECDFs ride ONE distributed
    * prefix-sum pass over the distinct-values frame
    * ([[Corpus.prefixSumN]] carries the two per-side counts through a
    * single range exchange; the oracle states single-reducer
    * `SUM() OVER (ORDER BY v)`); per-value
    * CDF ratios are int64→double casts + one IEEE division each, so
    * the argmax is engine-identical and the statistic rounds once at
    * the end.
    */
  def ksDrift(spark: SparkSession, dir: String): DataFrame =
      graft.operators.Mining.withStockFanout(spark) {
    // r12 (r11 VERDICT #7, the ks bimodality diagnosis): event-log
    // capture of 8 solo reps localized the run-to-run spread to the
    // 256-task stages — the global ×8 pre-coalesce fan-out reaches this
    // face twice, through `rangeParts` (whose numShufflePartitions
    // getter returns initialPartitionNum under AQE) and through the
    // checkpointed cells frame's exchange — 500+ near-empty tasks of
    // pure scheduling per timed pass, which contention stretches 2–4×.
    // Every exchange here is bounded by the price DOMAIN (the cells
    // frame), so the ×1 fan-out scope (histogramDepth precedent) is the
    // right width; the final 1-row result checkpoints eagerly so the
    // whole face executes inside the scope. Partitioning-only: values
    // unchanged.
    val cut = lit("1995-06-01").cast("date")
    val c = Tables(spark, dir).lineitem
      .select(col("l_extendedprice").as("v"),
        when(col("l_shipdate") < cut, 1L).otherwise(0L).as("a"))
      .groupBy(col("v"))
      .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
      // r11 (guide §2.4): `c` feeds both the prefix-sum and the side
      // totals — un-materialized, the second branch re-ran the full
      // lineitem scan + value exchange. The cells frame is bounded by
      // the price DOMAIN (not row count), so one eager checkpoint
      // serves both branches; exact integer counts, values unchanged.
      .localCheckpoint(true)
    val p2 = Corpus.prefixSumN(c, Seq(col("v")),
      Seq("ca" -> "cuma_x", "cb" -> "cumb_x"))
    val t = c.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    p2.crossJoin(broadcast(t))
      .select(col("na"), col("nb"),
        abs((col("cuma_x") + col("ca")).cast("double") / col("na")
          - (col("cumb_x") + col("cb")).cast("double") / col("nb")).as("d"))
      .groupBy(col("na"), col("nb"))
      .agg(round(max(col("d")), 6).as("ks_stat"))
      .select(col("na").as("n_base"), col("nb").as("n_target"), col("ks_stat"))
      .localCheckpoint()
  }

  val ksDriftSql: String =
    """WITH x AS (
      |  SELECT l_extendedprice AS v,
      |    CASE WHEN l_shipdate < DATE '1995-06-01' THEN 1 ELSE 0 END AS a
      |  FROM lineitem),
      |c AS (
      |  SELECT v, CAST(SUM(a) AS BIGINT) AS ca,
      |    CAST(SUM(1 - a) AS BIGINT) AS cb
      |  FROM x GROUP BY v),
      |cum AS (
      |  SELECT v, ca, cb,
      |    CAST(SUM(ca) OVER (ORDER BY v) AS BIGINT) AS cuma,
      |    CAST(SUM(cb) OVER (ORDER BY v) AS BIGINT) AS cumb
      |  FROM c),
      |t AS (
      |  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
      |  FROM c)
      |SELECT na AS n_base, nb AS n_target,
      |  round(MAX(abs(CAST(cuma AS DOUBLE) / na - CAST(cumb AS DOUBLE) / nb)), 6)
      |    AS ks_stat
      |FROM cum CROSS JOIN t
      |GROUP BY na, nb""".stripMargin

  /** A30: chi-square categorical drift — the counterpart gate for
    * discrete columns: Pearson's X² of the target order-priority
    * distribution against base-proportion expectations. All counts are
    * exact integers; each category's term is one fixed IEEE expression
    * 6 dp-fixed, summed as exact decimals (§8) — order-independent at
    * any partitioning.
    */
  def chi2Drift(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1995-06-01").cast("timestamp")
    val c = Tables(spark, dir).orders
      .select(col("o_orderpriority").as("k"),
        when(col("o_orderdate") < cut, 1L).otherwise(0L).as("a"))
      .groupBy(col("k"))
      .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
    val t = c.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    c.crossJoin(broadcast(t))
      .select(
        round(
          (col("cb").cast("double")
            - col("nb").cast("double") * col("ca").cast("double") / col("na"))
            * (col("cb").cast("double")
              - col("nb").cast("double") * col("ca").cast("double") / col("na"))
            / (col("nb").cast("double") * col("ca").cast("double") / col("na")),
          6).cast("decimal(18,6)").as("term"))
      .agg(count(lit(1)).as("n_categories"),
        round(sum(col("term")).cast("double"), 4).as("chi2"))
  }

  val chi2DriftSql: String =
    """WITH x AS (
      |  SELECT o_orderpriority AS k,
      |    CASE WHEN o_orderdate < TIMESTAMP '1995-06-01' THEN 1 ELSE 0 END AS a
      |  FROM orders),
      |c AS (
      |  SELECT k, CAST(SUM(a) AS BIGINT) AS ca, CAST(SUM(1 - a) AS BIGINT) AS cb
      |  FROM x GROUP BY k),
      |t AS (
      |  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
      |  FROM c),
      |terms AS (
      |  SELECT CAST(round(
      |    (CAST(cb AS DOUBLE) - CAST(nb AS DOUBLE) * CAST(ca AS DOUBLE) / na)
      |      * (CAST(cb AS DOUBLE) - CAST(nb AS DOUBLE) * CAST(ca AS DOUBLE) / na)
      |      / (CAST(nb AS DOUBLE) * CAST(ca AS DOUBLE) / na),
      |    6) AS DECIMAL(18,6)) AS term
      |  FROM c CROSS JOIN t)
      |SELECT COUNT(*) AS n_categories,
      |  round(CAST(SUM(term) AS DOUBLE), 4) AS chi2
      |FROM terms""".stripMargin

  /** A31: Population Stability Index — the model-monitoring drift
    * score (PSI = Σ (p_a − p_b)·ln(p_a/p_b)) of the price distribution
    * across the two snapshot windows, on 10 equal-width bins fixed
    * from the BASE window's range (the standard protocol: bins are
    * frozen on the expected distribution, target values outside clamp
    * into the edge bins).
    *
    * Engine-exactness: bin assignment is pure int64 arithmetic on
    * integer cents — `(vc−min)·10 div (max−min)` with INTEGER
    * division, so no float boundary can flip a row's bin between
    * engines; a 10-row bin spine left-joins the counts so empty bins
    * still contribute their Laplace-smoothed term
    * (p = (c+1)/(n+10) — the deterministic zero-proportion guard);
    * each bin's term is one fixed IEEE expression rounded at 6 dp and
    * the 10 terms sum as exact decimals.
    *
    * Scale shape: one partial-agg pass per side over the fact (the
    * window split is a projection), a 1-row broadcast of base stats,
    * and a 10-row frame thereafter.
    */
  def psiDrift(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit("1995-06-01").cast("date")
    val rows = Tables(spark, dir).lineitem
      .select(
        round(col("l_extendedprice") * 100, 0).cast("long").as("vc"),
        when(col("l_shipdate") < cut, 1L).otherwise(0L).as("a"))
    // r11 (guide §2.3): base stats and the target total used to be two
    // separate agg passes (two full lineitem scans + two 1-row
    // broadcasts); conditional aggregates fold them into ONE pass —
    // min/max over `when(a=1)` equal the filtered min/max, na = Σa
    // equals the filtered count, and the merged 1-row frame broadcasts
    // once. 4 scans → 2 in the plan; values bit-identical.
    val stats = rows.agg(
      min(when(col("a") === 1L, col("vc"))).as("lo"),
      max(when(col("a") === 1L, col("vc"))).as("hi"),
      sum(col("a")).as("na"),
      sum(lit(1L) - col("a")).as("nbt"))
    val binned = rows.crossJoin(broadcast(stats))
      .select(
        least(greatest(
          call_function("div", (col("vc") - col("lo")) * 10, col("hi") - col("lo")),
          lit(0L)), lit(9L))
          .as("bin"),
        col("a"))
    val counts = binned.groupBy(col("bin"))
      .agg(sum(col("a")).as("ca"), sum(lit(1L) - col("a")).as("cb"))
    val spine = spark.range(10).select(col("id").as("bin"))
    val filled = spine.join(counts, Seq("bin"), "left")
      .select(col("bin"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .crossJoin(broadcast(stats.select(col("na"), col("nbt"))))
    val pa = (col("ca").cast("double") + lit(1.0)) / (col("na").cast("double") + lit(10.0))
    val pb = (col("cb").cast("double") + lit(1.0)) / (col("nbt").cast("double") + lit(10.0))
    filled
      .select(round((pa - pb) * log(pa / pb), 6).cast("decimal(18,6)").as("term"))
      .agg(count(lit(1)).as("n_bins"),
        round(sum(col("term")).cast("double"), 4).as("psi"))
  }

  val psiDriftSql: String =
    """WITH x AS (
      |  SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS vc,
      |    CASE WHEN l_shipdate < DATE '1995-06-01' THEN 1 ELSE 0 END AS a
      |  FROM lineitem),
      |stats AS (
      |  SELECT MIN(vc) AS lo, MAX(vc) AS hi, CAST(COUNT(*) AS BIGINT) AS na
      |  FROM x WHERE a = 1),
      |nb AS (SELECT CAST(SUM(1 - a) AS BIGINT) AS nbt FROM x),
      |binned AS (
      |  SELECT least(greatest(((vc - lo) * 10) // (hi - lo), 0), 9) AS bin, a
      |  FROM x CROSS JOIN stats),
      |counts AS (
      |  SELECT bin, CAST(SUM(a) AS BIGINT) AS ca,
      |    CAST(SUM(1 - a) AS BIGINT) AS cb
      |  FROM binned GROUP BY bin),
      |spine AS (SELECT CAST(i AS BIGINT) AS bin FROM unnest(range(0, 10)) AS t(i)),
      |filled AS (
      |  SELECT spine.bin, COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
      |  FROM spine LEFT JOIN counts ON spine.bin = counts.bin),
      |terms AS (
      |  SELECT CAST(round(
      |    ((CAST(ca AS DOUBLE) + 1.0) / (CAST(na AS DOUBLE) + 10.0)
      |      - (CAST(cb AS DOUBLE) + 1.0) / (CAST(nbt AS DOUBLE) + 10.0))
      |    * ln(((CAST(ca AS DOUBLE) + 1.0) / (CAST(na AS DOUBLE) + 10.0))
      |         / ((CAST(cb AS DOUBLE) + 1.0) / (CAST(nbt AS DOUBLE) + 10.0))),
      |    6) AS DECIMAL(18,6)) AS term
      |  FROM filled CROSS JOIN stats CROSS JOIN nb)
      |SELECT COUNT(*) AS n_bins, round(CAST(SUM(term) AS DOUBLE), 4) AS psi
      |FROM terms""".stripMargin

  /** A32: CUSUM changepoint trace on daily revenue — the
    * level-shift detector monitoring runs after the distribution
    * gates (A29–A31): S_d = Σ_{i≤d}(x_i − μ), whose max |S| marks
    * the most likely changepoint.
    *
    * Engine-exactness: daily revenue is exact integer cents; the
    * running sum AND the day index ride ONE [[Corpus.prefixSumN]]
    * range exchange (two measures, one sort — never `SUM() OVER` on
    * a single reducer); μ never materializes as a float — the trace
    * is the integer numerator n·cum_d − d_idx·total, divided and
    * rounded once per output row. Overflow headroom: n_days ≤ 10⁴
    * and cum ≤ 10¹⁴ cents keeps the product < 2⁶³ at 100 TB's daily
    * grain.
    */
  def cusumDrift(spark: SparkSession, dir: String): DataFrame =
      graft.operators.Mining.withStockFanout(spark) {
    // ×1 fan-out scope (r12, the q_ks_drift diagnosis generalized):
    // everything past the daily rollup is |days|-bounded (~2.5 k rows),
    // and `rangeParts` reads initialPartitionNum under AQE — the global
    // ×8 fan-out ran the prefix-sum range exchange as 256 near-empty
    // tasks. The |days|-bounded result checkpoints eagerly so the face
    // executes inside the scope; partitioning-only, values unchanged.
    val daily = Tables(spark, dir).lineitem
      .groupBy(col("l_shipdate").as("day"))
      .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("rc"))
      .withColumn("one", lit(1L))
    val tot = daily.agg(sum(col("rc")).as("tt"), count(lit(1)).as("nd"))
    Corpus.prefixSumN(daily, Seq(col("day")),
        Seq("rc" -> "crev0", "one" -> "cidx0"))
      .crossJoin(broadcast(tot))
      .select(
        col("day"),
        round(col("rc").cast("double") / 100.0, 2).as("revenue"),
        round((col("nd") * (col("crev0") + col("rc"))
            - (col("cidx0") + lit(1L)) * col("tt")).cast("double")
          / col("nd").cast("double") / 100.0, 2).as("cusum"))
      .localCheckpoint()
  }

  val cusumDriftSql: String =
    """WITH daily AS (
      |  SELECT CAST(l_shipdate AS DATE) AS day,
      |    CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS rc
      |  FROM lineitem GROUP BY 1),
      |tot AS (
      |  SELECT CAST(SUM(rc) AS BIGINT) AS tt, CAST(COUNT(*) AS BIGINT) AS nd
      |  FROM daily),
      |p AS (
      |  SELECT day, rc,
      |    CAST(SUM(rc) OVER (ORDER BY day) AS BIGINT) AS cumrev,
      |    CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS idx
      |  FROM daily)
      |SELECT day, round(CAST(rc AS DOUBLE) / 100.0, 2) AS revenue,
      |  round(CAST(nd * cumrev - idx * tt AS DOUBLE)
      |    / CAST(nd AS DOUBLE) / 100.0, 2) AS cusum
      |FROM p CROSS JOIN tot""".stripMargin

  val profileNumericSql: String = {
    def m(c: String, short: String, p: Int, s: Int): String =
      s"""CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ${short}_nnull,
         |    COUNT(DISTINCT $c) AS ${short}_ndist,
         |    CAST(MIN($c) AS DOUBLE) AS ${short}_min,
         |    CAST(MAX($c) AS DOUBLE) AS ${short}_max,
         |    CAST(SUM(CAST($c AS DECIMAL($p,$s))) AS DOUBLE) / COUNT(*) AS ${short}_avg""".stripMargin
    s"""WITH a AS (
       |  SELECT COUNT(*) AS n_rows,
       |    ${m("l_quantity", "q", 18, 2)},
       |    ${m("l_extendedprice", "e", 18, 2)},
       |    ${m("l_discount", "d", 8, 4)}
       |  FROM lineitem)
       |SELECT 'l_quantity' AS column_name, n_rows, q_nnull AS n_null,
       |  q_ndist AS n_distinct, q_min AS min_v, q_max AS max_v, q_avg AS avg_v
       |FROM a
       |UNION ALL
       |SELECT 'l_extendedprice', n_rows, e_nnull, e_ndist, e_min, e_max, e_avg FROM a
       |UNION ALL
       |SELECT 'l_discount', n_rows, d_nnull, d_ndist, d_min, d_max, d_avg FROM a""".stripMargin
  }
}
