package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with graft's tuned defaults.
  *
  * The reference (InfuseAI/taxi_rides_ny_duckdb) runs dbt-generated SQL
  * inside an embedded single-node DuckDB (`profiles.yml`); graft instead
  * targets a distributed Spark cluster, so session-level planning confs
  * (AQE, broadcast threshold, shuffle parallelism) replace DuckDB's
  * embedded-engine knobs.
  */
object Graft {

  /** Build a local session. `cpus` is the local parallelism; on a real
    * cluster the same confs apply, with shuffle partitions sized by AQE.
    */
  def localSession(cpus: Int, appName: String = "graft"): SparkSession =
    tune(SparkSession.builder().master(s"local[$cpus]"), cpus)
      .appName(appName)
      .getOrCreate()

  /** Apply graft's planning confs to any builder (local or cluster). */
  def tune(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder = b
    .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
    // graft sessions run with the engine's own extensions: SQL-exposed
    // native functions + the SimplifySelfCosine / RangeJoinAsBucketJoin
    // optimizer rules (both semantics-preserving, both spec-pinned).
    .config("spark.sql.extensions", "graft.core.GraftExtensions")
    // The events feed carries nanosecond parquet timestamps, which
    // Spark's µs TimestampType cannot hold; read them as raw ns longs
    // (session-wide, declared at construction — NOT flipped inside a
    // table getter, so no read-order-dependent behavior).
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // AQE coalesces DOWN from this, so start fine-grained: at small SF
    // it collapses to a handful of reducers anyway; at 64–128× sf0.1 it
    // keeps sorts/aggs under the per-task memory budget instead of
    // forcing 32 half-GB partition sorts into spill (observed r8,
    // PLANS_SCALE.md). On a 1000-executor cluster the same ratio holds.
    // r9 re-falsified two alternatives at 64× sf0.1 (solo, gc-fenced,
    // same machine): ×1 (initial = shuffle.partitions) costs q14_promo
    // 5× (18.3 s vs 3.4) and q_fact_join 2× (58.5 s vs 29.5) to sort
    // spill, buying only ~0.5 s back on domain-bounded small frames —
    // the ×8 stays; and raising shuffle.sort.bypassMergeThreshold past
    // the 256 pre-coalesce width (so unaggregated exchanges take the
    // bypass writer) regresses q_fact_join 3× (29.5 s vs 9.5) — 256
    // tiny unsorted per-map streams lose to one sorted spill file at
    // scale, so the stock 200 stays. Small-frame queries that would pay
    // the ×8 fan-out on tiny iterative exchanges scope it away via
    // Mining.withShufflePartitions (both confs, r8 VERDICT #1).
    // dev A/B only (driver sets no env): SPARK_GRAFT_FANOUT=1 rebuilds
    // the ×1 arm of the r9 measurements on the current tree.
    .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      (shufflePartitions *
        sys.env.get("SPARK_GRAFT_FANOUT").map(_.toInt).getOrElse(8)).toString)
    // Spark's stock 10 MB, deliberately NOT raised: the planner's size
    // estimate is the COMPRESSED on-disk footprint scaled by column
    // pruning, and the in-memory HashedRelation it actually builds runs
    // 5–10× that. r7 shipped 64 MB here ("generous keeps role-joins
    // shuffle-free"); the r8 scale-up run falsified it — at 128× sf0.1
    // the threshold admitted the 19 M-row orders side of q5_join5 /
    // q_fact_join as broadcasts (33 MB estimate, GB-scale relation),
    // and the pinned relations + GC debt degraded not just those joins
    // but every query sharing the session (PLANS_SCALE.md). Dims that
    // are genuinely small (region/nation, filtered customer arms) still
    // broadcast; SF-scaling tables flip to SMJ exactly when they should.
    .config("spark.sql.autoBroadcastJoinThreshold", (10L << 20).toString)
    .config("spark.ui.enabled", "false")
}
