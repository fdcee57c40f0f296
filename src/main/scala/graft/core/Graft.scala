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
    // dims here are KB–MB; at 100 TB the dims stay small while facts grow,
    // so a generous broadcast threshold keeps all role-joins shuffle-free.
    .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    .config("spark.ui.enabled", "false")
}
