package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Table loaders.
  *
  * Mirrors the reference's source layer: dbt `source()` tables read from
  * the warehouse (models/staging/schema.yml:1-24) and the
  * `taxi_zone_lookup` CSV seed with per-column type overrides
  * (dbt_project.yml:43-47). Here sources are parquet directories and
  * seeds are CSVs; both come back as DataFrames whose scans Catalyst can
  * prune and push filters into.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")

  /** The events feed carries nanosecond parquet timestamps, which Spark's
    * TimestampType (µs) cannot hold; `ts` arrives as a raw nanosecond
    * long (lossless — `spark.sql.legacy.parquet.nanosAsLong`, set at
    * session construction in [[graft.core.Graft.tune]]) and operators
    * derive µs/timestamps via [[graft.functions.Fns.nsToUs]] — flooring
    * exactly like engines that narrow ns→µs on read.
    */
  def events: DataFrame = {
    // Defensive: sessions not built via Graft.tune would otherwise fail
    // with PARQUET_TYPE_ILLEGAL. conf.set is idempotent here, but the
    // contract is that Graft.tune already declared it.
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      throw new IllegalStateException(
        "events requires spark.sql.legacy.parquet.nanosAsLong=true — " +
          "build the session with graft.core.Graft.tune")
    t("events")
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {

  /** CSV seed loader — the analog of dbt's seed with
    * `+column_types: {locationid: numeric}` (dbt_project.yml:43-47):
    * header CSV, schema inferred, then explicit per-column type
    * overrides applied as casts so downstream joins see stable types.
    */
  def seedCsv(
      spark: SparkSession,
      path: String,
      columnTypes: Map[String, DataType] = Map.empty): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)
    columnTypes.foldLeft(raw) { case (df, (col, dt)) =>
      df.withColumn(col, df(col).cast(dt))
    }
  }

  /** Schema-first CSV seed (no inference pass — preferred at scale:
    * inference reads the file twice).
    */
  def seedCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)
}
