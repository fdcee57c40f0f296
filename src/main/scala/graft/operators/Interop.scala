package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Source/sink interop beyond parquet — corpus pipelines exchange JSON
  * Lines (one document object per line) at their boundaries, so the
  * engine must land and re-consume it losslessly.
  */
object Interop {

  /** E32: JSONL sink + schema-first source round-trip. The documents
    * table is written as JSON Lines and read back with an EXPLICIT
    * schema (no inference pass — inference is a second full scan at
    * 100 TB; schema-first is the scale rule, same as the CSV seed
    * loader). The face aggregates the re-read feed per source with
    * content-sensitive columns (row count, char sum, md5 min/max), and
    * the oracle states the same aggregate over the ORIGINAL table — so
    * any row loss, duplication, or text corruption in the round trip
    * hash-mismatches the gate. Writer and reader are partition-parallel
    * (one JSONL part-file per task, no shuffle either way).
    */
  def jsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir).documents
    val out = java.nio.file.Files.createTempDirectory("graft_jsonl")
      .toString + "/documents"
    docs.write.mode("overwrite").json(out)
    val back = spark.read.schema(docs.schema).json(out)
    back.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(md5(col("text"))).as("min_text_md5"),
        max(md5(col("text"))).as("max_text_md5"))
  }

  val jsonlRoundtripSql: String =
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  MIN(md5(text)) AS min_text_md5,
      |  MAX(md5(text)) AS max_text_md5
      |FROM documents
      |GROUP BY source""".stripMargin
}
