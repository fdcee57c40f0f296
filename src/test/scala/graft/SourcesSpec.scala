package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Source/sink format coverage beyond parquet: the engine's frames
  * round-trip through JSON, ORC, and CSV unchanged — at scale these are
  * interchange formats for ingest (JSON logs), columnar storage (ORC),
  * and seeds/exports (CSV).
  */
class SourcesSpec extends AnyFunSuite {

  private lazy val spark: SparkSession =
    graft.core.Graft.tune(SparkSession.builder().master("local[4]"), 4).getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  private def roundTrip(fmt: String): Unit = {
    val out = Files.createTempDirectory(s"rt_$fmt").toString + "/data"
    val src = Tables(spark, dir).orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
    src.write.format(fmt)
      .options(if (fmt == "csv") Map("header" -> "true") else Map.empty[String, String])
      .save(out)
    val back = spark.read.format(fmt)
      .options(if (fmt == "csv") Map("header" -> "true", "inferSchema" -> "true")
        else Map.empty[String, String])
      .load(out)
      // self-describing formats may reorder columns, and CSV inference
      // narrows small ints; select + cast explicitly
      .select(col("o_orderkey").cast("long"), col("o_custkey").cast("long"),
        col("o_orderstatus"), col("o_totalprice").cast("double"))
    assert(back.count() == src.count(), fmt)
    val a = src.orderBy("o_orderkey").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), math.round(r.getDouble(3) * 100)))
    val b = back.orderBy("o_orderkey").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), math.round(r.getDouble(3) * 100)))
    assert(a.sameElements(b), fmt)
  }

  test("orders round-trip through JSON")(roundTrip("json"))
  test("orders round-trip through ORC")(roundTrip("orc"))
  test("orders round-trip through CSV")(roundTrip("csv"))
}
