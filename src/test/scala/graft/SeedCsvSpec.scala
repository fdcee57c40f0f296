package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StructType}
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** The CSV-seed loader — the analog of dbt's `taxi_zone_lookup` seed
  * with `+column_types` overrides (reference dbt_project.yml:43-47),
  * exercised on a zone-lookup-shaped CSV.
  */
class SeedCsvSpec extends AnyFunSuite {

  private lazy val spark: SparkSession =
    graft.core.Graft.tune(SparkSession.builder().master("local[4]"), 4).getOrCreate()

  private def writeSeed(): String = {
    val dir = Files.createTempDirectory("seed").toFile
    val f = new java.io.File(dir, "zone_lookup.csv")
    val w = new java.io.PrintWriter(f)
    w.println("locationid,borough,zone,service_zone")
    w.println("1,EWR,Newark Airport,EWR")
    w.println("2,Queens,Jamaica Bay,Boro Zone")
    w.println("3,Bronx,Allerton/Pelham Gardens,Boro Zone")
    w.println("4,Manhattan,Alphabet City,Yellow Zone")
    w.close()
    f.getAbsolutePath
  }

  test("seed loads with column_types override (locationid -> numeric)") {
    val path = writeSeed()
    val seed = Tables.seedCsv(spark, path,
      Map("locationid" -> DecimalType(18, 3)))
    assert(seed.count() == 4)
    assert(seed.schema("locationid").dataType == DecimalType(18, 3))
    assert(seed.schema("borough").dataType.typeName == "string")
  }

  test("schema-first seed load skips inference and the dim transform applies") {
    val path = writeSeed()
    val schema = StructType.fromDDL(
      "locationid INT, borough STRING, zone STRING, service_zone STRING")
    val seed = Tables.seedCsv(spark, path, schema)
    // dim_zones.sql: replace(service_zone,'Boro','Green')
    val dim = seed.select(col("locationid"), col("borough"), col("zone"),
      replace(col("service_zone"), lit("Boro"), lit("Green")).as("service_zone"))
    val greens = dim.filter(col("service_zone") === "Green Zone").count()
    assert(greens == 2)
  }
}
