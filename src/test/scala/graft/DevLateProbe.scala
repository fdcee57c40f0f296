package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe (not a test): per-batch watermark/row accounting for
  * the D16 staged-wave feed. Run with
  * `sbt "Test/runMain graft.DevLateProbe"`.
  */
object DevLateProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.tune(
      SparkSession.builder().master("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    import org.apache.spark.sql.streaming.Trigger
    val path = s"$dir/events.parquet"
    val raw = spark.read.parquet(path)
    val schema = raw.schema
    val feedDir = java.nio.file.Files.createTempDirectory("probe_feed")
    def stageWave(df: org.apache.spark.sql.DataFrame, n: Int, mtimeMs: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"probe_w$n")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val s = java.nio.file.Files.list(tmp)
      val part = {
        val it = s.iterator()
        var found: java.nio.file.Path = null
        while (it.hasNext && found == null) {
          val f = it.next()
          if (f.getFileName.toString.endsWith(".parquet")) found = f
        }
        found
      }
      s.close()
      val dst = feedDir.resolve(f"part-$n%05d.parquet")
      java.nio.file.Files.copy(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtimeMs)): Unit
    }
    val now = System.currentTimeMillis()
    stageWave(raw.filter(col("event_id") % 7 =!= 0), 0, now - 60000)
    stageWave(raw.filter(col("event_id") % 7 === 0), 1, now - 40000)
    val maxNs = graft.sources.Tables.normalizeEventTs(raw)
      .agg(max(col("ts"))).head.getLong(0)
    val sentinel = spark.range(1).select(schema.fields.map { f =>
      (f.name match {
        case "ts" =>
          graft.sources.Tables.tsLiteralAs(lit(maxNs + 8640000000000000L), f.dataType)
        case "event_id" | "user_id" => lit(-1L).cast(f.dataType)
        case "event_type" => lit("__sentinel").cast(f.dataType)
        case "value" => lit(0.0).cast(f.dataType)
        case _ => lit("").cast(f.dataType)
      }).as(f.name)
    }: _*)
    stageWave(sentinel, 2, now - 20000)
    val stream = graft.sources.Tables.normalizeEventTs(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(feedDir.toString))
      .withColumn("event_ts", timestamp_micros(expr("ts div 1000")))
      .withWatermark("event_ts", "2 hours")
      .filter(col("event_type") =!= "__sentinel")
    val agg = stream
      .groupBy(window(col("event_ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val q = agg.writeStream
      .outputMode("append").format("memory").queryName("probe_sink")
      .trigger(Trigger.AvailableNow()).start()
    require(q.awaitTermination(300000))
    q.recentProgress.foreach { p =>
      println(s"PROBE batch=${p.batchId} rows=${p.numInputRows} " +
        s"wm=${p.eventTime.get("watermark")} max=${p.eventTime.get("max")} " +
        s"dropped=${p.stateOperators.map(_.numRowsDroppedByWatermark).mkString(",")} " +
        s"outRows=${p.sink.numOutputRows}")
    }
    println(s"PROBE total sink rows = ${spark.table("probe_sink").count()}")
    spark.stop()
  }
}
