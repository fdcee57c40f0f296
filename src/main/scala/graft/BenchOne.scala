package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time individual queries at sf0.1 without running the whole
  * bench — `runMain graft.BenchOne q_profile q_ann_ivf …`. Same
  * warm-up + GC + steady-state discipline as [[Bench]].
  * `SPARK_GRAFT_SF_DIR` overrides the data dir (e.g. target/scaleup64
  * for solo adjudication at the scale-up point).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val names = args
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Graft.tune(SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      def once(): Unit = fn(spark, dir).write.mode("overwrite").format("noop").save()
      once(); System.gc()
      val t0 = System.nanoTime(); once()
      println(f"TIMED $n ${(System.nanoTime()-t0)/1e9}%.3f")
    }
    spark.stop()
  }
}
