package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: time individual queries at sf0.1 without running the whole
  * bench — `runMain graft.BenchOne q_profile q_ann_ivf …`. Same
  * warm-up + GC + steady-state discipline as [[Bench]].
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val names = args
    val spark = graft.core.Graft.tune(SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      def once(): Unit = fn(spark, "/root/testdata/sf0.1").write.mode("overwrite").format("noop").save()
      once(); System.gc()
      val t0 = System.nanoTime(); once()
      println(f"TIMED $n ${(System.nanoTime()-t0)/1e9}%.3f")
    }
    spark.stop()
  }
}
