package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: synthesize an N×-replicated copy of a testdata scale
  * directory with FK-consistent key offsets, for scale-up validation
  * runs (SURVEY §6). Each copy i shifts every surrogate key by
  * i × (max(key)+1), so copies never collide and every foreign key in
  * copy i points at the matching parent row in copy i — referential
  * integrity holds at N× the rows. Shared small dims (region, nation)
  * are NOT replicated: their keys are the int32 FK targets every copy
  * reuses, mirroring how a real lakehouse scales facts against stable
  * dimensions. Text/embedding payloads are replicated verbatim — the
  * point of the exercise is denser dedup/LSH candidate sets, not new
  * entropy.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <outDir> [factor=8]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outDir = args(1)
    val factor = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val spark = graft.core.Graft.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$srcDir/$t.parquet")

    // max(key)+1 per offsettable key, collected once (scalar per table)
    def span(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    val custSpan = span(read("customer"), "c_custkey")
    val suppSpan = span(read("supplier"), "s_suppkey")
    val partSpan = span(read("part"), "p_partkey")
    val orderSpan = span(read("orders"), "o_orderkey")
    val eventSpan = span(read("events"), "event_id")
    val docSpan = span(read("documents"), "doc_id")
    val vecSpan = span(read("embeddings"), "vec_id")

    /** Union `factor` shifted copies; `shifts` maps column → per-copy
      * stride. Column order and dtypes are preserved exactly (int64
      * keys stay int64; untouched columns pass through). */
    def replicate(df: DataFrame, shifts: Map[String, Long]): DataFrame = {
      val copies = (0 until factor).map { i =>
        df.select(df.columns.map { c =>
          shifts.get(c) match {
            case Some(stride) if i > 0 => (col(c) + lit(stride * i)).as(c)
            case _ => col(c)
          }
        }.toIndexedSeq: _*)
      }
      copies.reduce(_ unionAll _)
    }

    val plans: Seq[(String, DataFrame)] = Seq(
      "region" -> read("region"),
      "nation" -> read("nation"),
      "customer" -> replicate(read("customer"), Map("c_custkey" -> custSpan)),
      "supplier" -> replicate(read("supplier"), Map("s_suppkey" -> suppSpan)),
      "part" -> replicate(read("part"), Map("p_partkey" -> partSpan)),
      "orders" -> replicate(read("orders"),
        Map("o_orderkey" -> orderSpan, "o_custkey" -> custSpan)),
      "lineitem" -> replicate(read("lineitem"),
        Map("l_orderkey" -> orderSpan, "l_partkey" -> partSpan,
          "l_suppkey" -> suppSpan)),
      "events" -> replicate(read("events"),
        // user_id's FK target is customer.c_custkey, so it must shift by
        // the CUSTOMER span — shifting by its own max (old bug) pointed
        // copy i's users at copy-0-range customers and only preserved
        // referential integrity because the test keys happen to be dense
        Map("event_id" -> eventSpan, "user_id" -> custSpan)),
      "documents" -> replicate(read("documents"), Map("doc_id" -> docSpan)),
      "embeddings" -> replicate(read("embeddings"), Map("vec_id" -> vecSpan)))

    new java.io.File(outDir).mkdirs()
    plans.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      System.err.println(s"[scaleup] wrote $name")
    }
    spark.stop()
  }
}
