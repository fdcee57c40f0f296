package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway dev probe — NOT part of the build deliverable. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val cpus = 32
    val spark = graft.core.Graft.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sources.Tables

    def t(name: String)(body: => Unit): Unit = {
      System.gc()
      val t0 = System.nanoTime()
      body
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val Cols = Seq(
      ("l_quantity", 18, 2), ("l_extendedprice", 18, 2), ("l_discount", 8, 4))
    def dec(c: org.apache.spark.sql.Column, p: Int, s: Int) =
      c.cast(s"decimal($p,$s)")
    val cut = lit("1995-06-01").cast("date")

    // warm the scan
    noop(Tables(spark, dir).lineitem)

    // arm A: the one-pass side-tagged agg (no checkpoint, no unpivot)
    for (i <- 1 to 3) t(s"onepass-agg $i") {
      val one = Tables(spark, dir).lineitem
        .select((when(col("l_shipdate") < cut, "base")
          .when(col("l_shipdate") >= cut, "target").as("side")
          +: Cols.map { case (c, _, _) => col(c) }): _*)
        .filter(col("side").isNotNull)
        .repartition(spark.sparkContext.defaultParallelism)
        .groupBy(col("side"))
        .agg(count(lit(1)).as("n_rows"),
          Cols.flatMap { case (c, p, s) => Seq(
            countDistinct(col(c)).as(s"${c}_ndist"),
            (sum(dec(col(c), p, s)).cast("double") / count(lit(1)))
              .as(s"${c}_avg"))
          }: _*)
      noop(one)
    }

    // arm B: one side of the old two-pass (filter then global agg)
    for (i <- 1 to 3) t(s"oldside-agg $i") {
      val one = Tables(spark, dir).lineitem
        .select((Cols.map { case (c, _, _) => col(c) } :+ col("l_shipdate")): _*)
        .repartition(spark.sparkContext.defaultParallelism)
        .filter(col("l_shipdate") < cut)
        .drop("l_shipdate")
        .agg(count(lit(1)).as("n_rows"),
          Cols.flatMap { case (c, p, s) => Seq(
            countDistinct(col(c)).as(s"${c}_ndist"),
            (sum(dec(col(c), p, s)).cast("double") / count(lit(1)))
              .as(s"${c}_avg"))
          }: _*)
      noop(one)
    }

    // arm C: one-pass without the repartition spread
    for (i <- 1 to 3) t(s"onepass-nospread $i") {
      val one = Tables(spark, dir).lineitem
        .select((when(col("l_shipdate") < cut, "base")
          .when(col("l_shipdate") >= cut, "target").as("side")
          +: Cols.map { case (c, _, _) => col(c) }): _*)
        .filter(col("side").isNotNull)
        .groupBy(col("side"))
        .agg(count(lit(1)).as("n_rows"),
          Cols.flatMap { case (c, p, s) => Seq(
            countDistinct(col(c)).as(s"${c}_ndist"),
            (sum(dec(col(c), p, s)).cast("double") / count(lit(1)))
              .as(s"${c}_avg"))
          }: _*)
      noop(one)
    }

    // arm D: the FULL new face (checkpoint + unpivot + join)
    for (i <- 1 to 3) t(s"full-new $i") {
      noop(graft.operators.Profile.profileDrift(spark, dir))
    }

    spark.stop()
  }
}
