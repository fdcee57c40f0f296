package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Fns
import graft.functions.NativeExprs

/** The HOF reference implementations in Fns stay equivalent to their
  * native-kernel counterparts, and the scalar helpers behave.
  */
class FnsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession =
    graft.core.Graft.tune(SparkSession.builder().master("local[4]"), 4).getOrCreate()
  private val dir = "/root/testdata/sf0.001"

  test("HOF cosineSim is bit-identical to the native kernel") {
    val e = graft.sources.Tables(spark, dir).embeddings.limit(50)
    val a = e.select(col("vec_id"), col("embedding").as("x"))
    val b = graft.sources.Tables(spark, dir).embeddings.limit(50)
      .select(col("vec_id").as("vid2"), col("embedding").as("y"))
    val pairs = a.join(b, col("vec_id") =!= col("vid2")).limit(500)
    val diff = pairs.select(
      (Fns.cosineSim(col("x"), col("y")) -
        NativeExprs.cosine_f32(col("x"), col("y"))).as("d"))
      .agg(max(abs(col("d")))).collect()(0).getDouble(0)
    assert(diff == 0.0, s"max |HOF - kernel| = $diff")
  }

  test("shingles HOF produces the same distinct-gram count as the kernel") {
    val docs = graft.sources.Tables(spark, dir).documents.limit(100)
    val bad = docs.select(
      size(Fns.shingles(split(col("text"), " "), 3)).as("hof"),
      size(NativeExprs.gram_hashes(split(col("text"), " "), 3)).as("k"))
      .filter(col("hof") =!= col("k"))
    assert(bad.count() == 0)
  }

  test("substrCount, surrogateKey, caseMap scalar behavior") {
    import spark.implicits._
    val df = Seq(("a b a b a", 7, 2)).toDF("s", "code7", "code2")
    val r = df.select(
      Fns.substrCount(col("s"), "a b").as("n"),
      Fns.surrogateKey(col("code7"), col("code2")).as("sk"),
      Fns.caseMap(col("code2"), Seq(1 -> "one", 2 -> "two")).as("cm"),
      Fns.caseMap(col("code7"), Seq(1 -> "one", 2 -> "two")).as("cmNull"))
      .collect()(0)
    assert(r.getInt(0) == 2)
    assert(r.getString(1).length == 32)
    assert(r.getString(2) == "two")
    assert(r.isNullAt(3))
  }
}
