package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.NativeExprs

/** SparkSessionExtensions registration — exposes graft's native
  * expressions to SQL users, so `spark.sql("SELECT minhash(split(text,
  * ' '), 3, 32) ...")` works next to the Column API. Activate with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.core.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((new FunctionIdentifier(name), info, builder))
    }
    ext.injectOptimizerRule(_ => SimplifySelfCosine)
  }
}

/** Optimizer rule: `cosine(x, x)` → `self_cosine(x)` — a strength
  * reduction that halves the array reads of self-similarity guards.
  * Semantics-preserving by construction: [[NativeExprs.SelfCosineF32]]
  * evaluates bit-identically to the two-argument kernel on a duplicated
  * child (NaN for zero-norm/empty vectors, null for null — a literal
  * 1.0 fold would silently change those). Demonstrates the
  * `Rule[LogicalPlan]` + injectOptimizerRule tier of SURVEY §3.
  */
object SimplifySelfCosine
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case NativeExprs.CosineSimF32(a, b) if a.deterministic && a.semanticEquals(b) =>
        NativeExprs.SelfCosineF32(a)
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private[core] val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_cosine",
      new ExpressionInfo(classOf[NativeExprs.CosineSimF32].getName, "graft_cosine"),
      (args: Seq[Expression]) => NativeExprs.CosineSimF32(args(0), args(1))),
    ("graft_minhash",
      new ExpressionInfo(classOf[NativeExprs.MinHashSig].getName, "graft_minhash"),
      (args: Seq[Expression]) => NativeExprs.MinHashSig(
        args(0), intArg(args(1), "ngram"), intArg(args(2), "k"))),
    ("graft_simhash",
      new ExpressionInfo(classOf[NativeExprs.SimHash64].getName, "graft_simhash"),
      (args: Seq[Expression]) => NativeExprs.SimHash64(args(0))),
    ("graft_gram_hashes",
      new ExpressionInfo(classOf[NativeExprs.GramHashes].getName, "graft_gram_hashes"),
      (args: Seq[Expression]) => NativeExprs.GramHashes(
        args(0), intArg(args(1), "ngram"))),
    ("graft_winnow",
      new ExpressionInfo(classOf[NativeExprs.WinnowFps].getName, "graft_winnow"),
      (args: Seq[Expression]) => NativeExprs.WinnowFps(
        args(0), intArg(args(1), "ngram"), intArg(args(2), "w"))))

  /** Register on an already-created session (temp functions) — for REPLs
    * and sessions not built with `.withExtensions`.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
