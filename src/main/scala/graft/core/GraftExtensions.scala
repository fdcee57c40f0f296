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
    ext.injectOptimizerRule(_ => RangeJoinAsBucketJoin)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

/** Optimizer rule: turn a pure range join into a bucketed equi-join.
  *
  * A join whose only cross-side predicate is a time-window range
  *   `a_ts >= b_ts - W  AND  a_ts <= b_ts`
  * has no equi key, so Spark plans BroadcastNestedLoopJoin — O(|A|·|B|)
  * and a driver OOM once neither side broadcasts. But a W-wide window
  * spans at most two W-aligned buckets, so the join is equivalent to an
  * equi-join on a bucket key: the a side computes `a_ts div W`, the b
  * side generates both candidate buckets {b_ts div W − 1, b_ts div W},
  * and the original range predicate filters inside the bucket pairs.
  * This is the declarative face of [[graft.operators.Extras.rangeJoin]]:
  * users write the natural inequality join; the rule injects the scale
  * path.
  *
  * Soundness: for any a_ts ∈ [b_ts − W, b_ts], trunc-div monotonicity
  * gives bucket(a_ts) ∈ {bucket(b_ts) − 1, bucket(b_ts)} (also for
  * negative epochs: trunc(y−1) ≥ trunc(y)−1), every a row keeps exactly
  * one bucket so no duplicate matches, and null timestamps fail the
  * bucket equality exactly as they fail the range predicate. Fires only
  * on Inner joins with NO cross-side equi conjunct (with one, Spark
  * already hash-joins and post-filters the range — no BNLJ to fix),
  * which also makes the rule idempotent: the rewritten join has one.
  */
object RangeJoinAsBucketJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.plans.Inner
  import org.apache.spark.sql.catalyst.plans.logical._
  import org.apache.spark.sql.types.LongType

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Normalize comparisons to `LessThanOrEqual(lo, hi)`. */
  private def asLe(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(lo, hi) => Some((lo, hi))
    case GreaterThanOrEqual(hi, lo) => Some((lo, hi))
    case _ => None
  }

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, _) => Some(v.toLong)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val cs = conjuncts(cond)
      val crossEqui = cs.exists {
        case Equality(l, r) =>
          (l.references.subsetOf(left.outputSet) && r.references.subsetOf(right.outputSet)) ||
            (l.references.subsetOf(right.outputSet) && r.references.subsetOf(left.outputSet))
        case _ => false
      }
      // the window pair: a <= b  and  b - w <= a, same a and b, long-typed,
      // each referencing exactly one side
      val window = if (crossEqui) None else {
        val les = cs.flatMap(asLe)
        les.collectFirst(Function.unlift { case (lo, hi) =>
          les.collectFirst(Function.unlift {
            case (Subtract(b2, wExpr, _), a2)
                if a2.semanticEquals(lo) && b2.semanticEquals(hi) &&
                  lo.dataType == LongType && hi.dataType == LongType &&
                  lo.deterministic && hi.deterministic &&
                  longLit(wExpr).exists(_ > 0) &&
                  oneSideEach(lo, hi, left, right) =>
              Some((lo, hi, longLit(wExpr).get))
            case _ => None
          })
        })
      }
      window match {
        case Some((a, b, w)) =>
          val aFromLeft = a.references.subsetOf(left.outputSet)
          val aSide = if (aFromLeft) left else right
          val bSide = if (aFromLeft) right else left
          val wLit = Literal(w, LongType)
          val bucketA = Alias(IntegralDivide(a, wLit), "__rj_bucket_a")()
          val newASide = Project(aSide.output :+ bucketA, aSide)
          val b0 = IntegralDivide(b, wLit)
          val bAttr = AttributeReference("__rj_bucket_b", LongType)()
          val newBSide = Generate(
            Explode(CreateArray(Seq(Subtract(b0, Literal(1L)), b0))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(bAttr), child = bSide)
          val (newLeft, newRight) =
            if (aFromLeft) (newASide, newBSide) else (newBSide, newASide)
          val newCond = And(cond, EqualTo(bucketA.toAttribute, bAttr))
          Project(j.output,
            Join(newLeft, newRight, Inner, Some(newCond), hint))
        case None => j
      }
  }

  private def oneSideEach(
      a: Expression, b: Expression,
      left: LogicalPlan, right: LogicalPlan): Boolean =
    a.references.nonEmpty && b.references.nonEmpty &&
      ((a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
        (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet)))
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
        args(0), intArg(args(1), "ngram"), intArg(args(2), "w"))),
    // the custom aggregates too — SQL users get the same bounded-state
    // top-k / heavy-hitters paths as the Column API
    ("graft_top_k",
      new ExpressionInfo(classOf[graft.functions.TopKAgg].getName, "graft_top_k"),
      (args: Seq[Expression]) => graft.functions.TopKAgg(
        args(0), intArg(args(1), "k")).toAggregateExpression()),
    ("graft_freq_items",
      new ExpressionInfo(classOf[graft.functions.FreqAgg].getName, "graft_freq_items"),
      (args: Seq[Expression]) => graft.functions.FreqAgg(
        args(0), intArg(args(1), "capacity")).toAggregateExpression()),
    ("graft_cov_pairs",
      new ExpressionInfo(classOf[NativeExprs.CovPairsF32].getName, "graft_cov_pairs"),
      (args: Seq[Expression]) => NativeExprs.CovPairsF32(args(0))),
    ("graft_vec_sum128",
      new ExpressionInfo(classOf[graft.functions.VecSumAgg].getName, "graft_vec_sum128"),
      (args: Seq[Expression]) => graft.functions.VecSumAgg(args(0)).toAggregateExpression()),
    ("graft_bitmap_distinct",
      new ExpressionInfo(classOf[graft.functions.BitmapAgg].getName, "graft_bitmap_distinct"),
      (args: Seq[Expression]) => graft.functions.BitmapAgg(
        args(0), intArg(args(1), "domain")).toAggregateExpression()))

  /** Register on an already-created session (temp functions) — for REPLs
    * and sessions not built with `.withExtensions`.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}
