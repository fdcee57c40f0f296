package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for graft's signature/vector kernels —
  * the (b) tier of SURVEY §3's preference order: scalar functions Spark
  * lacks, implemented as `Expression`s with `doGenCode` so they stay
  * inside whole-stage codegen (each generates a single static call into
  * [[Kernels]] — no lambda dispatch, no fallback to interpreted
  * projection).
  */
object NativeExprs {

  /** cosine(float32[], float32[]) → double. */
  case class CosineSimF32(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      Kernels.cosineF32(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.cosineF32($a, $b)")
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(left = l, right = r)
  }

  /** self_cosine(float32[]) → double; the single-argument strength
    * reduction of `CosineSimF32(x, x)` installed by
    * [[graft.core.SimplifySelfCosine]]. Evaluates bit-identically to
    * the two-argument form on a duplicated child (see
    * [[Kernels.selfCosineF32]]) — NaN for zero-norm/empty input, null
    * for null input.
    */
  case class SelfCosineF32(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any): Any =
      Kernels.selfCosineF32(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.selfCosineF32($a)")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** minhash(string[] tokens, ngram, k) → long[k] signature. */
  case class MinHashSig(child: Expression, ngram: Int, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(toks: Any): Any =
      Kernels.minhash(toks.asInstanceOf[ArrayData], ngram, k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.minhash($a, $ngram, $k)")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** simhash64(string[] tokens) → long. */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullSafeEval(toks: Any): Any =
      Kernels.simhash64(toks.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.simhash64($a)")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** gram_hashes(string[] tokens, n) → long[] distinct n-gram hashes. */
  case class GramHashes(child: Expression, ngram: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(toks: Any): Any =
      Kernels.gramHashes(toks.asInstanceOf[ArrayData], ngram)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.gramHashes($a, $ngram)")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** winnow(string[] tokens, ngram, w) → long[] distinct window-min
    * fingerprints.
    */
  case class WinnowFps(child: Expression, ngram: Int, w: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(toks: Any): Any =
      Kernels.winnow(toks.asInstanceOf[ArrayData], ngram, w)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.winnow($a, $ngram, $w)")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** top_cells(float[] emb; centroids, k) → int[] best cell indices.
    * The centroid matrix rides along as a reference object
    * (`ctx.addReferenceObj`) so codegen emits one static call instead of
    * an exponentially-nested argmax when-chain.
    */
  case class CellProbe(child: Expression, centroids: Array[Array[Double]], k: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(emb: Any): Any =
      Kernels.topCellsByDot(emb.asInstanceOf[ArrayData], centroids, k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
      defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.topCellsByDot($a, $ref, $k)")
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** plane_bucket(float[] emb; planes) → int sign-bit bucket. */
  case class PlaneBucket(child: Expression, planes: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(emb: Any): Any =
      Kernels.hyperplaneBucket(emb.asInstanceOf[ArrayData], planes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("planes", planes, "double[][]")
      defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.hyperplaneBucket($a, $ref)")
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }


  /** cov_pairs(float32[]) → long[d(d+1)/2] upper-triangle products of
    * the 7dp-fixed elements (see [[Kernels.covPairs]]).
    */
  case class CovPairsF32(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(a: Any): Any =
      Kernels.covPairs(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.covPairs($a)")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** pair_array(sorted bigint[]) → array<struct<p1,p2>>: all i<j pairs
    * with p1 != p2 — the basket→pair expansion kernel (see
    * [[Kernels.pairArray]]). Feeds the builtin `explode`, which stays
    * codegen-integrated; this expression is one static call.
    */
  case class PairArrayExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(
      StructType(Seq(
        StructField("p1", LongType, nullable = false),
        StructField("p2", LongType, nullable = false))),
      containsNull = false)
    override def nullSafeEval(a: Any): Any =
      Kernels.pairArray(a.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, a => s"graft.functions.Kernels.pairArray($a)")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  // Column-API faces (GraftBridge wraps Spark 4's Column↔Expression bridge)
  import org.apache.spark.sql.GraftBridge.{column, expression}
  def pair_array(parts: Column): Column = column(PairArrayExpr(expression(parts)))
  def cosine_f32(a: Column, b: Column): Column =
    column(CosineSimF32(expression(a), expression(b)))
  def minhash_sig(tokens: Column, ngram: Int, k: Int): Column =
    column(MinHashSig(expression(tokens), ngram, k))
  def simhash64(tokens: Column): Column = column(SimHash64(expression(tokens)))
  def gram_hashes(tokens: Column, ngram: Int): Column =
    column(GramHashes(expression(tokens), ngram))
  def winnow_fps(tokens: Column, ngram: Int, w: Int): Column =
    column(WinnowFps(expression(tokens), ngram, w))
  def cell_probe(emb: Column, centroids: Seq[Seq[Double]], k: Int): Column =
    column(CellProbe(expression(emb), centroids.map(_.toArray).toArray, k))
  def plane_bucket(emb: Column, planes: Seq[Seq[Double]]): Column =
    column(PlaneBucket(expression(emb), planes.map(_.toArray).toArray))
  def cov_pairs(emb: Column): Column = column(CovPairsF32(expression(emb)))
}
