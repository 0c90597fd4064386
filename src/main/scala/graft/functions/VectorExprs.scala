package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import graft.functions.impl.Kernels

/** Native vector expressions for the ANN hot path; single kernel loop
  * per row, real doGenCode (one static call inside the codegen span).
  *
  * CosineSim folds left-to-right in IEEE double — the exact order the
  * DuckDB oracle twin uses — so similarity values stay bit-identical.
  */
object VectorExprs {
  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))

  def hyperplane_buckets(vec: Column, tables: Int, planes: Int): Column =
    Bridge.column(HyperplaneBuckets(Bridge.expression(vec), tables, planes))

  /** md5-portable hyperplane buckets (weights from md5("t/p:d")),
    * value-verifiable by a DuckDB oracle. */
  def hyperplane_buckets_md5(vec: Column, tables: Int, planes: Int): Column =
    Bridge.column(HyperplaneBucketsMd5(Bridge.expression(vec), tables, planes))

  /** all ordered pairs (i<j) of an array as array<struct<a,b>> */
  def pair_combinations(arr: Column): Column =
    Bridge.column(PairCombinations(Bridge.expression(arr)))

  /** positions differing between two equal-length int arrays */
  def hamming_dist(a: Column, b: Column): Column =
    Bridge.column(HammingDist(Bridge.expression(a), Bridge.expression(b)))
}

/** Ordered pair expansion of a (bucket member) array in one kernel
  * pass — the nested transform/slice/flatten HOF chain building the
  * same pairs is interpreted per row.
  */
case class PairCombinations(child: Expression) extends UnaryExpression {
  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", elemType), StructField("b", elemType))),
    containsNull = false)
  override def prettyName: String = "pair_combinations"

  override def nullSafeEval(input: Any): Any =
    Kernels.pairCombinations(input.asInstanceOf[ArrayData], elemType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("elemType", elemType,
      classOf[DataType].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.impl.Kernels.pairCombinations($c, $et)")
  }

  override protected def withNewChildInternal(c: Expression): PairCombinations = copy(child = c)
}

case class HammingDist(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_dist"

  override def nullSafeEval(l: Any, r: Any): Any =
    Kernels.hammingInts(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.impl.Kernels.hammingInts($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingDist =
    copy(left = l, right = r)
}

case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any =
    Kernels.cosine(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.impl.Kernels.cosine($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** All multi-table hyperplane LSH buckets of a vector in one pass.
  * Weight w(t,p,d) = sign of xxh64("t/p:d", 42); the ±1 weight matrix
  * is computed once per (tables, planes, dim) per JVM.
  * Output: array<string> of "t:bitstring" bucket keys.
  */
case class HyperplaneBuckets(child: Expression, tables: Int, planes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  override def nullSafeEval(input: Any): Any =
    Kernels.hyperplaneBuckets(input.asInstanceOf[ArrayData], tables, planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.impl.Kernels.hyperplaneBuckets($c, $tables, $planes)")

  override protected def withNewChildInternal(c: Expression): HyperplaneBuckets = copy(child = c)
}

/** md5-portable twin of [[HyperplaneBuckets]]: weight w(t,p,d) = +1
  * iff md5("t/p:d") starts with a hex char in [0-7]. Same output
  * shape; bit-replicable in SQL (the oracle path).
  */
case class HyperplaneBucketsMd5(child: Expression, tables: Int, planes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets_md5"

  override def nullSafeEval(input: Any): Any =
    Kernels.hyperplaneBucketsMd5(input.asInstanceOf[ArrayData], tables, planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.impl.Kernels.hyperplaneBucketsMd5($c, $tables, $planes)")

  override protected def withNewChildInternal(c: Expression): HyperplaneBucketsMd5 = copy(child = c)
}
