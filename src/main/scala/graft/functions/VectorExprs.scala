package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native vector expressions for the ANN hot path. The HOF
  * formulations (aggregate ∘ zip_with) are interpreted per element;
  * these run one tight loop per row.
  *
  * CosineSim folds left-to-right in IEEE double — the exact order the
  * DuckDB oracle twin uses — so similarity values stay bit-identical.
  */
object VectorExprs {
  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))

  def hyperplane_buckets(vec: Column, tables: Int, planes: Int): Column =
    Bridge.column(HyperplaneBuckets(Bridge.expression(vec), tables, planes))
}

case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** All multi-table hyperplane LSH buckets of a vector in one pass.
  * Weight w(t,p,d) = sign of xxh64("t/p:d") — identical to the HOF
  * formulation in AnnOps — with the ±1 weight matrix computed once
  * per (tables, planes, dim) per JVM and cached.
  * Output: array<string> of "t:bitstring" bucket keys.
  */
case class HyperplaneBuckets(child: Expression, tables: Int, planes: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  @transient private lazy val weightCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()

  private def weights(dim: Int): Array[Array[Byte]] =
    weightCache.computeIfAbsent(dim, { d =>
      Array.tabulate(tables * planes) { tp =>
        val t = tp / planes; val p = tp % planes
        Array.tabulate(d) { i =>
          val key = UTF8String.fromString(s"$t/$p:$i")
          val h = XXH64.hashUnsafeBytes(key.getBaseObject, key.getBaseOffset, key.numBytes, 42L)
          if (h > 0) 1.toByte else -1.toByte
        }
      }
    })

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val w = weights(dim)
    val vals = new Array[Double](dim)
    var i = 0
    while (i < dim) { vals(i) = v.getDouble(i); i += 1 }
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      val sb = new java.lang.StringBuilder(planes + 4)
      sb.append(t).append(':')
      var p = 0
      while (p < planes) {
        val row = w(t * planes + p)
        var s = 0.0
        var d = 0
        while (d < dim) { s += (if (row(d) == 1) vals(d) else -vals(d)); d += 1 }
        sb.append(if (s > 0) '1' else '0')
        p += 1
      }
      out(t) = UTF8String.fromString(sb.toString)
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneBuckets = copy(child = c)
}
