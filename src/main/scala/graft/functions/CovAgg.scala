package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass mean + second-moment aggregate for d-dim vectors — the
  * training statistic behind PCA/whitening of an embedding corpus.
  * Buffer = [count, Σx (d), Σxxᵀ (d·(d+1)/2, upper triangle)]: ~16 KB
  * at d=64, accumulated map-side like any partial aggregate, so the
  * shuffle carries #partitions buffers, never vectors — the only
  * viable covariance at corpus scale (the explode-to-(i,j) form
  * amplifies the data d² times). Output: one row
  * struct(n, mean array, moment array upper-tri row-major), from
  * which covariance = M/n − μμᵀ on the driver.
  */
object CovAgg {
  def vec_moments(vec: Column, d: Int): Column =
    Bridge.column(VecMoments(Bridge.expression(vec), d)
      .toAggregateExpression())
}

case class VecMoments(child: Expression, d: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  require(d > 0, s"vec_moments needs d > 0, got $d")
  private val triLen = d * (d + 1) / 2
  private val bufLen = 1 + d + triLen

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("sum", ArrayType(DoubleType, containsNull = false), nullable = false),
    StructField("tri", ArrayType(DoubleType, containsNull = false), nullable = false)))
  override def prettyName: String = "vec_moments"

  override def createAggregationBuffer(): Array[Double] = new Array[Double](bufLen)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[ArrayData]
      if (a.numElements() == d) {
        buf(0) += 1
        var i = 0
        var t = 1 + d
        while (i < d) {
          val xi = a.getDouble(i)
          buf(1 + i) += xi
          var j = i
          while (j < d) { buf(t) += xi * a.getDouble(j); j += 1; t += 1 }
          i += 1
        }
      }
    }
    buf
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bufLen) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any = {
    val sum = new Array[Any](d)
    var i = 0
    while (i < d) { sum(i) = buf(1 + i); i += 1 }
    val tri = new Array[Any](triLen)
    var t = 0
    while (t < triLen) { tri(t) = buf(1 + d + t); t += 1 }
    InternalRow(buf(0).toLong, new GenericArrayData(sum), new GenericArrayData(tri))
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < bufLen) { out.writeDouble(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Double](bufLen)
    var i = 0
    while (i < bufLen) { buf(i) = in.readDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): VecMoments =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VecMoments =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): VecMoments =
    copy(child = c.head)
}
