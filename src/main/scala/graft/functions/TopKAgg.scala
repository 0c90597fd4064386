package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: `groupBy(key).agg(top_k(value, k))`
  * keeps a k-element min-heap per group — O(k) state, one shuffle,
  * map-side partial aggregation. The window-function formulation
  * (row_number over a per-group sort) shuffles and sorts ALL rows;
  * this is the operator you actually run at 100 TB for "top k per
  * group". TypedImperativeAggregate = the mutable-buffer aggregate
  * extension tier (like HLL/sketch aggregates).
  */
object TopKAgg {
  def top_k(value: Column, k: Int): Column =
    Bridge.column(TopKDoubles(Bridge.expression(value), k)
      .toAggregateExpression())
}

case class TopKDoubles(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[java.lang.Double]]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  // int/float/decimal inputs coerce to double during analysis instead
  // of a runtime ClassCastException in update()
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "top_k"

  override def createAggregationBuffer(): java.util.PriorityQueue[java.lang.Double] =
    new java.util.PriorityQueue[java.lang.Double](k + 1)

  require(k > 0, s"top_k needs k > 0, got $k")

  override def update(buf: java.util.PriorityQueue[java.lang.Double],
                      input: InternalRow): java.util.PriorityQueue[java.lang.Double] = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      // NaN compares false both ways: admitted early it could never be
      // evicted and the result would depend on arrival order — skip it
      if (!java.lang.Double.isNaN(d)) {
        if (buf.size < k) buf.add(d)
        else if (buf.peek() < d) { buf.poll(); buf.add(d) }
      }
    }
    buf
  }

  override def merge(buf: java.util.PriorityQueue[java.lang.Double],
                     other: java.util.PriorityQueue[java.lang.Double]): java.util.PriorityQueue[java.lang.Double] = {
    val it = other.iterator()
    while (it.hasNext) {
      val d = it.next()
      if (!java.lang.Double.isNaN(d)) {
        if (buf.size < k) buf.add(d)
        else if (buf.peek() < d) { buf.poll(); buf.add(d) }
      }
    }
    buf
  }

  override def eval(buf: java.util.PriorityQueue[java.lang.Double]): Any = {
    val arr = new Array[Double](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    // descending
    val out = new Array[Any](arr.length)
    var j = 0
    while (j < arr.length) { out(j) = arr(arr.length - 1 - j); j += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.PriorityQueue[java.lang.Double]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) out.writeDouble(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[java.lang.Double] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(in.readDouble()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKDoubles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKDoubles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKDoubles =
    copy(child = c.head)
}
