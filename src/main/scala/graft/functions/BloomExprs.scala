package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import graft.functions.impl.Kernels

/** Distributed Bloom filter build + codegen'd membership probe.
  *
  * The scale pattern this enables (see DedupOps.dedupAgainstStoreBloom):
  * build the filter over the SMALL side of a join (a daily increment's
  * content hashes — one partial-aggregating pass, the shuffle carries
  * one bit-array per partition), then pre-filter the HUGE side
  * map-side before its shuffle. Bloom filters have no false
  * negatives, so dropping non-matching rows before an inner/right
  * probe join is result-transparent; false positives only cost a few
  * extra rows in the shuffle. At 10 bits/key the filter for a
  * 10M-row increment is ~12.5 MB — a broadcast-sized object that
  * replaces shuffling a multi-TB store.
  *
  * Both sides share the double-hashing kernel in
  * [[graft.functions.impl.Kernels]] (Kirsch–Mitzenmacher over a
  * murmur-mixed 64-bit input) — the filter's only contract.
  */
object BloomExprs {
  /** aggregate: OR-combine the probe bits of a LONG hash column into
    * a `numBits`-wide filter; returns BINARY (little-endian words). */
  def bloom_build(hash: Column, numBits: Int, numHashes: Int): Column =
    Bridge.column(BloomBuild(Bridge.expression(hash), numBits, numHashes)
      .toAggregateExpression())

  /** scalar probe: does the filter (as built by [[bloom_build]])
    * possibly contain this LONG hash? */
  def bloom_might_contain(bits: Array[Long], numHashes: Int, hash: Column): Column =
    Bridge.column(BloomMightContain(Bridge.expression(hash), bits, numHashes))

  /** BINARY filter bytes → word array for [[bloom_might_contain]] */
  def wordsOf(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val words = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < words.length) { words(i) = in.readLong(); i += 1 }
    words
  }
}

case class BloomBuild(child: Expression, numBits: Int, numHashes: Int,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0,
    s"bloom_build numBits must be a positive multiple of 64, got $numBits")
  require(numHashes > 0, s"bloom_build numHashes must be > 0, got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_build"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Kernels.bloomSet(v.asInstanceOf[Long], buf, numHashes)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(buf.length * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < buf.length) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomExprs.wordsOf(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BloomBuild =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBuild =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomBuild =
    copy(child = c.head)
}

/** membership probe with the bit array as ONE codegen reference
  * object (the codebook discipline — the filter must not be inlined
  * into plan strings or codegen source). */
case class BloomMightContain(child: Expression, bits: Array[Long], numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    Kernels.bloomContains(input.asInstanceOf[Long], bits, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBits", bits, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.impl.Kernels.bloomContains($c, $ref, $numHashes)")
  }

  // never render the bit array (MBs) into plan strings
  override def toString: String =
    s"$prettyName($child, [${bits.length * 64} bits])"
  override def sql: String =
    s"$prettyName(${child.sql}, [${bits.length * 64} bits])"

  override protected def withNewChildInternal(c: Expression): BloomMightContain =
    copy(child = c)
}
