package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass expressions for the dedup hot path.
  *
  * The composable higher-order-function formulations (see DedupOps)
  * re-hash every shingle k times and re-evaluate the whole lambda
  * chain on both sides of the LSH self-join — measured 245 s at
  * sf0.1. These expressions hash each element once (XXH64, Spark's
  * own implementation) and derive the k minhash lanes by double
  * hashing (h_i = h1 + i·h2), the standard Kirsch–Mitzenmacher
  * construction. One tight loop per row, no intermediate arrays.
  */
object HashExprs {
  private[functions] def xxh64(s: UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** Column API: k-lane minhash signature of an array<string>. */
  def minhash_signature(shingles: Column, k: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingles), k))

  /** Column API: 64-bit simhash of an array<string>, as array<int> bits. */
  def simhash_bits(tokens: Column): Column =
    Bridge.column(SimHashBits(Bridge.expression(tokens)))

  /** Column API: distinct word n-gram shingles straight from text. */
  def word_shingles(text: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), n))
}

/** Distinct word n-gram shingles from raw text in one pass: split on
  * ASCII whitespace runs (same token set as
  * `regexp_split_to_array(trim(text), '\s+')`), join each n
  * consecutive words with single spaces, de-dup preserving first
  * occurrence. The higher-order-function formulation of the same
  * (transform ∘ sequence ∘ element_at) is interpreted row-by-row by
  * Spark (HOFs don't codegen) — measured 25 µs/shingle vs ~0.1 µs
  * here.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\u000B'

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val words = new scala.collection.mutable.ArrayBuffer[String](64)
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < len && !isWs(s.charAt(i))) i += 1
      if (i > start) words += s.substring(start, i)
    }
    val out = new java.util.LinkedHashSet[UTF8String]()
    var w = 0
    while (w + n <= words.length) {
      val sb = new java.lang.StringBuilder(words(w))
      var j = 1
      while (j < n) { sb.append(' ').append(words(w + j)); j += 1 }
      out.add(UTF8String.fromString(sb.toString))
      w += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

/** minhash: per row, min over elements of (xxh64(e,S1) + i·xxh64(e,S2))
  * for lane i in [0,k). Empty/short arrays yield Long.MaxValue lanes,
  * which never collide across distinct docs in LSH banding.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = HashExprs.xxh64(s, 0x9747b28cL)
        val h2 = HashExprs.xxh64(s, 0x8ebc6af1L) | 1L // odd → all lanes distinct
        var j = 0
        var h = h1
        while (j < k) {
          if (h < mins(j)) mins(j) = h
          h += h2
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

/** simhash: 64 ±1-vote counters over xxh64(token, 42) bits (same seed
  * as Spark's xxhash64, so results match the HOF formulation), sign →
  * bit. Output array<int> of 64 bits, LSB first.
  */
case class SimHashBits(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "simhash_bits"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = HashExprs.xxh64(arr.getUTF8String(i), 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    val bits = new Array[Int](64)
    var j = 0
    while (j < 64) { bits(j) = if (votes(j) > 0) 1 else 0; j += 1 }
    new GenericArrayData(bits)
  }

  override protected def withNewChildInternal(c: Expression): SimHashBits = copy(child = c)
}
