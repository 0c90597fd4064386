package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.impl.Kernels

/** Native single-pass expressions for the dedup hot path.
  *
  * The composable higher-order-function formulations re-hash every
  * shingle k times and are interpreted (Spark HOFs don't codegen) —
  * measured 245 s at sf0.1. These run one tight kernel loop per row
  * (graft.functions.impl.Kernels) and generate a single static call
  * in whole-stage codegen. MinHash lanes use the Kirsch–Mitzenmacher
  * double-hashing construction (h_i = h1 + i·h2): one XXH64 pair per
  * shingle.
  */
object HashExprs {
  /** Column API: k-lane minhash signature of an array<string>. */
  def minhash_signature(shingles: Column, k: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(shingles), k))

  /** Column API: 64-bit simhash of an array<string>, as array<int> bits. */
  def simhash_bits(tokens: Column): Column =
    Bridge.column(SimHashBits(Bridge.expression(tokens)))

  /** Column API: distinct word n-gram shingles straight from text. */
  def word_shingles(text: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), n))

  /** Column API: count of elements present in a fixed word list. */
  def wordlist_hits(tokens: Column, words: Seq[String]): Column =
    Bridge.column(WordlistHits(Bridge.expression(tokens), words))

  /** Column API: md5-portable minhash (array<string> of hex lanes,
    * value-verifiable by a DuckDB oracle; empty input → empty array). */
  def minhash_signature_md5(shingles: Column, k: Int): Column =
    Bridge.column(MinHashSignatureMd5(Bridge.expression(shingles), k))

  /** Column API: md5-portable 64-bit simhash as array<int> bits. */
  def simhash_bits_md5(tokens: Column): Column =
    Bridge.column(SimHashBitsMd5(Bridge.expression(tokens)))

  /** Column API: 128-bit simhash (scale variant — wider blocking keys). */
  def simhash_bits_128(tokens: Column): Column =
    Bridge.column(SimHashBits128(Bridge.expression(tokens)))

  /** Column API: Rabin–Karp rolling hash of a string (engine-portable). */
  def rolling_hash(text: Column, base: Long = 31L, mod: Long = 1000000007L): Column =
    Bridge.column(RollingHash(Bridge.expression(text), base, mod))

  /** Column API: all consecutive 3-character windows of a string
    * (code-point stepping — the split(text, '') segmentation), one
    * native pass; < 3 characters yields an empty array. */
  def char_trigrams(text: Column): Column =
    Bridge.column(CharTrigrams(Bridge.expression(text)))

  /** Column API: pack a 0/1-int bit slice into one long (MSB-first).
    * Bijective on the slice — equality/grouping over the packed long
    * IS equality/grouping over the bits, at 8 bytes instead of a
    * 4·len-byte array (the simhash banding shuffle-width fix). */
  def bits_pack(bits: Column, from: Int, len: Int): Column =
    Bridge.column(BitsPack(Bridge.expression(bits), from, len))

  /** Column API: FNV-1a 64-bit hash of a string's UTF-8 bytes. */
  def fnv_hash(text: Column): Column =
    Bridge.column(Fnv1a64(Bridge.expression(text)))

  /** Column API: distinct packed winnowing keys (h_sel·2^21 +
    * (2^21−1−pos_sel)) of a token array, one native pass — decode
    * with shiftright(c, 21) / (2^21−1 − (c & (2^21−1))). */
  def winnow_packed(tokens: Column): Column =
    Bridge.column(WinnowPacked(Bridge.expression(tokens)))

  /** Column API: the 13-field Gopher repetition-signal struct of a
    * token array, one native pass. */
  def repetition_signals(tokens: Column): Column =
    Bridge.column(RepetitionSignals(Bridge.expression(tokens)))

  /** Column API: the q_media_phash deterministic stub decode — 64
    * dHash gradient bits from the md5 pixel walk over
    * (pmod(doc_id, 40), row, col). */
  def dhash_stub_bits(docId: Column): Column =
    Bridge.column(DhashStubBits(Bridge.expression(docId)))

  /** Column API: distinct selected winnowing fingerprint hashes of a
    * token array (winnow_packed with positions dropped and per-doc
    * hash dedup done in-kernel). */
  def winnow_hashes(tokens: Column): Column =
    Bridge.column(WinnowHashes(Bridge.expression(tokens)))

  /** Column API: maximal ExactSubstr spans of one doc pair from its
    * packed shared anchors (pa·2^21 + pb) and the two token arrays;
    * spans come back packed start_a·2^42 + start_b·2^21 + span_len. */
  def extend_spans(anchors: Column, za: Column, zb: Column): Column =
    Bridge.column(ExtendSpans(Bridge.expression(anchors),
      Bridge.expression(za), Bridge.expression(zb)))

  /** Column API: one greedy BPE merge step over a symbol array. */
  def merge_pair(syms: Column, a: String, b: String): Column =
    Bridge.column(MergePair(Bridge.expression(syms), a, b))

  /** Column API: BPE-encode a symbol array with a trained merge
    * table (rank order). */
  def bpe_apply(syms: Column, merges: Seq[(String, String)]): Column =
    Bridge.column(BpeApply(Bridge.expression(syms), merges))

  /** Column API: Viterbi-segment a word with a trained unigram-LM
    * piece vocabulary (piece, logprob). */
  def unigram_apply(word: Column, pieces: Seq[(String, Double)],
                    maxPieceLen: Int): Column =
    Bridge.column(UnigramApply(Bridge.expression(word), pieces, maxPieceLen))
}

/** BPE encoding with the whole merge table as ONE codegen reference
  * object (the codebook discipline — a 50k-merge vocabulary must not
  * inline into plan strings or generated source). */
case class BpeApply(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_apply"

  @transient private lazy val flat: Array[UTF8String] =
    merges.flatMap { case (a, b) =>
      Seq(UTF8String.fromString(a), UTF8String.fromString(b)) }.toArray

  override def nullSafeEval(input: Any): Any =
    Kernels.bpeApply(input.asInstanceOf[ArrayData], flat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", flat,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.impl.Kernels.bpeApply($c, $ref)")
  }

  override def toString: String = s"$prettyName($child, [${merges.length} merges])"
  override def sql: String = s"$prettyName(${child.sql}, [${merges.length} merges])"

  override protected def withNewChildInternal(c: Expression): BpeApply = copy(child = c)
}

/** Unigram-LM Viterbi encode with the whole piece vocabulary as TWO
  * codegen reference objects (hash index + logprob array — the
  * [[BpeApply]] codebook discipline: a 50k-piece vocabulary must not
  * inline into plan strings or generated source). The row work is
  * one [[graft.functions.impl.Kernels.viterbiSegment]] DP call — the
  * same static kernel the driver-side EM trainer uses, so train and
  * apply can never disagree. */
case class UnigramApply(child: Expression, pieces: Seq[(String, Double)],
                        maxPieceLen: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_apply"

  @transient private lazy val idx: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    pieces.iterator.zipWithIndex.foreach { case ((p, _), i) =>
      m.put(UTF8String.fromString(p), Integer.valueOf(i)) }
    m
  }
  @transient private lazy val lps: Array[Double] = pieces.map(_._2).toArray

  override def nullSafeEval(input: Any): Any =
    Kernels.viterbiSegment(input.asInstanceOf[UTF8String], idx, lps, maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idxRef = ctx.addReferenceObj("unigramIdx", idx,
      "java.util.HashMap<org.apache.spark.unsafe.types.UTF8String,java.lang.Integer>")
    val lpsRef = ctx.addReferenceObj("unigramLogps", lps, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.impl.Kernels.viterbiSegment($c, $idxRef, $lpsRef, $maxPieceLen)")
  }

  override def toString: String = s"$prettyName($child, [${pieces.length} pieces])"
  override def sql: String = s"$prettyName(${child.sql}, [${pieces.length} pieces])"

  override protected def withNewChildInternal(c: Expression): UnigramApply =
    copy(child = c)
}

/** one BPE merge step — the per-iteration vocab rewrite of
  * [[graft.operators.TextOps.bpeTrain]]; the pair rides in as two
  * plan-time constants, the row work is one kernel scan. */
case class MergePair(child: Expression, a: String, b: String)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "merge_pair"

  @transient private lazy val aU = UTF8String.fromString(a)
  @transient private lazy val bU = UTF8String.fromString(b)

  override def nullSafeEval(input: Any): Any =
    Kernels.mergePair(input.asInstanceOf[ArrayData], aU, bU)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mergeA", aU, classOf[UTF8String].getName)
    val bRef = ctx.addReferenceObj("mergeB", bU, classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.impl.Kernels.mergePair($c, $aRef, $bRef)")
  }

  override protected def withNewChildInternal(c: Expression): MergePair = copy(child = c)
}

/** distinct packed winnowing keys of a token array in one pass (see
  * Kernels.winnowPacked for the md5/window/dedup parity argument) */
case class WinnowPacked(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_packed"

  override def nullSafeEval(input: Any): Any =
    Kernels.winnowPacked(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.impl.Kernels.winnowPacked($c)")

  override protected def withNewChildInternal(c: Expression): WinnowPacked = copy(child = c)
}

/** the 13-double Gopher repetition-signal struct of a token array
  * (see Kernels.repetitionSignals for the parity argument) */
case class RepetitionSignals(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    "dup_line_frac", "dup_line_char_frac", "dup_para_frac",
    "dup_para_char_frac", "top_2gram_char_frac", "top_3gram_char_frac",
    "top_4gram_char_frac", "dup_5gram_char_frac", "dup_6gram_char_frac",
    "dup_7gram_char_frac", "dup_8gram_char_frac", "dup_9gram_char_frac",
    "dup_10gram_char_frac").map(StructField(_, DoubleType, nullable = true)))
  override def prettyName: String = "repetition_signals"

  override def nullSafeEval(input: Any): Any =
    Kernels.repetitionSignals(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.impl.Kernels.repetitionSignals($c)")

  override protected def withNewChildInternal(c: Expression): RepetitionSignals = copy(child = c)
}

/** dHash stub-decode bits from a doc id (see Kernels.dhashStubBits) */
case class DhashStubBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "dhash_stub_bits"

  override def nullSafeEval(input: Any): Any =
    Kernels.dhashStubBits(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.impl.Kernels.dhashStubBits($c)")

  override protected def withNewChildInternal(c: Expression): DhashStubBits = copy(child = c)
}

/** distinct selected winnowing fingerprint hashes per doc (see
  * Kernels.winnowHashes) */
case class WinnowHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_hashes"

  override def nullSafeEval(input: Any): Any =
    Kernels.winnowHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.impl.Kernels.winnowHashes($c)")

  override protected def withNewChildInternal(c: Expression): WinnowHashes = copy(child = c)
}

/** ExactSubstr extension verify over one doc pair (see
  * Kernels.extendSpans): packed anchors + two token arrays → packed
  * maximal spans */
case class ExtendSpans(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "extend_spans"

  override def nullSafeEval(anchors: Any, za: Any, zb: Any): Any =
    Kernels.extendSpans(anchors.asInstanceOf[ArrayData],
      za.asInstanceOf[ArrayData], zb.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"graft.functions.impl.Kernels.extendSpans($a, $b, $c)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ExtendSpans =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** FNV-1a 64 (OTTL's FNV converter semantics — real spec constants,
  * not an xxhash64 stand-in) */
case class Fnv1a64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv1a64"

  override def nullSafeEval(input: Any): Any =
    Kernels.fnv1a64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.impl.Kernels.fnv1a64($c)")

  override protected def withNewChildInternal(c: Expression): Fnv1a64 = copy(child = c)
}

/** all consecutive 3-character windows of a string in one pass (see
  * Kernels.charTrigrams for the split(text,'') parity argument) */
case class CharTrigrams(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_trigrams"

  override def nullSafeEval(input: Any): Any =
    Kernels.charTrigrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.impl.Kernels.charTrigrams($c)")

  override protected def withNewChildInternal(c: Expression): CharTrigrams = copy(child = c)
}

/** pack `len` (≤ 64) 0/1 int bits starting at `from` into one long
  * (MSB-first; see Kernels.bitsPack for the bijection argument) */
case class BitsPack(child: Expression, from: Int, len: Int) extends UnaryExpression {
  require(len >= 1 && len <= 64, s"bits_pack len must be in [1, 64], got $len")
  override def dataType: DataType = LongType
  override def prettyName: String = "bits_pack"

  override def nullSafeEval(input: Any): Any =
    Kernels.bitsPack(input.asInstanceOf[ArrayData], from, len)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.impl.Kernels.bitsPack($c, $from, $len)")

  override protected def withNewChildInternal(c: Expression): BitsPack = copy(child = c)
}

/** polynomial rolling hash (content fingerprint; one pass per row) */
case class RollingHash(child: Expression, base: Long, mod: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any =
    Kernels.rollingHash(input.asInstanceOf[UTF8String], base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.impl.Kernels.rollingHash($c, ${base}L, ${mod}L)")

  override protected def withNewChildInternal(c: Expression): RollingHash = copy(child = c)
}

/** Count of array elements contained in a fixed word list (hash-set
  * membership per element; the OR-chain HOF filter is interpreted and
  * rescans the list per token).
  */
case class WordlistHits(child: Expression, words: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "wordlist_hits"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  override def nullSafeEval(input: Any): Any =
    Kernels.wordlistHits(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set, classOf[java.util.HashSet[UTF8String]].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.impl.Kernels.wordlistHits($c, $setRef)")
  }

  override protected def withNewChildInternal(c: Expression): WordlistHits = copy(child = c)
}

/** Distinct word n-gram shingles from raw text in one pass: split on
  * ASCII whitespace runs (same token set as
  * `regexp_split_to_array(trim(text), '\s+')`), join n consecutive
  * words with single spaces, de-dup preserving first occurrence.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    Kernels.wordShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.impl.Kernels.wordShingles($c, $n)")

  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
}

/** minhash: per row, min over elements of (xxh64(e,S1) + i·xxh64(e,S2))
  * for lane i in [0,k). Empty/short arrays yield all-Long.MaxValue
  * signatures — note these DO collide with each other (two empty docs
  * are identical), so LSH candidate generation must drop empty-input
  * rows first (DedupOps.lshNearDupPairs does).
  */
case class MinHashSignature(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any =
    Kernels.minhash(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.impl.Kernels.minhash($c, $k)")

  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
}

/** md5-portable minhash: lane i = lexicographic min of
  * md5_hex(i + "|" + element). Slower than the KM double-hash variant
  * (k digests per element) but bit-replicable in any engine with md5 —
  * the variant the value-level oracle runs against.
  */
case class MinHashSignatureMd5(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_signature_md5"

  override def nullSafeEval(input: Any): Any =
    Kernels.minhashMd5(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.impl.Kernels.minhashMd5($c, $k)")

  override protected def withNewChildInternal(c: Expression): MinHashSignatureMd5 = copy(child = c)
}

/** md5-portable simhash: votes from the 64-bit MSB-first prefix of
  * md5(token); sign → bit. array<int> of 64 bits. */
case class SimHashBitsMd5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "simhash_bits_md5"

  override def nullSafeEval(input: Any): Any =
    Kernels.simhashMd5(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.impl.Kernels.simhashMd5($c)")

  override protected def withNewChildInternal(c: Expression): SimHashBitsMd5 = copy(child = c)
}

/** 128-bit simhash from two xxh64 lanes per token — the scale
  * variant whose wider blocking keys survive 1e9+ doc corpora. */
case class SimHashBits128(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "simhash_bits_128"

  override def nullSafeEval(input: Any): Any =
    Kernels.simhash128(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.impl.Kernels.simhash128($c)")

  override protected def withNewChildInternal(c: Expression): SimHashBits128 = copy(child = c)
}

/** simhash: 64 ±1-vote counters over xxh64(token, 42) bits (same seed
  * as Spark's xxhash64), sign → bit. array<int> of 64 bits, LSB first.
  */
case class SimHashBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "simhash_bits"

  override def nullSafeEval(input: Any): Any =
    Kernels.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.impl.Kernels.simhash($c)")

  override protected def withNewChildInternal(c: Expression): SimHashBits = copy(child = c)
}
