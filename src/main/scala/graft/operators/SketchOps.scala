package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketch kernels — the fixed-size summaries a 100 TB run
  * computes INSTEAD of exact distinct/frequency passes. Every kernel
  * here is deliberately value-oracle-able: hashes come from md5 (bit
  * identical in the JVM and DuckDB), leading-zero ranks from
  * `length(bin(x))` (both engines strip leading zeros), and all
  * accumulation stays in INTEGER space so no float-summation order
  * can differ between engines. The only floating-point op in an HLL
  * estimate is the final division by one literal constant.
  *
  * Reference framing: the collector keeps its own telemetry scalars
  * (obsreport) but has no analytics sketches; these kernels are the
  * engine-side primitives that make the §2 QA reports (vocabulary
  * cardinality, label-cardinality offenders, heavy hitters) runnable
  * at full corpus scale, where the exact passes they replace would
  * shuffle the whole token/label stream.
  */
object SketchOps {

  /** HyperLogLog layout: m = 256 buckets (b = 8 bits of the md5), the
    * rank field is the NEXT 48 bits, so rho ∈ [1, 49] and the
    * per-bucket integer weight 2^(49−rho) sums to at most
    * 256·2^49 < 2^63 — exact in a BIGINT however the partials arrive.
    */
  val HllBuckets = 256
  private val HllMaxRho = 49
  /** 2^49 — the weight of an untouched (rho = 0 equivalent) bucket. */
  val HllEmptyWeight = 562949953421312L

  /** alpha_256 · m² · 2^49 as one literal expression; the DuckDB twin
    * writes the same parenthesization so both engines constant-fold
    * to the identical double.
    */
  def hllNumerator: Column =
    lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
      lit(65536.0) * lit(562949953421312.0)

  /** Bucket index: first 8 md5 bits (2 hex chars). */
  def hllBucket(v: Column): Column =
    conv(substring(md5(v), 1, 2), 16, 10).cast("int")

  /** Leading-zero rank of the 48-bit tail: 49 − floor(log2(x)) − 1
    * computed exactly as 49 − length(bin(x)) — no libm anywhere.
    */
  def hllRho(v: Column): Column = {
    val x = conv(substring(md5(v), 3, 12), 16, 10).cast("long")
    when(x === 0L, lit(HllMaxRho)).otherwise(lit(HllMaxRho) - length(bin(x)))
  }

  /** Per-key bucket maxima — THE mergeable sketch state: 256 small
    * ints per key that combine by max across any sharding of the
    * input. The groupBy's map-side partial max is what makes the
    * shuffle keys×256 regardless of input volume.
    */
  def hllBucketMax(df: DataFrame, keys: Seq[String], value: Column): DataFrame =
    df.select((keys.map(col) :+ hllBucket(value).as("bucket") :+ hllRho(value).as("rho")): _*)
      .groupBy((keys.map(col) :+ col("bucket")): _*)
      .agg(max(col("rho")).as("mrho"))

  /** Fold bucket maxima to the harmonic denominator + empty-bucket
    * count, both integers. The caller divides hllNumerator by
    * `denom` (cast to double) for the raw estimate; the small-range
    * linear-counting correction needs ln() and stays off-oracle by
    * design — publish empty_buckets so a consumer can apply it.
    */
  def hllDenom(bucketMax: DataFrame, keys: Seq[String]): DataFrame =
    bucketMax.groupBy(keys.map(col): _*)
      .agg(sum(expr(s"shiftleft(1L, $HllMaxRho - mrho)")).as("ssum"),
        count(lit(1)).as("nonempty"))
      .select((keys.map(col) :+
        (col("ssum") + (lit(HllBuckets.toLong) - col("nonempty")) * lit(HllEmptyWeight))
          .as("denom") :+
        (lit(HllBuckets.toLong) - col("nonempty")).as("empty_buckets")): _*)

  /** Count-min lane bucket: seeded md5 over "lane:value", modulo the
    * sketch width. Non-negative by construction (8 hex chars < 2^32).
    */
  def cmBucket(lane: Column, v: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(lane.cast("string"), lit(":"), v)),
      1, 8), 16, 10).cast("long"), lit(width.toLong))
}
