package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** pmetric semantics re-expressed on DataFrames.
  *
  * Reference behavior (not code): /root/reference/pdata/pmetric —
  * Gauge (last value), Sum (aggregation temporality delta|cumulative
  * per aggregation_temporality.go:17-20, monotonic), Histogram
  * (explicit upper-inclusive bounds, generated_histogramdatapoint.go),
  * ExponentialHistogram (base-2 buckets,
  * generated_exponentialhistogramdatapoint.go), Summary (quantiles),
  * Exemplars (generated_exemplar.go).
  *
  * Scale notes: every op shuffles exactly once on the series key; the
  * window-function ops (temporality conversion, sessionize) reuse that
  * partitioning. Running sums go through DECIMAL so results are
  * independent of accumulation order (and match the DuckDB oracle).
  */
object MetricsOps {
  private val Dec = DecimalType(28, 8)

  /** Gauge semantics: last value per series per time bucket. */
  def gaugeLast(df: DataFrame, seriesKeys: Seq[Column], bucket: Column,
                value: Column, order: Column): DataFrame =
    df.groupBy(seriesKeys :+ bucket.as("bucket"): _*)
      .agg(max_by(value, order).as("last_value"))

  /** Sum semantics: spatial re-aggregation of datapoints onto a series. */
  def sumAgg(df: DataFrame, seriesKeys: Seq[Column], value: Column): DataFrame =
    df.groupBy(seriesKeys: _*)
      .agg(sum(value.cast(Dec)).cast("double").as("total"),
        count(lit(1)).as("n_points"))

  /** delta → cumulative temporality: exact running sum per series. */
  def deltaToCumulative(df: DataFrame, seriesKeys: Seq[String], order: String,
                        delta: String): DataFrame = {
    val w = Window.partitionBy(seriesKeys.map(col): _*).orderBy(col(order))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_value", sum(col(delta).cast(Dec)).over(w).cast("double"))
  }

  /** cumulative → delta temporality: first point passes through
    * (the collector's deltatocumulative inverse convention). */
  def cumulativeToDelta(df: DataFrame, seriesKeys: Seq[String], order: String,
                        cum: String): DataFrame = {
    val w = Window.partitionBy(seriesKeys.map(col): _*).orderBy(col(order))
    df.withColumn("delta_value",
      col(cum) - coalesce(lag(col(cum), 1).over(w), lit(0.0)))
  }

  /** Reset-AWARE cumulative→delta (the cumulativetodelta processor's
    * drop handling): a cumulative reading BELOW its predecessor means
    * the producer restarted and the counter re-began from zero, so
    * the delta for that point is the reading ITSELF, never the
    * negative difference a naive lag-subtract emits (one restart
    * would subtract the whole pre-restart total from the series).
    * First point per series: delta = reading (cumulative from an
    * implicit 0 start), not a reset. Adds `delta_value` +
    * `is_reset`. One series-keyed window — the temporality
    * discipline, shuffle once on the series key. */
  def cumulativeToDeltaWithResets(df: DataFrame, seriesKeys: Seq[String],
                                  order: String, cum: String): DataFrame = {
    val w = Window.partitionBy(seriesKeys.map(col): _*).orderBy(col(order))
    val prev = lag(col(cum), 1).over(w)
    df.withColumn("is_reset", coalesce(col(cum) < prev, lit(false)))
      .withColumn("delta_value",
        when(col("is_reset"), col(cum))
          .otherwise(col(cum) - coalesce(prev, lit(0.0))))
  }

  /** Explicit-bounds histogram, upper-inclusive buckets like OTel:
    * bucket i counts values in (bounds(i-1), bounds(i)]; the last
    * bucket is the +Inf overflow. Returns bucket_idx + readable `le`.
    */
  def explicitBucket(value: Column, bounds: Seq[Double]): Column =
    bounds.zipWithIndex.foldRight(lit(bounds.size): Column) {
      case ((b, i), els) => when(value <= lit(b), lit(i)).otherwise(els)
    }

  /** DuckDB twin of [[explicitBucket]], generated from the same bounds. */
  def explicitBucketSql(valueExpr: String, bounds: Seq[Double]): String =
    bounds.zipWithIndex
      .map { case (b, i) => s"WHEN $valueExpr <= $b THEN $i" }
      .mkString("CASE ", " ", s" ELSE ${bounds.size} END")

  /** Exponential (base-2, scale 0) histogram bucket: smallest k with
    * value <= 2^k, via a CASE chain over exact power-of-two doubles —
    * no transcendental log2, whose last-ULP differences across
    * libm/JVM would flip buckets at boundaries.
    */
  def expBucket(value: Column, kMin: Int, kMax: Int): Column =
    (kMin to kMax).foldRight(lit(kMax + 1): Column) {
      case (k, els) => when(value <= lit(math.pow(2.0, k)), lit(k)).otherwise(els)
    }

  /** DuckDB twin of [[expBucket]] from the same constants. */
  def expBucketSql(valueExpr: String, kMin: Int, kMax: Int): String =
    (kMin to kMax)
      .map(k => f"WHEN $valueExpr <= ${math.pow(2.0, k)}%.10e THEN $k")
      .mkString("CASE ", " ", s" ELSE ${kMax + 1} END")

  /** Exponential-histogram downscaling: bucket index i at scale s
    * covers (2^(i/2^s), 2^((i+1)/2^s)], so lowering the scale by d
    * merges runs of 2^d buckets — new index = floor(i / 2^d). The
    * floor matters: indexes are SIGNED (values < 1 sit at negative
    * indexes) and SQL integer division truncates toward zero, which
    * would merge the wrong neighbors below zero; the pmod form is
    * floor division in both engines. `scaleCol` is per-row, so
    * histograms recorded at mixed scales downscale in one pass.
    * (Reference behavior: exponential histogram merge in the
    * collector's delta-aggregation path.)
    */
  def expDownscaleIdx(idx: Column, scaleCol: Column, toScale: Int): Column = {
    // 2^(s-t) as exact integer (pow is exact for these magnitudes;
    // functions.shiftleft only takes a literal shift)
    val m = pow(lit(2.0), (scaleCol - lit(toScale)).cast("int")).cast("long")
    ((idx - pmod(idx, m)) / m).cast("long")
  }

  /** DuckDB twin of [[expDownscaleIdx]] (same pmod floor-div form). */
  def expDownscaleIdxSql(idxExpr: String, scaleExpr: String, toScale: Int): String = {
    val m = s"(1 << ($scaleExpr - $toScale))"
    s"CAST(($idxExpr - ((($idxExpr % $m) + $m) % $m)) / $m AS BIGINT)"
  }

  /** Merge exponential histograms recorded at mixed scales down to
    * one common scale: downscale every bucket index, then sum counts
    * per (series, index) — one shuffle on the series keys. */
  def expMergeToScale(df: DataFrame, seriesKeys: Seq[Column], idx: Column,
                      scaleCol: Column, cnt: Column, toScale: Int): DataFrame =
    df.groupBy(seriesKeys :+ expDownscaleIdx(idx, scaleCol, toScale).as("bucket_idx"): _*)
      .agg(sum(cnt).as("bucket_count"))

  /** Exponential-histogram quantile estimation — the query the
    * reference's ExponentialHistogram data model exists to answer
    * (behavior: pdata/internal/data/protogen/metrics/v1/metrics.pb.go
    * — base-2 scale buckets carry enough shape to estimate any
    * quantile from compressed series): cumulative bucket counts →
    * target rank r = q·N → the bucket whose cumulative range contains
    * r → linear interpolation between the bucket's power-of-two
    * bounds.
    *
    * Bucket semantics follow [[expBucket]] (scale 0): bucket k=kMin
    * is the zero/underflow bucket covering [0, 2^kMin]; kMin<k≤kMax
    * covers (2^(k-1), 2^k]; k=kMax+1 is the overflow bucket, clamped
    * to its lower bound 2^kMax (no upper bound to interpolate
    * toward). All bounds are EXACT power-of-two doubles emitted as
    * literals — no transcendental log/pow in the data path, so the
    * DuckDB oracle twin ([[expQuantileEstSql]]) is bit-identical.
    *
    * One shuffle on the series keys: the rank windows and the final
    * group-by share the partitioning, and the input is already a
    * bucket table (tiny — ≤ kMax-kMin+2 rows per series), not raw
    * datapoints. qs must lie in (0, 1].
    */
  def expQuantiles(df: DataFrame, seriesKeys: Seq[Column], idx: Column,
                   cnt: Column, qs: Seq[Double], kMin: Int, kMax: Int): DataFrame = {
    val wOrd = Window.partitionBy(seriesKeys: _*).orderBy(col("_k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(seriesKeys: _*)
    val base = df.select(seriesKeys ++ Seq(idx.as("_k"), cnt.as("_cnt")): _*)
      .withColumn("_cum", sum(col("_cnt")).over(wOrd))
      .withColumn("_total", sum(col("_cnt")).over(wAll))
    val lo = expBucketLower(col("_k"), kMin, kMax)
    val hi = expBucketUpper(col("_k"), kMin, kMax)
    val cumD = col("_cum").cast("double")
    val beforeD = (col("_cum") - col("_cnt")).cast("double")
    val cntD = col("_cnt").cast("double")
    val aggs = qs.map { q =>
      val r = lit(q) * col("_total").cast("double")
      val est = lo + ((r - beforeD) / cntD) * (hi - lo)
      max(when(beforeD < r && cumD >= r, est)).as(qName(q))
    }
    val names = seriesKeys.map(_.toString)
    base.groupBy(names.map(col): _*)
      .agg(max(col("_total")).as("n"), aggs: _*)
  }

  /** Prometheus histogram_quantile over EXPLICIT bounds: the
    * [[expQuantiles]] rank walk + in-bucket linear interpolation with
    * the bound tables built from the bounds list ([0]=(0,b0],
    * [i]=(b(i-1),bi]). The overflow bucket (idx == bounds.size)
    * CLAMPS to the highest finite bound — promql's documented
    * behavior for a quantile landing past the last boundary (there is
    * no upper edge to interpolate toward). Same scale shape: one
    * series-keyed window pass over the bucket table, which is already
    * the compressed form — never the raw points. */
  def explicitQuantiles(df: DataFrame, seriesKeys: Seq[Column], idx: Column,
                        cnt: Column, qs: Seq[Double],
                        bounds: Seq[Double]): DataFrame = {
    require(bounds.nonEmpty, "explicit bounds must be non-empty")
    val wOrd = Window.partitionBy(seriesKeys: _*).orderBy(col("_k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(seriesKeys: _*)
    val base = df.select(seriesKeys ++ Seq(idx.as("_k"), cnt.as("_cnt")): _*)
      .withColumn("_cum", sum(col("_cnt")).over(wOrd))
      .withColumn("_total", sum(col("_cnt")).over(wAll))
    val n = bounds.size
    val lo = (1 until n).foldLeft(when(col("_k") === lit(0), lit(0.0))) {
      (acc, i) => acc.when(col("_k") === lit(i), lit(bounds(i - 1)))
    }.otherwise(lit(bounds(n - 1)))
    val hi = (1 until n).foldLeft(when(col("_k") === lit(0), lit(bounds(0)))) {
      (acc, i) => acc.when(col("_k") === lit(i), lit(bounds(i)))
    }.otherwise(lit(bounds(n - 1)))
    val cumD = col("_cum").cast("double")
    val beforeD = (col("_cum") - col("_cnt")).cast("double")
    val cntD = col("_cnt").cast("double")
    val aggs = qs.map { q =>
      val r = lit(q) * col("_total").cast("double")
      // promql's bucket-0 clamp (promql/quantile.go bucketQuantile):
      // a quantile landing in the first bucket returns its UPPER
      // bound when that bound is <= 0 — bucket 0's lower edge is
      // pinned at 0.0, and interpolating toward a non-positive upper
      // edge from there would run backwards. Bounds are plan-time
      // literals, so the branch only exists for such histograms
      // (negative-bound delta/temperature metrics).
      val interp = lo + ((r - beforeD) / cntD) * (hi - lo)
      val withOverflow = when(col("_k") >= lit(n), lit(bounds(n - 1)))
      val est =
        if (bounds.head <= 0)
          withOverflow.when(col("_k") === lit(0), lit(bounds.head))
            .otherwise(interp)
        else withOverflow.otherwise(interp)
      max(when(beforeD < r && cumD >= r, est)).as(qName(q))
    }
    val names = seriesKeys.map(_.toString)
    base.groupBy(names.map(col): _*)
      .agg(max(col("_total")).as("n"), aggs: _*)
  }

  /** DuckDB twin of [[explicitQuantiles]]'s per-bucket estimate —
    * identical CASE constants (round-trip-printed) and identical
    * parenthesization of the interpolation arithmetic. */
  def explicitQuantileEstSql(kExpr: String, cumExpr: String, cntExpr: String,
                             totalExpr: String, q: Double,
                             bounds: Seq[Double]): String = {
    val n = bounds.size
    val loSql = (s"WHEN $kExpr = 0 THEN 0.0" +:
      (1 until n).map(i => s"WHEN $kExpr = $i THEN ${fmtD(bounds(i - 1))}"))
      .mkString("CASE ", " ", s" ELSE ${fmtD(bounds(n - 1))} END")
    val hiSql = (s"WHEN $kExpr = 0 THEN ${fmtD(bounds(0))}" +:
      (1 until n).map(i => s"WHEN $kExpr = $i THEN ${fmtD(bounds(i))}"))
      .mkString("CASE ", " ", s" ELSE ${fmtD(bounds(n - 1))} END")
    val r = s"($q * CAST($totalExpr AS DOUBLE))"
    val before = s"CAST($cumExpr - $cntExpr AS DOUBLE)"
    // the bucket-0 promql clamp branch exists iff the Spark plan's
    // does (bounds are literals on both sides)
    val clamp0 =
      if (bounds.head <= 0) s"WHEN $kExpr = 0 THEN ${fmtD(bounds.head)} "
      else ""
    val est = s"(CASE WHEN $kExpr >= $n THEN ${fmtD(bounds(n - 1))} " + clamp0 +
      s"ELSE (($loSql) + (($r - $before) / CAST($cntExpr AS DOUBLE)) * (($hiSql) - ($loSql))) END)"
    s"MAX(CASE WHEN $before < $r AND CAST($cumExpr AS DOUBLE) >= $r THEN $est END)"
  }

  /** bucket k's lower bound under [[expBucket]] semantics (see
    * [[expQuantiles]]): 0 for the underflow bucket, else 2^(k-1). */
  def expBucketLower(k: Column, kMin: Int, kMax: Int): Column =
    (kMin + 1 to kMax + 1).foldLeft(when(k <= lit(kMin), lit(0.0))) {
      (acc, kk) => acc.when(k === lit(kk), lit(pow2(kk - 1)))
    }.otherwise(lit(pow2(kMax)))

  /** bucket k's upper bound: 2^k, clamped to 2^kMax for overflow. */
  def expBucketUpper(k: Column, kMin: Int, kMax: Int): Column =
    (kMin to kMax).foldLeft(when(k < lit(kMin), lit(pow2(kMin)))) {
      (acc, kk) => acc.when(k === lit(kk), lit(pow2(kk)))
    }.otherwise(lit(pow2(kMax)))

  private def pow2(k: Int): Double = math.pow(2.0, k)
  /** shortest round-trip decimal for a double — both engines parse it
    * back to the identical bit pattern (%.10e truncation would not) */
  private def fmtD(d: Double): String = java.lang.Double.toString(d)

  /** DuckDB twins of the bound tables, same CASE structure and the
    * same round-trip-printed literals. */
  def expBucketLowerSql(kExpr: String, kMin: Int, kMax: Int): String =
    (s"WHEN $kExpr <= $kMin THEN 0.0" +:
      (kMin + 1 to kMax + 1).map(kk =>
        s"WHEN $kExpr = $kk THEN ${fmtD(pow2(kk - 1))}"))
      .mkString("CASE ", " ", s" ELSE ${fmtD(pow2(kMax))} END")
  def expBucketUpperSql(kExpr: String, kMin: Int, kMax: Int): String =
    (s"WHEN $kExpr < $kMin THEN ${fmtD(pow2(kMin))}" +:
      (kMin to kMax).map(kk => s"WHEN $kExpr = $kk THEN ${fmtD(pow2(kk))}"))
      .mkString("CASE ", " ", s" ELSE ${fmtD(pow2(kMax))} END")

  /** DuckDB twin of [[expQuantiles]]'s per-bucket estimate: identical
    * parenthesization so every IEEE op rounds identically. Operands
    * are expression strings over the bucket table (cum/cnt/total as
    * BIGINT columns). */
  def expQuantileEstSql(kExpr: String, cumExpr: String, cntExpr: String,
                        totalExpr: String, q: Double, kMin: Int, kMax: Int): String = {
    val lo = s"(${expBucketLowerSql(kExpr, kMin, kMax)})"
    val hi = s"(${expBucketUpperSql(kExpr, kMin, kMax)})"
    val r = s"($q * CAST($totalExpr AS DOUBLE))"
    val before = s"CAST($cumExpr - $cntExpr AS DOUBLE)"
    val est = s"($lo + (($r - $before) / CAST($cntExpr AS DOUBLE)) * ($hi - $lo))"
    s"MAX(CASE WHEN $before < $r AND CAST($cumExpr AS DOUBLE) >= $r THEN $est END)"
  }

  /** Summary semantics: linearly-interpolated quantiles per series.
    *
    * Implemented with an explicit `v_lo + frac * (v_hi - v_lo)`
    * formula over the sorted value array so the arithmetic is
    * bit-identical to the DuckDB oracle twin ([[quantileSql]]) —
    * engine-built-in percentile implementations differ in the last
    * ULP. collect_list per series is the oracle-exactness path; at
    * 100 TB swap in percentile_approx (same API shape, sketch-based).
    */
  def summaryQuantiles(df: DataFrame, seriesKeys: Seq[Column], value: Column,
                       qs: Seq[Double]): DataFrame = {
    // count(value), not count(*): collect_list drops nulls, and an n
    // that includes them indexes past the array (NULL/shifted quantiles)
    val base = df.groupBy(seriesKeys: _*)
      .agg(sort_array(collect_list(value)).as("arr"), count(value).as("n"))
    val withQs = qs.foldLeft(base) { (d, q) =>
      d.withColumn(qName(q), quantileFromSorted(col("arr"), col("n"), q))
    }
    withQs.drop("arr")
  }

  /** collision-free quantile column name: 0.5→q50, 0.99→q99,
    * 0.999→q99_9 (a plain (q*100).toInt maps 0.99 and 0.999 both to
    * q99 and one silently overwrites the other) */
  private def qName(q: Double): String = {
    val s = (BigDecimal(q) * 100).underlying.stripTrailingZeros.toPlainString
    "q" + s.replace(".", "_").replace("-", "m")
  }

  /** Scale path for Summary quantiles: percentile_approx — a
    * bounded-memory KLL-style sketch with map-side partial merge, so
    * no task ever materializes a series' full value list (the exact
    * [[summaryQuantiles]] collect_list holds every value of a series
    * in one task — fine for the oracle demo, fatal for a 5-series
    * 100 TB table). Same output shape; rank error ≤ 1/accuracy.
    */
  def summaryQuantilesApprox(df: DataFrame, seriesKeys: Seq[Column], value: Column,
                             qs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val base = df.groupBy(seriesKeys: _*)
      .agg(count(value).as("n"),
        percentile_approx(value, typedLit(qs), lit(accuracy)).as("_qs"))
    qs.zipWithIndex.foldLeft(base) { case (d, (q, i)) =>
      d.withColumn(qName(q), element_at(col("_qs"), i + 1))
    }.drop("_qs")
  }

  /** value at quantile q from a sorted array (1-based element_at). */
  private def quantileFromSorted(arr: Column, n: Column, q: Double): Column = {
    val pos = (n - lit(1)).cast("double") * lit(q)
    val lo = (floor(pos) + lit(1)).cast("int")
    val frac = pos - floor(pos)
    val vLo = element_at(arr, lo)
    val vHi = element_at(arr, least(lo + lit(1), n.cast("int")))
    vLo + frac * (vHi - vLo)
  }

  /** DuckDB twin of [[summaryQuantiles]]'s interpolation. */
  def quantileSql(arrExpr: String, nExpr: String, q: Double): String = {
    val pos = s"(CAST(($nExpr - 1) AS DOUBLE) * $q)"
    val lo = s"CAST(FLOOR($pos) + 1 AS BIGINT)"
    val frac = s"($pos - FLOOR($pos))"
    s"(($arrExpr)[$lo] + $frac * (($arrExpr)[LEAST($lo + 1, $nExpr)] - ($arrExpr)[$lo]))"
  }

  /** Monotonic-counter rate: per-bucket delta sum / bucket seconds. */
  def ratePerBucket(df: DataFrame, seriesKeys: Seq[Column], bucket: Column,
                    value: Column, bucketSeconds: Int): DataFrame =
    df.groupBy(seriesKeys :+ bucket.as("bucket"): _*)
      .agg((sum(value.cast(Dec)).cast("double") / lit(bucketSeconds.toDouble)).as("rate_per_sec"),
        count(lit(1)).as("n_points"))

  /** Session windows: split a per-key ordered stream where the gap
    * between consecutive integral timestamps exceeds `gap`. One
    * shuffle on the key; both window passes reuse it.
    */
  def sessionize(df: DataFrame, key: String, tsIntegral: String, gap: Long,
                 tieBreak: Seq[String] = Nil): DataFrame = {
    val byKey = Window.partitionBy(col(key))
      .orderBy(col(tsIntegral) +: tieBreak.map(col): _*)
    val newSession = when(
      col(tsIntegral) - lag(col(tsIntegral), 1).over(byKey) > gap, 1)
      .otherwise(when(lag(col(tsIntegral), 1).over(byKey).isNull, 1).otherwise(0))
    df.withColumn("session_id",
      sum(newSession).over(byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }
}
