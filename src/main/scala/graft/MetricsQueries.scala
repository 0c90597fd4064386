package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{MetricsOps, SketchOps}
import QUtil._

/** pmetric-semantics demo queries (SURVEY §2 "Metrics semantics").
  * Series model over `events`: series key = event_type (± user_id),
  * time = ts_ns (bigint nanos), datapoint value = value.
  * All time buckets are integral epoch divisions (DuckDB twin:
  * epoch_ns(ts) // k) — never double timestamp math.
  */
object MetricsQueries {
  type Q = (SparkSession, String) => DataFrame

  private val MinNs = "60000000000"       // nanos per minute
  private val HourNs = "3600000000000"    // nanos per hour
  private val histBounds = Seq(25.0, 50.0, 75.0, 100.0, 150.0, 200.0)

  private def ev(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "events")

  val queries: Map[String, Q] = Map(
    "q_gauge_last" -> ((s, dir) => {
      MetricsOps.gaugeLast(ev(s, dir),
        Seq(col("event_type")), expr(s"ts_ns DIV $MinNs"),
        col("value"), col("ts_ns"))
    }),

    "q_sum_agg" -> ((s, dir) => {
      MetricsOps.sumAgg(ev(s, dir), Seq(col("user_id"), col("event_type")), col("value"))
    }),

    "q_delta_to_cumulative" -> ((s, dir) => {
      val perMin = ev(s, dir)
        .groupBy(col("event_type"), expr(s"ts_ns DIV $HourNs").as("bucket"))
        .agg(dsum(col("value")).as("delta_value"))
      MetricsOps.deltaToCumulative(perMin, Seq("event_type"), "bucket", "delta_value")
    }),

    // Reset-AWARE cumulative→delta (the cumulativetodelta processor's
    // drop rule): a reading below its predecessor means the producer
    // restarted — the delta is the reading itself, never the negative
    // lag-difference that would subtract the whole pre-restart total.
    // The per-bucket sums are used as raw readings precisely BECAUSE
    // they fluctuate: every organic dip exercises the reset branch
    // under the oracle. One series-keyed window.
    "q_counter_resets" -> ((s, dir) => {
      val readings = ev(s, dir)
        .groupBy(col("event_type"), expr(s"ts_ns DIV $HourNs").as("bucket"))
        .agg(dsum(col("value")).as("cum_value"))
      MetricsOps.cumulativeToDeltaWithResets(
        readings, Seq("event_type"), "bucket", "cum_value")
    }),

    "q_cumulative_to_delta" -> ((s, dir) => {
      val perMin = ev(s, dir)
        .groupBy(col("event_type"), expr(s"ts_ns DIV $HourNs").as("bucket"))
        .agg(dsum(col("value")).as("delta_value"))
      val cum = MetricsOps.deltaToCumulative(perMin, Seq("event_type"), "bucket", "delta_value")
        .select(col("event_type"), col("bucket"), col("cum_value"))
      MetricsOps.cumulativeToDelta(cum, Seq("event_type"), "bucket", "cum_value")
    }),

    "q_histogram_explicit" -> ((s, dir) => {
      ev(s, dir)
        .withColumn("bucket_idx", MetricsOps.explicitBucket(col("value"), histBounds))
        .groupBy(col("event_type"), col("bucket_idx"))
        .agg(count(lit(1)).as("n"))
    }),

    // histogram temporality: delta→cumulative over BUCKET COUNT
    // series — each (series, bucket) runs its own cumulative sum over
    // time windows, the histogram flavor of deltatocumulative (the
    // scalar version only covers sums). Sparse buckets stay sparse,
    // matching the point stream a collector would emit.
    "q_hist_delta_to_cum" -> ((s, dir) => {
      val deltas = ev(s, dir)
        .withColumn("bucket_idx", MetricsOps.explicitBucket(col("value"), histBounds))
        .groupBy(col("event_type"), expr(s"ts_ns DIV $HourNs").as("win"),
          col("bucket_idx"))
        .agg(count(lit(1)).cast("double").as("delta_n"))
      MetricsOps.deltaToCumulative(deltas, Seq("event_type", "bucket_idx"),
          "win", "delta_n")
        .withColumnRenamed("cum_value", "cum_n")
    }),

    "q_histogram_exp" -> ((s, dir) => {
      ev(s, dir)
        .filter(col("value") > 0)
        .withColumn("bucket_k", MetricsOps.expBucket(col("value"), -4, 12))
        .groupBy(col("event_type"), col("bucket_k"))
        .agg(count(lit(1)).as("n"))
    }),

    // exponential-histogram merge across mixed scales: two synthetic
    // recorders (scale 2 from event_id, scale 1 from user_id — signed
    // indexes included) merge down to scale 0 by floor-div index
    // downscaling + count sum, the collector's exp-histogram
    // aggregation semantic
    "q_exp_downscale" -> ((s, dir) => {
      val e = ev(s, dir)
      val h1 = e.select(col("event_type"),
        (pmod(col("event_id"), lit(41)) - 20).cast("long").as("idx"),
        lit(2).as("scale"), lit(1L).as("cnt"))
      val h2 = e.select(col("event_type"),
        (pmod(col("user_id"), lit(23)) - 11).cast("long").as("idx"),
        lit(1).as("scale"), lit(1L).as("cnt"))
      MetricsOps.expMergeToScale(h1.unionAll(h2), Seq(col("event_type")),
        col("idx"), col("scale"), col("cnt"), toScale = 0)
    }),

    // exp-histogram quantile estimation: build the base-2 bucket
    // table (the compressed form a collector ships), then answer
    // q50/q90/q99 from bucket counts alone — rank walk + linear
    // interpolation between exact power-of-two bounds
    "q_exp_quantiles" -> ((s, dir) => {
      val buckets = ev(s, dir)
        .filter(col("value") > 0)
        .withColumn("bucket_k", MetricsOps.expBucket(col("value"), -4, 12))
        .groupBy(col("event_type"), col("bucket_k"))
        .agg(count(lit(1)).as("cnt"))
      MetricsOps.expQuantiles(buckets, Seq(col("event_type")),
        col("bucket_k"), col("cnt"), Seq(0.5, 0.9, 0.99), -4, 12)
    }),

    // Prometheus histogram_quantile over EXPLICIT bounds — the
    // workhorse percentile every dashboard computes from classic
    // histogram series: rank walk over cumulative bucket counts +
    // linear interpolation inside the bucket, overflow clamped to the
    // highest finite bound (promql behavior). Input is the bucket
    // TABLE (the compressed form a collector ships), never raw points.
    "q_hist_quantile" -> ((s, dir) => {
      val buckets = ev(s, dir)
        .withColumn("bucket_idx", MetricsOps.explicitBucket(col("value"), histBounds))
        .groupBy(col("event_type"), col("bucket_idx"))
        .agg(count(lit(1)).as("cnt"))
      MetricsOps.explicitQuantiles(buckets, Seq(col("event_type")),
        col("bucket_idx"), col("cnt"), Seq(0.5, 0.9, 0.99), histBounds)
    }),

    // Collection-health gaps: per-series inter-arrival statistics —
    // max and total ns between consecutive points plus the point
    // count; the scrape-health report next to the staleness markers.
    // Pure integer gaps (ts_ns deltas); ONE series-keyed window (the
    // temporality discipline — shuffle once on the series key).
    "q_metric_gaps" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"), col("user_id"))
        .orderBy(col("ts_ns"), col("event_id"))
      ev(s, dir)
        .select(col("event_type"), col("user_id"), col("ts_ns"), col("event_id"))
        .withColumn("gap", col("ts_ns") - lag(col("ts_ns"), 1).over(w))
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n_points"),
          max(col("gap")).as("max_gap_ns"),
          sum(col("gap")).as("sum_gap_ns"))
    }),

    "q_summary_quantiles" -> ((s, dir) => {
      MetricsOps.summaryQuantiles(ev(s, dir), Seq(col("event_type")),
        col("value"), Seq(0.5, 0.9, 0.99))
    }),

    "q_rate_per_minute" -> ((s, dir) => {
      MetricsOps.ratePerBucket(ev(s, dir), Seq(col("event_type")),
        expr(s"ts_ns DIV $HourNs"), col("value"), 3600)
    }),

    // Multi-window error-budget BURN (the SRE alerting operator over
    // RED metrics): error rate per 1h window vs its containing 6h
    // window; burn = short/long and an alert fires when the short
    // window burns ≥2× the long-window baseline. Integer counts, two
    // IEEE divisions, one EQUI-join on the containing window id
    // (w6 = w1 DIV 6 — floor division composes, never a range join).
    "q_burn_rate" -> ((s, dir) => {
      val e = ev(s, dir)
      val short = e.groupBy(expr(s"ts_ns DIV $HourNs").as("w1"))
        .agg(count(lit(1)).as("n_short"),
          count(when(col("event_type") === "error", 1)).as("err_short"))
      val long = e.groupBy(expr(s"ts_ns DIV (6 * $HourNs)").as("w6"))
        .agg(count(lit(1)).as("n_long"),
          count(when(col("event_type") === "error", 1)).as("err_long"))
      short.withColumn("w6", expr("w1 DIV 6"))
        .join(long, "w6")
        .withColumn("short_rate",
          col("err_short").cast("double") / col("n_short").cast("double"))
        .withColumn("long_rate",
          col("err_long").cast("double") / col("n_long").cast("double"))
        .withColumn("burn", when(col("long_rate") > 0.0,
          col("short_rate") / col("long_rate")))
        .withColumn("alert", coalesce(col("burn") >= 2.0, lit(false)))
        .select(col("w1"), col("w6"), col("n_short"), col("err_short"),
          col("short_rate"), col("long_rate"), col("burn"), col("alert"))
    }),

    "q_spanmetrics" -> ((s, dir) => {
      ev(s, dir)
        .groupBy(expr(s"ts_ns DIV $HourNs").as("bucket"))
        .agg(
          count(lit(1)).as("calls"),
          count(when(col("event_type") === "error", 1)).as("errors"),
          (count(when(col("event_type") === "error", 1)).cast("double")
            / count(lit(1))).as("error_rate"),
          (dsum(col("value")) / count(lit(1))).as("avg_duration"))
    }),

    "q_tumbling_window" -> ((s, dir) => {
      ev(s, dir)
        .groupBy(col("event_type"), expr(s"ts_ns DIV $HourNs").as("window_start"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total_value"))
    }),

    // histogram datapoints with exemplars (pmetric Exemplar: the max
    // observed value per bucket + its span id). Deterministic via an
    // integral (value_cents, event_id) sort key.
    "q_exemplars" -> ((s, dir) => {
      ev(s, dir)
        .withColumn("bucket_idx", MetricsOps.explicitBucket(col("value"), histBounds))
        .withColumn("sort_key",
          round(col("value") * 100).cast("bigint") * lit(10000000000L) + col("event_id"))
        .groupBy(col("event_type"), col("bucket_idx"))
        .agg(count(lit(1)).as("n"),
          (max(col("sort_key")) % lit(10000000000L)).as("exemplar_event_id"),
          (floor(max(col("sort_key")) / lit(10000000000L)).cast("double") / 100.0)
            .as("exemplar_value"))
    }),

    // µs granularity on both sides: DuckDB's parquet reader truncates
    // TIMESTAMP(NANOS) to micros, so the Spark side must too.
    "q_sessionize" -> ((s, dir) => {
      val e = ev(s, dir).withColumn("ts_us", expr("ts_ns DIV 1000"))
      MetricsOps.sessionize(e, "user_id", "ts_us", 1800000000L, tieBreak = Seq("event_id"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          ((max(col("ts_us")) - min(col("ts_us"))) / lit(1000000L).cast("double")).as("duration_sec"),
          dsum(col("value")).as("session_value"))
    }),

    // DataPointFlags.NoRecordedValue (metric_data_point_flags.go:15 —
    // the staleness marker Prometheus→OTLP carries): a flagged point
    // has NO value, so last-value aggregation must SKIP it, a window
    // of only markers publishes nothing, and the marker count is the
    // series-health signal. The events table carries no flags, so
    // they derive deterministically from point identity.
    "q_staleness" -> ((s, dir) => {
      val pts = ev(s, dir).withColumn("flags",
        when(pmod(col("user_id") + col("ts_ns"), lit(37)) === 0, 1)
          .otherwise(0))
      val recorded = MetricsOps.gaugeLast(pts.filter(col("flags") === 0),
        Seq(col("event_type")), expr(s"ts_ns DIV $MinNs"),
        col("value"), col("ts_ns"))
      val stale = pts.filter(col("flags") === 1)
        .groupBy(col("event_type"), expr(s"ts_ns DIV $MinNs").as("bucket"))
        .agg(count(lit(1)).as("n_stale"))
      // FULL outer: a window of ONLY markers (the strongest health
      // alarm) keeps its n_stale with a null last_value — a left join
      // from the recorded side would drop it exactly when it matters
      recorded.join(stale, Seq("event_type", "bucket"), "full")
        .select(col("event_type"), col("bucket"), col("last_value"),
          coalesce(col("n_stale"), lit(0L)).as("n_stale"))
    }),

    // HistogramDataPoint's scalar field set (metrics.proto: count,
    // sum, and the OPTIONAL min/max added in OTLP 0.9) per series
    // window — q_histogram_explicit covers the bucket axis; this is
    // the datapoint-scalar axis every OTLP histogram carries
    "q_hist_minmax" -> ((s, dir) => {
      ev(s, dir)
        .groupBy(col("event_type"), expr(s"ts_ns DIV $HourNs").as("bucket"))
        .agg(count(lit(1)).as("n"),
          dsum(col("value")).as("sum_value"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
    }),

    // Label-cardinality offenders: per (metric, label key) HLL
    // distinct-value estimate + exact + flag. The #1 operational
    // failure of a metrics backend is a label whose value set grows
    // with traffic (user ids, request ids) — this is the report that
    // catches it BEFORE the series store melts, and the sketch is
    // what makes it continuously runnable: per (metric, label) the
    // state is 256 bucket maxima that merge by max across shards and
    // hours, so the shuffle is (metrics × labels × 256) partials at
    // any volume. The exact column is the small-SF QA reference.
    "q_label_cardinality" -> ((s, dir) => {
      val e = ev(s, dir)
      val labels = e.select(col("event_type").as("metric"),
          explode(map(
            lit("user_id"), col("user_id").cast("string"),
            lit("k"), get_json_object(col("props"), "$.k")))
            .as(Seq("label_key", "label_value")))
        .filter(col("label_value").isNotNull)
      val pb = SketchOps.hllBucketMax(labels, Seq("metric", "label_key"),
        col("label_value"))
      val est = SketchOps.hllDenom(pb, Seq("metric", "label_key"))
      val exact = labels.groupBy(col("metric"), col("label_key"))
        .agg(countDistinct(col("label_value")).as("n_exact"))
      val hll = SketchOps.hllNumerator / col("denom").cast("double")
      est.join(exact, Seq("metric", "label_key"))
        .select(col("metric"), col("label_key"), col("n_exact"),
          col("empty_buckets"), hll.as("hll_est"),
          (hll > lit(64.0)).as("offender"))
    }),

    // Robust per-series anomaly flags: median/MAD (the
    // outlier-resistant z-score every metrics backend ships) over
    // each series' hourly window sums. All centering arithmetic stays
    // in DECIMAL — the lower-median is an ELEMENT of the data (no
    // interpolation, no libm), so med/MAD/flag are exact in both
    // engines; doubles appear only in the final projection. Scale
    // shape: ONE events shuffle builds the per-window frame; the
    // median/MAD passes aggregate that frame per SERIES — windows per
    // series are bounded by the time horizon (not by data volume), so
    // the collect_list holds a calendar-bounded vector, never an
    // SF-scaled one. No windows, so the low-cardinality series key
    // (event_type) never keys a sort-rank.
    "q_anomaly_mad" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val pw = ev(s, dir)
        .groupBy(col("event_type"), expr(s"ts_ns DIV $HourNs").as("bucket"))
        .agg(sum(col("value").cast(DecimalType(28, 8))).as("v"))
      val med = pw.groupBy(col("event_type"))
        .agg(sort_array(collect_list(col("v"))).as("arr"),
          count(lit(1)).as("n"))
        .select(col("event_type"),
          element_at(col("arr"), expr("(n + 1) DIV 2").cast("int")).as("med"))
      val dev = pw.join(med, "event_type")
        .withColumn("dev", abs(col("v") - col("med")))
      val mad = dev.groupBy(col("event_type"))
        .agg(sort_array(collect_list(col("dev"))).as("arr2"),
          count(lit(1)).as("n2"))
        .select(col("event_type"),
          element_at(col("arr2"), expr("(n2 + 1) DIV 2").cast("int")).as("mad"))
      dev.join(mad, "event_type")
        .select(col("event_type"), col("bucket"),
          col("v").cast("double").as("v"),
          col("med").cast("double").as("med"),
          col("mad").cast("double").as("mad"),
          (col("dev").cast("double") > lit(3.0) * col("mad").cast("double"))
            .as("anomaly"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_gauge_last" ->
      s"""SELECT event_type, epoch_ns(ts) // $MinNs AS bucket,
         | max_by(value, epoch_ns(ts)) AS last_value
         |FROM events GROUP BY event_type, epoch_ns(ts) // $MinNs""".stripMargin,

    "q_sum_agg" ->
      """SELECT user_id, event_type,
        | CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS total,
        | COUNT(*) AS n_points
        |FROM events GROUP BY user_id, event_type""".stripMargin,

    "q_delta_to_cumulative" ->
      s"""WITH per AS (
         | SELECT event_type, epoch_ns(ts) // $HourNs AS bucket,
         |  CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS delta_value
         | FROM events GROUP BY 1, 2)
         |SELECT event_type, bucket, delta_value,
         | CAST(SUM(CAST(delta_value AS DECIMAL(28,8)))
         |   OVER (PARTITION BY event_type ORDER BY bucket
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_value
         |FROM per""".stripMargin,

    "q_counter_resets" ->
      s"""WITH per AS (
         | SELECT event_type, epoch_ns(ts) // $HourNs AS bucket,
         |  CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS cum_value
         | FROM events GROUP BY 1, 2),
         |l AS (
         | SELECT event_type, bucket, cum_value,
         |  LAG(cum_value) OVER (PARTITION BY event_type ORDER BY bucket) AS prev
         | FROM per)
         |SELECT event_type, bucket, cum_value,
         | COALESCE(cum_value < prev, FALSE) AS is_reset,
         | CASE WHEN COALESCE(cum_value < prev, FALSE) THEN cum_value
         |      ELSE cum_value - COALESCE(prev, 0.0) END AS delta_value
         |FROM l""".stripMargin,

    "q_cumulative_to_delta" ->
      s"""WITH per AS (
         | SELECT event_type, epoch_ns(ts) // $HourNs AS bucket,
         |  CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS delta_value
         | FROM events GROUP BY 1, 2),
         |cum AS (
         | SELECT event_type, bucket,
         |  CAST(SUM(CAST(delta_value AS DECIMAL(28,8)))
         |    OVER (PARTITION BY event_type ORDER BY bucket
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_value
         | FROM per)
         |SELECT event_type, bucket, cum_value,
         | cum_value - COALESCE(LAG(cum_value, 1) OVER (PARTITION BY event_type ORDER BY bucket), 0.0) AS delta_value
         |FROM cum""".stripMargin,

    "q_histogram_explicit" ->
      s"""SELECT event_type,
         | ${MetricsOps.explicitBucketSql("value", histBounds)} AS bucket_idx,
         | COUNT(*) AS n
         |FROM events GROUP BY 1, 2""".stripMargin,

    "q_hist_delta_to_cum" ->
      s"""WITH deltas AS (
         | SELECT event_type, epoch_ns(ts) // $HourNs AS win,
         |  ${MetricsOps.explicitBucketSql("value", histBounds)} AS bucket_idx,
         |  CAST(COUNT(*) AS DOUBLE) AS delta_n
         | FROM events GROUP BY 1, 2, 3)
         |SELECT event_type, win, bucket_idx, delta_n,
         | CAST(SUM(CAST(delta_n AS DECIMAL(28,8)))
         |   OVER (PARTITION BY event_type, bucket_idx ORDER BY win
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_n
         |FROM deltas""".stripMargin,

    "q_histogram_exp" ->
      s"""SELECT event_type,
         | ${MetricsOps.expBucketSql("value", -4, 12)} AS bucket_k,
         | COUNT(*) AS n
         |FROM events WHERE value > 0 GROUP BY 1, 2""".stripMargin,

    "q_exp_downscale" ->
      s"""WITH h AS (
         | SELECT event_type, CAST(event_id % 41 - 20 AS BIGINT) AS idx, 2 AS scale, 1 AS cnt FROM events
         | UNION ALL
         | SELECT event_type, CAST(user_id % 23 - 11 AS BIGINT) AS idx, 1 AS scale, 1 AS cnt FROM events)
         |SELECT event_type,
         | ${MetricsOps.expDownscaleIdxSql("idx", "scale", 0)} AS bucket_idx,
         | CAST(SUM(cnt) AS BIGINT) AS bucket_count
         |FROM h GROUP BY 1, 2""".stripMargin,

    "q_exp_quantiles" ->
      s"""WITH b AS (
         | SELECT event_type,
         |  ${MetricsOps.expBucketSql("value", -4, 12)} AS bucket_k,
         |  COUNT(*) AS cnt
         | FROM events WHERE value > 0 GROUP BY 1, 2),
         |c AS (
         | SELECT event_type, bucket_k, cnt,
         |  CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket_k
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         |  CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS total
         | FROM b)
         |SELECT event_type, MAX(total) AS n,
         | ${MetricsOps.expQuantileEstSql("bucket_k", "cum", "cnt", "total", 0.5, -4, 12)} AS q50,
         | ${MetricsOps.expQuantileEstSql("bucket_k", "cum", "cnt", "total", 0.9, -4, 12)} AS q90,
         | ${MetricsOps.expQuantileEstSql("bucket_k", "cum", "cnt", "total", 0.99, -4, 12)} AS q99
         |FROM c GROUP BY event_type""".stripMargin,

    "q_hist_quantile" ->
      s"""WITH b AS (
         | SELECT event_type,
         |  ${MetricsOps.explicitBucketSql("value", histBounds)} AS bucket_idx,
         |  COUNT(*) AS cnt
         | FROM events GROUP BY 1, 2),
         |c AS (
         | SELECT event_type, bucket_idx, cnt,
         |  CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket_idx
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         |  CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS total
         | FROM b)
         |SELECT event_type, MAX(total) AS n,
         | ${MetricsOps.explicitQuantileEstSql("bucket_idx", "cum", "cnt", "total", 0.5, histBounds)} AS q50,
         | ${MetricsOps.explicitQuantileEstSql("bucket_idx", "cum", "cnt", "total", 0.9, histBounds)} AS q90,
         | ${MetricsOps.explicitQuantileEstSql("bucket_idx", "cum", "cnt", "total", 0.99, histBounds)} AS q99
         |FROM c GROUP BY event_type""".stripMargin,

    "q_burn_rate" ->
      s"""WITH s AS (
         | SELECT epoch_ns(ts) // $HourNs AS w1, COUNT(*) AS n_short,
         |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS err_short
         | FROM events GROUP BY 1),
         |l AS (
         | SELECT epoch_ns(ts) // (6 * $HourNs) AS w6, COUNT(*) AS n_long,
         |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS err_long
         | FROM events GROUP BY 1),
         |j AS (
         | SELECT s.w1, s.w1 // 6 AS w6, s.n_short, s.err_short,
         |  CAST(s.err_short AS DOUBLE) / CAST(s.n_short AS DOUBLE) AS short_rate,
         |  CAST(l.err_long AS DOUBLE) / CAST(l.n_long AS DOUBLE) AS long_rate
         | FROM s JOIN l ON s.w1 // 6 = l.w6)
         |SELECT w1, w6, n_short, err_short, short_rate, long_rate,
         | CASE WHEN long_rate > 0.0 THEN short_rate / long_rate END AS burn,
         | COALESCE(CASE WHEN long_rate > 0.0 THEN short_rate / long_rate END >= 2.0,
         |  FALSE) AS alert
         |FROM j""".stripMargin,

    "q_metric_gaps" ->
      """WITH g AS (
        | SELECT event_type, user_id,
        |  epoch_ns(ts) - LAG(epoch_ns(ts), 1) OVER (
        |   PARTITION BY event_type, user_id
        |   ORDER BY epoch_ns(ts), event_id) AS gap
        | FROM events)
        |SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n_points,
        | MAX(gap) AS max_gap_ns, CAST(SUM(gap) AS BIGINT) AS sum_gap_ns
        |FROM g GROUP BY 1, 2""".stripMargin,

    "q_summary_quantiles" -> {
      val arr = "arr"; val n = "n"
      s"""WITH s AS (
         | SELECT event_type, list_sort(list(value)) AS arr, COUNT(value) AS n
         | FROM events GROUP BY event_type)
         |SELECT event_type, n,
         | ${MetricsOps.quantileSql(arr, n, 0.5)} AS q50,
         | ${MetricsOps.quantileSql(arr, n, 0.9)} AS q90,
         | ${MetricsOps.quantileSql(arr, n, 0.99)} AS q99
         |FROM s""".stripMargin
    },

    "q_rate_per_minute" ->
      s"""SELECT event_type, epoch_ns(ts) // $HourNs AS bucket,
         | CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) / 3600.0 AS rate_per_sec,
         | COUNT(*) AS n_points
         |FROM events GROUP BY 1, 2""".stripMargin,

    "q_spanmetrics" ->
      s"""SELECT epoch_ns(ts) // $HourNs AS bucket,
         | COUNT(*) AS calls,
         | COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS errors,
         | CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS DOUBLE) / COUNT(*) AS error_rate,
         | CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) / COUNT(*) AS avg_duration
         |FROM events GROUP BY 1""".stripMargin,

    "q_tumbling_window" ->
      s"""SELECT event_type, epoch_ns(ts) // $HourNs AS window_start,
         | COUNT(*) AS n,
         | CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS total_value
         |FROM events GROUP BY 1, 2""".stripMargin,

    "q_exemplars" ->
      s"""WITH b AS (
         | SELECT event_type,
         |  ${MetricsOps.explicitBucketSql("value", histBounds)} AS bucket_idx,
         |  CAST(round(value * 100) AS BIGINT) * 10000000000 + event_id AS sort_key
         | FROM events)
         |SELECT event_type, bucket_idx, COUNT(*) AS n,
         | MAX(sort_key) % 10000000000 AS exemplar_event_id,
         | CAST(FLOOR(MAX(sort_key) / 10000000000) AS DOUBLE) / 100.0 AS exemplar_value
         |FROM b GROUP BY event_type, bucket_idx""".stripMargin,

    "q_sessionize" ->
      """WITH flagged AS (
        | SELECT user_id, event_id, epoch_us(ts) AS tsn, value,
        |  CASE WHEN LAG(epoch_us(ts), 1) OVER w IS NULL THEN 1
        |   WHEN epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w > 1800000000 THEN 1
        |   ELSE 0 END AS new_session
        | FROM events
        | WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |sess AS (
        | SELECT user_id, tsn, value,
        |  CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY tsn, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        | FROM flagged)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        | (MAX(tsn) - MIN(tsn)) / CAST(1000000 AS DOUBLE) AS duration_sec,
        | CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS session_value
        |FROM sess GROUP BY user_id, session_id""".stripMargin,

    "q_staleness" ->
      s"""WITH p AS (SELECT event_type, user_id, epoch_ns(ts) AS tns, value,
         |  CASE WHEN (user_id + epoch_ns(ts)) % 37 = 0 THEN 1 ELSE 0 END AS flags
         | FROM events),
         |rec AS (SELECT event_type, tns // $MinNs AS bucket,
         |  max_by(value, tns) AS last_value
         | FROM p WHERE flags = 0 GROUP BY event_type, tns // $MinNs),
         |st AS (SELECT event_type, tns // $MinNs AS bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n_stale
         | FROM p WHERE flags = 1 GROUP BY event_type, tns // $MinNs)
         |SELECT COALESCE(rec.event_type, st.event_type) AS event_type,
         | COALESCE(rec.bucket, st.bucket) AS bucket, rec.last_value,
         | COALESCE(st.n_stale, CAST(0 AS BIGINT)) AS n_stale
         |FROM rec FULL JOIN st
         | ON rec.event_type = st.event_type AND rec.bucket = st.bucket""".stripMargin,

    "q_hist_minmax" ->
      s"""SELECT event_type, epoch_ns(ts) // $HourNs AS bucket,
         | COUNT(*) AS n,
         | CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS sum_value,
         | MIN(value) AS min_value, MAX(value) AS max_value
         |FROM events GROUP BY event_type, epoch_ns(ts) // $HourNs""".stripMargin,

    "q_label_cardinality" ->
      """WITH labels AS (
        | SELECT event_type AS metric, 'user_id' AS label_key,
        |  user_id::VARCHAR AS label_value FROM events
        | UNION ALL
        | SELECT event_type AS metric, 'k' AS label_key,
        |  json_extract_string(props, '$.k') AS label_value FROM events),
        |f AS (SELECT * FROM labels WHERE label_value IS NOT NULL),
        |pb AS (
        | SELECT metric, label_key,
        |  ('0x' || substr(md5(label_value), 1, 2))::BIGINT AS bucket,
        |  MAX(CASE WHEN ('0x' || substr(md5(label_value), 3, 12))::BIGINT = 0
        |       THEN 49
        |       ELSE 49 - length(bin(('0x' || substr(md5(label_value), 3, 12))::BIGINT))
        |      END) AS mrho
        | FROM f GROUP BY 1, 2, 3),
        |est AS (
        | SELECT metric, label_key,
        |  CAST(SUM(1::BIGINT << (49 - mrho)) AS BIGINT)
        |   + (256 - COUNT(*)) * 562949953421312 AS denom,
        |  256 - COUNT(*) AS empty_buckets
        | FROM pb GROUP BY 1, 2),
        |ex AS (
        | SELECT metric, label_key, COUNT(DISTINCT label_value) AS n_exact
        | FROM f GROUP BY 1, 2)
        |SELECT e.metric, e.label_key, ex.n_exact, e.empty_buckets,
        | (0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 256.0::DOUBLE))
        |  * 65536.0::DOUBLE * 562949953421312.0::DOUBLE
        |  / CAST(e.denom AS DOUBLE) AS hll_est,
        | ((0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / 256.0::DOUBLE))
        |   * 65536.0::DOUBLE * 562949953421312.0::DOUBLE
        |   / CAST(e.denom AS DOUBLE)) > 64.0 AS offender
        |FROM est e JOIN ex ON e.metric = ex.metric
        | AND e.label_key = ex.label_key""".stripMargin,

    "q_anomaly_mad" ->
      s"""WITH pw AS (
         | SELECT event_type, epoch_ns(ts) // $HourNs AS bucket,
         |  SUM(CAST(value AS DECIMAL(28,8))) AS v
         | FROM events GROUP BY 1, 2),
         |med AS (
         | SELECT event_type,
         |  list_sort(list(v))[(COUNT(*) + 1) // 2] AS med
         | FROM pw GROUP BY 1),
         |dev AS (
         | SELECT pw.event_type, pw.bucket, pw.v, med.med,
         |  ABS(pw.v - med.med) AS dev
         | FROM pw JOIN med USING (event_type)),
         |madt AS (
         | SELECT event_type,
         |  list_sort(list(dev))[(COUNT(*) + 1) // 2] AS mad
         | FROM dev GROUP BY 1)
         |SELECT d.event_type, d.bucket,
         | CAST(d.v AS DOUBLE) AS v, CAST(d.med AS DOUBLE) AS med,
         | CAST(m.mad AS DOUBLE) AS mad,
         | (CAST(d.dev AS DOUBLE) > 3.0 * CAST(m.mad AS DOUBLE)) AS anomaly
         |FROM dev d JOIN madt m ON d.event_type = m.event_type""".stripMargin
  )
}
