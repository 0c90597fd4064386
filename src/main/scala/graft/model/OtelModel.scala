package graft.model

import org.apache.spark.sql.types._

/** Flattened columnar telemetry model — the Spark-native counterpart
  * of the pdata tree (reference: /root/reference/pdata/plog/logs.go,
  * ptrace generated_span.go, pmetric generated_metric.go).
  *
  * The collector keeps Resource → Scope → record trees per batch; a
  * columnar engine flattens that hierarchy into one row per record
  * with resource/scope fields as (dictionary-encoded) columns — the
  * same normalization the otel-arrow encoding performs before
  * shipping Arrow record batches.
  */
object OtelModel {

  val attributesType: DataType = MapType(StringType, StringType, valueContainsNull = false)

  /** plog.LogRecord flattened */
  val logSchema: StructType = StructType(Seq(
    StructField("time_unix_nano", LongType, nullable = false),
    StructField("observed_time_unix_nano", LongType, nullable = true),
    StructField("severity_number", IntegerType, nullable = true),
    StructField("severity_text", StringType, nullable = true),
    StructField("body", StringType, nullable = true),
    StructField("attributes", attributesType, nullable = true),
    // record-level fidelity (plog generated_logrecord.go:86-128)
    StructField("flags", IntegerType, nullable = true),
    StructField("dropped_attributes_count", IntegerType, nullable = true),
    StructField("trace_id", StringType, nullable = true),
    StructField("span_id", StringType, nullable = true),
    StructField("resource_attributes", attributesType, nullable = true),
    StructField("scope_name", StringType, nullable = true)))

  /** ptrace.Span flattened */
  val spanSchema: StructType = StructType(Seq(
    StructField("trace_id", StringType, nullable = false),
    StructField("span_id", StringType, nullable = false),
    StructField("trace_state", StringType, nullable = true),
    StructField("parent_span_id", StringType, nullable = true),
    StructField("name", StringType, nullable = false),
    StructField("kind", IntegerType, nullable = false),
    StructField("start_time_unix_nano", LongType, nullable = false),
    StructField("end_time_unix_nano", LongType, nullable = false),
    StructField("status_code", IntegerType, nullable = true),
    StructField("status_message", StringType, nullable = true),
    StructField("attributes", attributesType, nullable = true),
    // record-level fidelity (ptrace generated_span.go dropped counts)
    StructField("dropped_attributes_count", IntegerType, nullable = true),
    StructField("dropped_events_count", IntegerType, nullable = true),
    StructField("dropped_links_count", IntegerType, nullable = true),
    StructField("resource_attributes", attributesType, nullable = true),
    StructField("scope_name", StringType, nullable = true)))

  /** pmetric.NumberDataPoint flattened (one row per datapoint; the
    * metric envelope — name/type/temporality — rides along) */
  val metricPointSchema: StructType = StructType(Seq(
    StructField("metric_name", StringType, nullable = false),
    StructField("metric_type", StringType, nullable = false), // gauge|sum|histogram|exponential_histogram|summary
    StructField("description", StringType, nullable = true),
    StructField("unit", StringType, nullable = true),
    StructField("aggregation_temporality", StringType, nullable = true), // delta|cumulative
    StructField("is_monotonic", BooleanType, nullable = true),
    StructField("time_unix_nano", LongType, nullable = false),
    StructField("start_time_unix_nano", LongType, nullable = true),
    StructField("value", DoubleType, nullable = true),
    StructField("attributes", attributesType, nullable = true),
    StructField("resource_attributes", attributesType, nullable = true)))

  case class LogRecord(
      time_unix_nano: Long,
      severity_number: Option[Int],
      severity_text: Option[String],
      body: Option[String],
      trace_id: Option[String],
      span_id: Option[String])
}
