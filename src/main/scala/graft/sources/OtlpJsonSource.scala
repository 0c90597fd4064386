package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.OtelModel

/** OTLP/JSON log ingestion (receiver/otlpreceiver analog, JSON
  * encoding path — reference: pdata/plog/json.go). Parses the
  * ExportLogsServiceRequest shape:
  *
  * {"resourceLogs":[{"resource":{"attributes":[{"key":k,"value":{"stringValue":v}}]},
  *   "scopeLogs":[{"scope":{"name":n},
  *     "logRecords":[{"timeUnixNano":"...","severityNumber":9,
  *       "severityText":"INFO","body":{"stringValue":"..."},
  *       "attributes":[...],"traceId":"..","spanId":".."}]}]}]}
  *
  * and flattens the Resource → Scope → LogRecord tree into the
  * columnar log schema. Pure column ops (from_json + explode), so the
  * same code serves batch reads and readStream file sources.
  */
object OtlpJsonSource {

  private val kvType = ArrayType(StructType(Seq(
    StructField("key", StringType),
    StructField("value", StructType(Seq(
      StructField("stringValue", StringType),
      StructField("intValue", StringType)))))))

  private val logRecordType = StructType(Seq(
    StructField("timeUnixNano", StringType),
    StructField("observedTimeUnixNano", StringType),
    StructField("severityNumber", IntegerType),
    StructField("severityText", StringType),
    StructField("body", StructType(Seq(StructField("stringValue", StringType)))),
    StructField("attributes", kvType),
    StructField("traceId", StringType),
    StructField("spanId", StringType)))

  private val scopeLogType = StructType(Seq(
    StructField("scope", StructType(Seq(StructField("name", StringType)))),
    StructField("logRecords", ArrayType(logRecordType))))

  private val resourceLogType = StructType(Seq(
    StructField("resource", StructType(Seq(StructField("attributes", kvType)))),
    StructField("scopeLogs", ArrayType(scopeLogType))))

  val requestSchema: StructType = StructType(Seq(
    StructField("resourceLogs", ArrayType(resourceLogType))))

  private def kvToMap(c: org.apache.spark.sql.Column) =
    map_from_arrays(
      transform(c, kv => kv.getField("key")),
      transform(c, kv => coalesce(
        kv.getField("value").getField("stringValue"),
        kv.getField("value").getField("intValue"))))

  /** one JSON request document per input row (`json` column) → one
    * row per log record, OtelModel.logSchema-shaped */
  def parseLogs(requests: DataFrame): DataFrame =
    requests
      .select(from_json(col("json"), requestSchema).as("r"))
      .select(explode(col("r.resourceLogs")).as("rl"))
      .select(kvToMap(col("rl.resource.attributes")).as("resource_attributes"),
        explode(col("rl.scopeLogs")).as("sl"))
      .select(col("resource_attributes"), col("sl.scope.name").as("scope_name"),
        explode(col("sl.logRecords")).as("lr"))
      .select(
        col("lr.timeUnixNano").cast("long").as("time_unix_nano"),
        col("lr.observedTimeUnixNano").cast("long").as("observed_time_unix_nano"),
        col("lr.severityNumber").as("severity_number"),
        col("lr.severityText").as("severity_text"),
        col("lr.body.stringValue").as("body"),
        kvToMap(col("lr.attributes")).as("attributes"),
        col("lr.traceId").as("trace_id"),
        col("lr.spanId").as("span_id"),
        col("resource_attributes"),
        col("scope_name"))

  /** events table → logSchema (the testdata stand-in receiver) */
  def eventsAsLogs(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.Tables(spark, dir, "events")
    e.select(
      col("ts_ns").as("time_unix_nano"),
      col("ts_ns").as("observed_time_unix_nano"),
      when(col("event_type") === "error", 17).otherwise(9).as("severity_number"),
      when(col("event_type") === "error", "ERROR").otherwise("INFO").as("severity_text"),
      col("event_type").as("body"),
      map(lit("value"), col("value").cast("string"),
        lit("props"), col("props")).as("attributes"),
      md5(col("user_id").cast("string")).as("trace_id"),
      md5(col("event_id").cast("string")).as("span_id"),
      map(lit("service.name"), concat(lit("svc-"), (col("user_id") % 5).cast("string")))
        .as("resource_attributes"),
      lit("graft").as("scope_name"))
  }
}
