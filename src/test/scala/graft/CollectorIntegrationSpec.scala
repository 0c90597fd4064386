package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{MetricsOps, Processors}
import graft.sources.OtlpJsonSource

/** End-to-end "collector config" run: OTLP-JSON in → processors →
  * export, plus a metrics pipeline over parsed datapoints — the
  * whole system wired together the way a collector deployment is.
  */
class CollectorIntegrationSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def mkLogRequest(svc: String, n: Int, errEvery: Int): String = {
    val recs = (0 until n).map { i =>
      val sev = if (i % errEvery == 0) """"severityNumber":17,"severityText":"ERROR""""
        else """"severityNumber":9,"severityText":"INFO""""
      s"""{"timeUnixNano":"${1700000000000000000L + i * 1000000L}",$sev,
         |"body":{"stringValue":"msg-$i"},
         |"attributes":[{"key":"idx","value":{"intValue":"$i"}},
         |  {"key":"noisy","value":{"stringValue":"${"x" * 50}"}}],
         |"traceId":"t${i % 7}","spanId":"s$i"}""".stripMargin.replaceAll("\n", "")
    }.mkString(",")
    s"""{"resourceLogs":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"$svc"}}]},
       |"scopeLogs":[{"scope":{"name":"graft"},"logRecords":[$recs]}]}]}"""
      .stripMargin.replaceAll("\n", "")
  }

  test("logs pipeline: parse → filter → attribute hygiene → batch → export roundtrip") {
    import spark.implicits._
    val requests = Seq(mkLogRequest("api", 40, 5), mkLogRequest("worker", 20, 4)).toDF("json")
    val logs = OtlpJsonSource.parseLogs(requests)
    assert(logs.count() == 60)

    // filter processor: errors only; attribute hygiene: drop the noisy
    // attr, truncate the rest, keep service name
    val processed = Processors.filter(logs, col("severity_number") >= 17)
      .withColumn("attributes", Processors.mapDelete(col("attributes"), Seq("noisy")))
      .withColumn("attributes", Processors.mapTruncateValues(col("attributes"), 16))
      .withColumn("attributes",
        Processors.mapPut(col("attributes"), "pipeline", lit("errors")))
    val exported = OtlpJsonSource.writeLogsJson(processed)
    val back = OtlpJsonSource.parseLogs(exported.select(col("json")))
    assert(back.count() == processed.count())
    val attrs = back.head().getAs[Map[String, String]]("attributes")
    assert(!attrs.contains("noisy") && attrs("pipeline") == "errors")
    // batching on the export path
    val batched = Processors.assignBatches(processed, col("time_unix_nano"), 16)
    assert(batched.groupBy("batch_id").count().agg(max("count")).head().getLong(0) <= 16)
  }

  test("metrics pipeline: parsed sum datapoints → delta→cumulative → gauge last") {
    import spark.implicits._
    val points = (0 until 30).map { i =>
      s"""{"resourceMetrics":[{"resource":{"attributes":[]},
         |"scopeMetrics":[{"scope":{"name":"g"},"metrics":[
         |{"name":"req.count","sum":{"aggregationTemporality":1,"isMonotonic":true,
         |"dataPoints":[{"timeUnixNano":"${i * 60000000000L}","asDouble":${i % 5}.0,"attributes":[]}]}}]}]}]}"""
        .stripMargin.replaceAll("\n", "")
    }
    val parsed = OtlpJsonSource.parseMetricPoints(points.toDF("json"))
    assert(parsed.count() == 30)
    assert(parsed.head().getAs[String]("aggregation_temporality") == "delta")
    val cum = MetricsOps.deltaToCumulative(
      parsed.withColumn("bucket", expr("time_unix_nano DIV 600000000000"))
        .groupBy(col("metric_name"), col("bucket"))
        .agg(sum(col("value")).as("delta_value")),
      Seq("metric_name"), "bucket", "delta_value")
    val last = cum.orderBy(col("bucket").desc).head()
    assert(last.getAs[Double]("cum_value") == (0 until 30).map(_ % 5).sum.toDouble)
  }

  test("declarative JSON config builds and runs a service") {
    val out = java.nio.file.Files.createTempDirectory("cfg_out").toString + "/errors"
    val config =
      s"""{"pipelines": {"logs/errors": {
         |  "receiver": {"type": "table", "dir": "/root/testdata/sf0.001", "table": "events"},
         |  "processors": [
         |    {"type": "filter", "where": "event_type = 'error'"},
         |    {"type": "upsert", "name": "sev", "expr": "upper(event_type)"},
         |    {"type": "drop", "columns": ["props", "ts", "ts_ns"]},
         |    {"type": "select", "exprs": ["event_id", "user_id", "sev", "value"]}],
         |  "exporters": [{"type": "parquet", "path": "$out"}]
         |}}}""".stripMargin
    graft.pipeline.ConfigLoader.fromJson(config).run(spark)
    val result = spark.read.parquet(out)
    assert(result.count() > 0)
    assert(result.columns.toSet == Set("event_id", "user_id", "sev", "value"))
    assert(result.select("sev").distinct().head().getString(0) == "ERROR")
  }

  test("malformed requests route to the dead-letter channel, not the floor") {
    import spark.implicits._
    val requests = Seq(
      mkLogRequest("api", 3, 2),
      """{"this is": "not otlp"}""",
      "garbage{{{").toDF("json")
    val (good, dlq) = OtlpJsonSource.parseLogsWithDlq(requests)
    assert(good.count() == 3)
    assert(dlq.count() == 2)
    assert(dlq.columns.contains("raw"))
  }

  test("streaming collector: file receiver → filter → partitioned parquet sink") {
    import java.nio.file.Files
    val inDir = Files.createTempDirectory("otlp_in").toString
    val outDir = Files.createTempDirectory("otlp_out").toString + "/logs"
    val ckDir = Files.createTempDirectory("otlp_ck").toString
    Files.writeString(java.nio.file.Paths.get(s"$inDir/r1.json"), mkLogRequest("api", 30, 3))
    Files.writeString(java.nio.file.Paths.get(s"$inDir/r2.json"), mkLogRequest("worker", 12, 2))

    val logs = OtlpJsonSource.streamLogs(spark, inDir, maxFilesPerTrigger = 1)
    val errors = Processors.filter(logs, col("severity_number") >= 17)
      .withColumn("service", col("resource_attributes").getItem("service.name"))
    val q = errors.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
      .partitionBy("service")
      .start()
    try q.processAllAvailable() finally q.stop()

    val out = spark.read.parquet(outDir)
    assert(out.count() == 10 + 6)
    assert(out.select("service").distinct().collect().map(_.getString(0)).toSet ==
      Set("api", "worker"))
    // partition pruning works on the service dirs
    val pruned = spark.read.parquet(outDir).filter(col("service") === "api")
    assert(pruned.count() == 10)
  }

  test("map ops: put/delete/keepKeys/truncate behave like pcommon.Map") {
    import spark.implicits._
    val df = Seq(Map("a" -> "1", "b" -> "22", "c" -> "333")).toDF("attrs")
    val r = df.select(
      Processors.mapPut(col("attrs"), "a", lit("9")).as("put"),
      Processors.mapDelete(col("attrs"), Seq("b")).as("del"),
      Processors.mapKeepKeys(col("attrs"), Seq("a", "c")).as("keep"),
      Processors.mapTruncateValues(col("attrs"), 2).as("trunc")).head()
    assert(r.getAs[Map[String, String]]("put") == Map("a" -> "9", "b" -> "22", "c" -> "333"))
    assert(r.getAs[Map[String, String]]("del") == Map("a" -> "1", "c" -> "333"))
    assert(r.getAs[Map[String, String]]("keep") == Map("a" -> "1", "c" -> "333"))
    assert(r.getAs[Map[String, String]]("trunc") == Map("a" -> "1", "b" -> "22", "c" -> "33"))
  }
}
