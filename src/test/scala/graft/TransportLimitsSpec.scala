package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Pipeline
import graft.sources.{GrpcOtlp, OtlpHttp, OtlpJsonSource}
import graft.sources.GrpcOtlp.{OtlpGrpcExporter, OtlpGrpcReceiver}
import graft.sources.OtlpHttp.{OtlpHttpExporter, OtlpHttpReceiver}

/** Transport size limits (configgrpc max_recv_msg_size, confighttp
  * max_request_body_size) and the transport counters' path into the
  * self-telemetry metrics frame. */
class TransportLimitsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def mkLogRequest(n: Int): String = {
    val recs = (0 until n).map { i =>
      s"""{"timeUnixNano":"${1700000000000000000L + i}","severityNumber":9,
         |"body":{"stringValue":"padding-padding-padding-$i"},"attributes":[]}"""
        .stripMargin.replaceAll("\n", "")
    }.mkString(",")
    s"""{"resourceLogs":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"svc"}}]},
       |"scopeLogs":[{"scope":{"name":"graft"},"logRecords":[$recs]}]}]}"""
      .stripMargin.replaceAll("\n", "")
  }

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("gRPC: a message past max_recv_msg_size is RESOURCE_EXHAUSTED before any decode") {
    import spark.implicits._
    val rx = new OtlpGrpcReceiver(0, tmpDir("grpc_max"), maxRecvMsgBytes = 64)
    try {
      val logs = OtlpJsonSource.parseLogs(Seq(mkLogRequest(10)).toDF("json"))
      val e = intercept[Pipeline.ThrottledExportException] {
        OtlpGrpcExporter("localhost", rx.boundPort, "logs").export(logs)
      }
      assert(e.getMessage.contains("larger than max"))
      assert(rx.obs.throttled.get == 1 && rx.obs.requests.get == 0)
    } finally rx.stop()
  }

  test("HTTP: a body past max_request_body_size is 413 without buffering the excess") {
    import spark.implicits._
    val rx = new OtlpHttpReceiver(0, tmpDir("http_max"),
      maxRequestBodyBytes = 64)
    try {
      val logs = OtlpJsonSource.parseLogs(Seq(mkLogRequest(10)).toDF("json"))
      val e = intercept[Pipeline.PermanentExportException] {
        OtlpHttpExporter(s"http://localhost:${rx.boundPort}", "logs").export(logs)
      }
      assert(e.getMessage.contains("413"))
      assert(rx.obs.throttled.get == 1 && rx.obs.requests.get == 0)
    } finally rx.stop()
  }

  test("transport counters publish through healthFrame as obsreport receiver metrics") {
    import spark.implicits._
    val rx = new OtlpHttpReceiver(0, tmpDir("http_obs"))
    try {
      val logs = OtlpJsonSource.parseLogs(Seq(mkLogRequest(3)).toDF("json"))
      OtlpHttpExporter(s"http://localhost:${rx.boundPort}", "logs").export(logs)
      val svc = Pipeline.Service(Map.empty)
      val frame = svc.healthFrame(spark, timeUnixNano = 2000L,
        startTimeUnixNano = 1000L,
        transports = Map("otlp_http/logs" -> rx.obs.counters),
        // per-transport dimensioned counters are DETAILED-level
        // telemetry (configtelemetry Level semantics)
        level = graft.pipeline.Extensions.LevelDetailed)
      val rows = frame
        .filter(col("metric_name") === "otelcol_receiver_accepted_requests")
        .select(col("value"), element_at(col("attributes"), "receiver").as("r"))
        .collect()
      assert(rows.length == 1)
      assert(rows(0).getDouble(0) == 1.0 && rows(0).getString(1) == "otlp_http/logs")
      // the refused/denied counters ride too (zero here), plus the
      // netstats recv/recv_wire byte counters
      assert(frame.filter(col("metric_name").startsWith("otelcol_receiver_"))
        .count() == 6)
    } finally rx.stop()
  }
}
