package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{ConfigLoader, FeatureGate, ZpagesServer}

/** Live zpages HTTP surface: the debug pages the reference's
  * zpagesextension serves (servicez / pipelinez / extensionz /
  * featurez), plus the redacted configz and the plaintext statusz
  * report, all fetched over loopback HTTP. */
class ZpagesSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def get(port: Int, path: String): (Int, String) = {
    val conn = new java.net.URL(s"http://localhost:$port$path")
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    val code = conn.getResponseCode
    val s = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = if (s == null) "" else
      try new String(s.readAllBytes(), "UTF-8") finally s.close()
    (code, body)
  }

  test("zpages server: all debug pages serve live service state") {
    val doc = """{
      "pipelines": {"logs/zp": {
        "receiver": {"type": "parquet", "path": "IGNORED"},
        "exporters": [{"type": "otlp_http", "endpoint": "http://h:1",
          "signal": "logs", "auth": {"bearer_token": "zp-secret"}}]
      }}}"""
    val svc = ConfigLoader.fromJson(doc)
    val gates = new FeatureGate.Registry
    gates.register("graft.test.zpagesGate", FeatureGate.Alpha,
      "spec-only gate")
    val zp = new ZpagesServer(svc, spark, gates = gates,
      extensions = Seq("zpages", "health_check"), configDoc = Some(doc))
    try {
      val p = zp.boundPort

      val (c1, servicez) = get(p, "/debug/servicez")
      assert(c1 == 200)
      assert(servicez.contains(System.getProperty("java.version")))
      assert(servicez.contains("/debug/pipelinez")
        && servicez.contains("/debug/featurez"))

      val (c2, pipelinez) = get(p, "/debug/pipelinez")
      assert(c2 == 200)
      assert(pipelinez.contains("logs/zp"))
      assert(pipelinez.contains("OtlpHttpExporter"))

      val (c3, featurez) = get(p, "/debug/featurez")
      assert(c3 == 200)
      assert(featurez.contains("graft.test.zpagesGate")
        && featurez.contains("Alpha"))

      val (c4, extensionz) = get(p, "/debug/extensionz")
      assert(c4 == 200)
      assert(extensionz.contains("health_check"))

      // configz serves the REDACTED effective config — never the secret
      val (c5, configz) = get(p, "/debug/configz")
      assert(c5 == 200)
      assert(configz.contains("[REDACTED]") && !configz.contains("zp-secret"))

      val (c6, statusz) = get(p, "/debug/statusz")
      assert(c6 == 200)
      assert(statusz.contains("== pipelinez ==")
        && statusz.contains("pipeline logs/zp"))

      val (c7, _) = get(p, "/debug/nopage")
      assert(c7 == 404)
    } finally zp.stop()
  }

  test("prometheus self-telemetry endpoint: healthFrame families scrape and parse; level=none serves nothing") {
    // service::telemetry::metrics::address (telemetry.go:202-206):
    // the one surface every production collector is scraped through
    val doc = """{
      "service": {"telemetry": {"metrics":
        {"address": "localhost:0", "level": "detailed"}}},
      "pipelines": {"logs/pt": {
        "receiver": {"type": "parquet", "path": "IGNORED"},
        "exporters": [{"type": "logging"}]
      }}}"""
    val svc = ConfigLoader.fromJson(doc)
    assert(svc.telemetryAddress.contains("localhost:0"))
    val o = new graft.pipeline.Pipeline.QueueObs
    o.delivered.set(12); o.retries.set(3); o.deadLetteredBatches.set(1)
    val srv = new graft.pipeline.PromTelemetryServer(svc, spark,
      svc.telemetryAddress.get,
      obs = () => Map("logs/pt" -> o),
      transports = () => Map("otlp_http" -> Map("accepted_requests" -> 7L)))
    try {
      val (code, body) = get(srv.boundPort, "/metrics")
      assert(code == 200)
      // the exposition PARSES: every non-comment line is
      // `name{labels} value`, every family has a TYPE line
      val lines = body.linesIterator.toSeq
      val samples = lines.filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      assert(samples.nonEmpty)
      val sampleRe = """^[a-zA-Z_:][a-zA-Z0-9_:]*(\{[^}]*\})? [-+0-9.eE]+$""".r
      samples.foreach(l => assert(sampleRe.matches(l), s"unparseable sample: $l"))
      val familyOf = samples.map(_.takeWhile(c => c != '{' && c != ' ')).toSet
      for (f <- familyOf)
        assert(lines.exists(_.startsWith(s"# TYPE $f ")), s"family $f has no TYPE")
      // basic family, counter-typed, dimensioned by pipeline
      assert(lines.contains("# TYPE otelcol_exporter_sent_batches counter"))
      assert(samples.contains(
        """otelcol_exporter_sent_batches{pipeline="logs/pt"} 12"""))
      // normal-level family present because level=detailed
      assert(samples.contains(
        """otelcol_exporter_send_retries{pipeline="logs/pt"} 3"""))
      // detailed-level per-transport counters, receiver-dimensioned
      assert(samples.contains(
        """otelcol_receiver_accepted_requests{receiver="otlp_http"} 7"""))
    } finally srv.stop()

    // level=none publishes NOTHING — the healthFrame gate, same door
    val none = svc.copy(telemetryLevel = graft.pipeline.Extensions.LevelNone)
    val srv2 = new graft.pipeline.PromTelemetryServer(none, spark,
      "localhost:0", obs = () => Map("logs/pt" -> o))
    try {
      val (code2, body2) = get(srv2.boundPort, "/metrics")
      assert(code2 == 200 && body2.isEmpty, s"level=none served: '$body2'")
    } finally srv2.stop()

    // a malformed address fails loudly at build, not at first scrape
    intercept[IllegalArgumentException] {
      new graft.pipeline.PromTelemetryServer(svc, spark, "no-port")
    }
  }

  test("mergeTransports SUMS counters across receivers of one transport type") {
    import graft.pipeline.PromTelemetryServer.mergeTransports
    // two otlp_grpc receivers (two pipelines, two ports) + one http:
    // the grpc counters sum per key; a key present on only one
    // receiver rides through; http is untouched
    val merged = mergeTransports(Seq(
      "otlp_grpc" -> Map("accepted_requests" -> 7L, "refused_requests" -> 1L),
      "otlp_grpc" -> Map("accepted_requests" -> 5L, "recv_bytes" -> 100L),
      "otlp_http" -> Map("accepted_requests" -> 3L)))
    assert(merged("otlp_grpc") == Map(
      "accepted_requests" -> 12L, "refused_requests" -> 1L,
      "recv_bytes" -> 100L))
    assert(merged("otlp_http") == Map("accepted_requests" -> 3L))
    assert(mergeTransports(Nil).isEmpty)
  }
}
