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
}
