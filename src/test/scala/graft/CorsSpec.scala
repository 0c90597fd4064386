package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.OtlpHttp
import graft.sources.OtlpHttp.{CorsConfig, OtlpHttpReceiver}

/** confighttp CORS semantics on the live OTLP/HTTP receiver:
  * wildcard origin matching, preflight handling, credentialed
  * origin echo, implicit allowed headers, and static response
  * headers. */
class CorsSpec extends AnyFunSuite {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** raw-socket HTTP/1.1 (HttpURLConnection refuses to send the
    * restricted `Origin` header, which is the whole point here) */
  private def request(port: Int, method: String,
                      headers: Map[String, String],
                      body: Array[Byte] = Array.empty):
      (Int, Map[String, String]) = {
    val sock = new java.net.Socket("localhost", port)
    try {
      sock.setSoTimeout(10000)
      val out = sock.getOutputStream
      val req = new StringBuilder(s"$method /v1/logs HTTP/1.1\r\n")
      req.append(s"Host: localhost:$port\r\n")
      headers.foreach { case (k, v) => req.append(s"$k: $v\r\n") }
      req.append(s"Content-Length: ${body.length}\r\n")
      req.append("Connection: close\r\n\r\n")
      out.write(req.toString.getBytes("UTF-8"))
      out.write(body)
      out.flush()
      val resp = new String(sock.getInputStream.readAllBytes(), "UTF-8")
      val lines = resp.split("\r\n")
      val code = lines(0).split(" ")(1).toInt
      val hs = lines.drop(1).takeWhile(_.nonEmpty).flatMap { l =>
        l.indexOf(':') match {
          case -1 => None
          case i => Some(l.substring(0, i) -> l.substring(i + 1).trim)
        }
      }.map { case (k, v) => k.toLowerCase -> v }.toMap
      (code, hs)
    } finally sock.close()
  }

  test("preflight: allowed origin gets the allow set; disallowed gets bare 204") {
    val rx = new OtlpHttpReceiver(0, tmpDir("cors"),
      cors = Some(CorsConfig(
        allowedOrigins = Seq("http://*.example.com"), maxAge = 7200)))
    try {
      val (code, hs) = request(rx.boundPort, "OPTIONS", Map(
        "Origin" -> "http://app.example.com",
        "Access-Control-Request-Method" -> "POST"))
      assert(code == 204)
      assert(hs("access-control-allow-origin") == "http://app.example.com")
      assert(hs("access-control-allow-methods") == "POST")
      assert(hs("access-control-allow-credentials") == "true")
      assert(hs("access-control-max-age") == "7200")

      // the wildcard replaces 0+ chars INSIDE the pattern — a foreign
      // domain does not match, and no CORS header leaks
      val (code2, hs2) = request(rx.boundPort, "OPTIONS", Map(
        "Origin" -> "http://evil.com",
        "Access-Control-Request-Method" -> "POST"))
      assert(code2 == 204)
      assert(!hs2.contains("access-control-allow-origin"))
    } finally rx.stop()
  }

  test("implicit headers always allowed; '*' allows any; unlisted header refused") {
    val strict = new OtlpHttpReceiver(0, tmpDir("cors_h"),
      cors = Some(CorsConfig(allowedOrigins = Seq("*"))))
    try {
      // Content-Type is implicitly allowed even with no header list
      val (_, hs) = request(strict.boundPort, "OPTIONS", Map(
        "Origin" -> "http://any.io",
        "Access-Control-Request-Method" -> "POST",
        "Access-Control-Request-Headers" -> "Content-Type"))
      assert(hs.contains("access-control-allow-origin"))
      // a custom header is NOT in the default allow set
      val (_, hs2) = request(strict.boundPort, "OPTIONS", Map(
        "Origin" -> "http://any.io",
        "Access-Control-Request-Method" -> "POST",
        "Access-Control-Request-Headers" -> "X-Custom-Tracing"))
      assert(!hs2.contains("access-control-allow-origin"))
    } finally strict.stop()

    val anyH = new OtlpHttpReceiver(0, tmpDir("cors_any"),
      cors = Some(CorsConfig(allowedOrigins = Seq("*"),
        allowedHeaders = Seq("*"))))
    try {
      val (_, hs3) = request(anyH.boundPort, "OPTIONS", Map(
        "Origin" -> "http://any.io",
        "Access-Control-Request-Method" -> "POST",
        "Access-Control-Request-Headers" -> "X-Custom-Tracing"))
      assert(hs3("access-control-allow-headers") == "X-Custom-Tracing")
    } finally anyH.stop()
  }

  test("actual POST echoes the allowed origin and still ingests; static response headers ride every response") {
    val rx = new OtlpHttpReceiver(0, tmpDir("cors_post"),
      cors = Some(CorsConfig(allowedOrigins = Seq("http://app.io"))),
      responseHeaders = Map("Server" -> "graft"))
    try {
      val body =
        """{"resourceLogs":[{"resource":{"attributes":[]},"scopeLogs":[
          |{"scope":{"name":"g"},"logRecords":[{"timeUnixNano":"1",
          |"severityNumber":9,"body":{"stringValue":"x"},"attributes":[]}]}]}]}"""
          .stripMargin.replaceAll("\n", "").getBytes("UTF-8")
      val (code, hs) = request(rx.boundPort, "POST", Map(
        "Origin" -> "http://app.io",
        "Content-Type" -> "application/json"), body)
      assert(code == 200)
      assert(hs("access-control-allow-origin") == "http://app.io")
      assert(hs("server") == "graft")
      assert(rx.obs.requests.get == 1)

      // disallowed origin: request STILL processed (the browser is
      // the enforcement point), headers omitted
      val (code2, hs2) = request(rx.boundPort, "POST", Map(
        "Origin" -> "http://other.io",
        "Content-Type" -> "application/json"), body)
      assert(code2 == 200)
      assert(!hs2.contains("access-control-allow-origin"))
      assert(hs2("server") == "graft")
      assert(rx.obs.requests.get == 2)
    } finally rx.stop()
  }
}
