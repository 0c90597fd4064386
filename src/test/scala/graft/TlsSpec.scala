package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{OtlpHttp, OtlpJsonSource, Tls, TlsConfig}
import graft.sources.OtlpHttp.{OtlpHttpExporter, OtlpHttpReceiver}

/** Live TLS/mTLS loopback specs — the configtls semantics over the
  * HTTP transport and the admission-gateway socket transport:
  * identical rows through TLS as plaintext, a wrong-CA client is
  * refused at the handshake, mTLS requires the client identity, and
  * the `tls:` config block reaches the exporter.
  */
class TlsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def mkLogRequest(svc: String, n: Int): String = {
    val recs = (0 until n).map { i =>
      s"""{"timeUnixNano":"${1700000000000000000L + i * 1000000L}",
         |"severityNumber":9,"severityText":"INFO",
         |"body":{"stringValue":"msg-$i"},
         |"attributes":[{"key":"idx","value":{"intValue":"$i"}}],
         |"traceId":"t${i % 7}","spanId":"s$i"}""".stripMargin.replaceAll("\n", "")
    }.mkString(",")
    s"""{"resourceLogs":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"$svc"}}]},
       |"scopeLogs":[{"scope":{"name":"graft"},"logRecords":[$recs]}]}]}"""
      .stripMargin.replaceAll("\n", "")
  }

  // one shared server identity + one "wrong" CA for the whole suite
  private lazy val certDir = tmpDir("graft_tls")
  private lazy val (serverCert, serverKey) = Tls.generateSelfSigned(certDir, "localhost")
  private lazy val (otherCert, _) = {
    val d = tmpDir("graft_tls_other")
    Tls.generateSelfSigned(d, "localhost")
  }
  private lazy val (clientCert, clientKey) = {
    val d = tmpDir("graft_tls_client")
    Tls.generateSelfSigned(d, "localhost")
  }

  test("exporter -> TLS -> receiver: rows identical to plaintext") {
    import spark.implicits._
    val logs = OtlpJsonSource.parseLogs(Seq(mkLogRequest("api", 10)).toDF("json"))

    def roundTrip(tlsServer: Option[TlsConfig],
                  tlsClient: Option[TlsConfig]): Seq[String] = {
      val spool = tmpDir("tls_spool")
      val rx = new OtlpHttpReceiver(0, spool, tls = tlsServer)
      try {
        val scheme = if (tlsServer.isDefined) "https" else "http"
        OtlpHttpExporter(s"$scheme://localhost:${rx.boundPort}", "logs",
          tls = tlsClient).export(logs)
        OtlpJsonSource.parseLogsPb(
          spark.read.format("binaryFile").load(rx.spoolPath("logs", pb = true))
            .select(col("content").as("pb")))
          .select("body").collect().map(_.getString(0)).toSeq.sorted
      } finally rx.stop()
    }

    val plain = roundTrip(None, None)
    val secure = roundTrip(
      Some(TlsConfig(certFile = serverCert, keyFile = serverKey)),
      Some(TlsConfig(caFile = serverCert)))
    assert(plain.nonEmpty && plain == secure,
      s"TLS rows diverge: plain=${plain.size} tls=${secure.size}")
  }

  test("wrong-CA client is refused at the handshake") {
    import spark.implicits._
    val logs = OtlpJsonSource.parseLogs(Seq(mkLogRequest("api", 2)).toDF("json"))
    val rx = new OtlpHttpReceiver(0, tmpDir("tls_badca"),
      tls = Some(TlsConfig(certFile = serverCert, keyFile = serverKey)))
    try {
      val ex = intercept[Exception] {
        OtlpHttpExporter(s"https://localhost:${rx.boundPort}", "logs",
          tls = Some(TlsConfig(caFile = otherCert))).export(logs)
      }
      def chain(t: Throwable): Seq[Throwable] =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
      assert(chain(ex).exists(_.isInstanceOf[javax.net.ssl.SSLException]),
        s"expected an SSL failure, got: $ex")
      assert(rx.obs.requests.get == 0, "request must never reach the handler")
    } finally rx.stop()
  }

  test("mTLS: server requires a client identity; anonymous client refused") {
    import spark.implicits._
    val logs = OtlpJsonSource.parseLogs(Seq(mkLogRequest("api", 3)).toDF("json"))
    val rx = new OtlpHttpReceiver(0, tmpDir("tls_mtls"),
      tls = Some(TlsConfig(certFile = serverCert, keyFile = serverKey,
        caFile = clientCert, clientAuth = true)))
    try {
      val base = s"https://localhost:${rx.boundPort}"
      // with identity: accepted
      OtlpHttpExporter(base, "logs",
        tls = Some(TlsConfig(certFile = clientCert, keyFile = clientKey,
          caFile = serverCert))).export(logs)
      assert(rx.obs.requests.get == 1)
      // anonymous: the handshake (or the request over it) must fail
      intercept[Exception] {
        OtlpHttpExporter(base, "logs",
          tls = Some(TlsConfig(caFile = serverCert))).export(logs)
      }
      assert(rx.obs.requests.get == 1, "anonymous client must be refused")
    } finally rx.stop()
  }

  test("tls: config block reaches the otlp_http exporter") {
    import spark.implicits._
    val spool = tmpDir("tls_cfg")
    val rx = new OtlpHttpReceiver(0, spool,
      tls = Some(TlsConfig(certFile = serverCert, keyFile = serverKey)))
    try {
      val json =
        s"""{"pipelines": {"logs/tls": {
           |  "receiver": {"type": "parquet", "path": "IGNORED"},
           |  "exporters": [{"type": "otlp_http",
           |    "endpoint": "https://localhost:${rx.boundPort}",
           |    "signal": "logs",
           |    "tls": {"ca_file": "$serverCert", "min_version": "TLSv1.2"}}]
           |}}}""".stripMargin
      val svc = graft.pipeline.ConfigLoader.fromJson(json)
      val exp = svc.pipelines.values.head.exporters.head.asInstanceOf[OtlpHttpExporter]
      assert(exp.tls.exists(_.caFile == serverCert))
      val logs = OtlpJsonSource.parseLogs(Seq(mkLogRequest("cfg", 4)).toDF("json"))
      exp.export(logs)
      assert(rx.obs.requests.get == 1)
    } finally rx.stop()
  }

  test("TLS admission gateway: payload lands; wrong-CA sender refused") {
    val spool = tmpDir("tls_gw")
    val admission = new graft.pipeline.AdmissionController(1 << 20)
    val gw = new graft.sources.ArrowIpc.ArrowAdmissionGateway(0, spool, admission,
      tls = Some(TlsConfig(certFile = serverCert, keyFile = serverKey)))
    try {
      val payload = Array.tabulate[Byte](256)(_.toByte)
      val line = java.util.Base64.getEncoder.encodeToString(payload)
      val sock = Tls.clientSocket(
        TlsConfig(caFile = serverCert), "localhost", gw.boundPort)
      try {
        val out = sock.getOutputStream
        out.write((line + "\n").getBytes("US-ASCII"))
        out.flush()
      } finally sock.close()
      val deadline = System.nanoTime() + 10000000000L
      while (gw.payloads.get < 1 && System.nanoTime() < deadline) Thread.sleep(20)
      assert(gw.payloads.get == 1, "TLS payload did not land in the spool")

      // wrong CA: handshake fails on the first read/write
      intercept[Exception] {
        val bad = Tls.clientSocket(
          TlsConfig(caFile = otherCert), "localhost", gw.boundPort)
        try {
          bad.getOutputStream.write((line + "\n").getBytes("US-ASCII"))
          bad.getOutputStream.flush()
          bad.startHandshake()
        } finally bad.close()
      }
      assert(gw.payloads.get == 1)
    } finally gw.stop()
  }

  test("gRPC over TLS: rows land; wrong-CA client refused") {
    import spark.implicits._
    val spool = tmpDir("tls_grpc")
    val rx = new graft.sources.GrpcOtlp.OtlpGrpcReceiver(0, spool,
      tls = Some(TlsConfig(certFile = serverCert, keyFile = serverKey)))
    try {
      val logs = OtlpJsonSource.parseLogs(Seq(mkLogRequest("g", 5)).toDF("json"))
      graft.sources.GrpcOtlp.OtlpGrpcExporter("localhost", rx.boundPort, "logs",
        tls = Some(TlsConfig(caFile = serverCert))).export(logs)
      assert(rx.obs.requests.get == 1)
      val back = OtlpJsonSource.parseLogsPb(
        spark.read.format("binaryFile").load(rx.spoolPath("logs"))
          .select(col("content").as("pb")))
      assert(back.count() == 5)
      intercept[Exception] {
        graft.sources.GrpcOtlp.OtlpGrpcExporter("localhost", rx.boundPort, "logs",
          tls = Some(TlsConfig(caFile = otherCert))).export(logs)
      }
      assert(rx.obs.requests.get == 1)
    } finally rx.stop()
  }

  test("Arrow-over-gRPC over TLS: stream rows land; wrong-CA client refused") {
    import spark.implicits._
    val spool = tmpDir("tls_agrpc")
    val rx = new graft.sources.ArrowGrpc.ArrowGrpcReceiver(0, spool,
      tls = Some(TlsConfig(certFile = serverCert, keyFile = serverKey)))
    try {
      val logs = OtlpJsonSource.parseLogs(Seq(mkLogRequest("a", 5)).toDF("json"))
      val exp = new graft.sources.ArrowGrpc.ArrowGrpcStreamExporter(
        "localhost", rx.boundPort, "logs", numStreams = 1,
        tls = Some(TlsConfig(caFile = serverCert)))
      exp.export(logs)
      exp.shutdown()
      assert(rx.obs.batches.get == 1)
      val back = graft.sources.ArrowIpc.readSpool(
        spark, rx.spoolPath("logs"), logs.schema)
      assert(back.count() == 5)
      // wrong CA: the handshake fails before any batch; classified
      // retryable (stream restart), never delivered
      val bad = new graft.sources.ArrowGrpc.ArrowGrpcStreamExporter(
        "localhost", rx.boundPort, "logs", numStreams = 1,
        tls = Some(TlsConfig(caFile = otherCert)))
      intercept[Exception] { bad.export(logs) }
      assert(rx.obs.batches.get == 1)
    } finally rx.stop()
  }

  test("protocol bounds: TLSv1.3-only server refuses a TLSv1.2-max client") {
    import spark.implicits._
    val logs = OtlpJsonSource.parseLogs(Seq(mkLogRequest("api", 1)).toDF("json"))
    val rx = new OtlpHttpReceiver(0, tmpDir("tls_ver"),
      tls = Some(TlsConfig(certFile = serverCert, keyFile = serverKey,
        minVersion = "TLSv1.3", maxVersion = "TLSv1.3")))
    try {
      intercept[Exception] {
        OtlpHttpExporter(s"https://localhost:${rx.boundPort}", "logs",
          tls = Some(TlsConfig(caFile = serverCert,
            minVersion = "TLSv1.2", maxVersion = "TLSv1.2"))).export(logs)
      }
      // and the matching client connects fine
      OtlpHttpExporter(s"https://localhost:${rx.boundPort}", "logs",
        tls = Some(TlsConfig(caFile = serverCert,
          minVersion = "TLSv1.3", maxVersion = "TLSv1.3"))).export(logs)
      assert(rx.obs.requests.get == 1)
    } finally rx.stop()
  }
}
