package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{ClientInfo, Pipeline}
import graft.sources.{Auth, OtlpHttp, OtlpJsonSource, GrpcOtlp}
import graft.sources.OtlpHttp.{OtlpHttpExporter, OtlpHttpReceiver}
import graft.sources.GrpcOtlp.{OtlpGrpcExporter, OtlpGrpcReceiver}

/** configauth + extension/auth semantics, live on both loopback
  * transports: a server authenticator gates ingestion (failed auth →
  * 401 / UNAUTHENTICATED, the data NEVER spools), a client
  * authenticator injects credentials, and the published attributes
  * land in `_client.auth` for downstream tenancy decisions.
  */
class AuthSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def mkLogRequest(svc: String, n: Int): String = {
    val recs = (0 until n).map { i =>
      s"""{"timeUnixNano":"${1700000000000000000L + i}","severityNumber":9,
         |"body":{"stringValue":"m$i"},"attributes":[]}"""
        .stripMargin.replaceAll("\n", "")
    }.mkString(",")
    s"""{"resourceLogs":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"$svc"}}]},
       |"scopeLogs":[{"scope":{"name":"graft"},"logRecords":[$recs]}]}]}"""
      .stripMargin.replaceAll("\n", "")
  }

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("HTTP bearer: valid token passes, missing/wrong token is 401 permanent, nothing spools") {
    import spark.implicits._
    val spool = tmpDir("auth_http")
    val rx = new OtlpHttpReceiver(0, spool,
      auth = Some(Auth.BearerTokenServer(Set("s3cr3t"))))
    try {
      val base = s"http://localhost:${rx.boundPort}"
      val logs = OtlpJsonSource.parseLogs(Seq(mkLogRequest("api", 5)).toDF("json"))

      // valid credential: accepted and spooled
      OtlpHttpExporter(base, "logs",
        auth = Some(Auth.BearerTokenClient("s3cr3t"))).export(logs)
      assert(rx.obs.requests.get == 1 && rx.obs.denied.get == 0)

      // no credential: 401, permanent (the caller must not retry)
      val e1 = intercept[Pipeline.PermanentExportException] {
        OtlpHttpExporter(base, "logs").export(logs)
      }
      assert(e1.getMessage.contains("401"))

      // wrong token: 401 too
      intercept[Pipeline.PermanentExportException] {
        OtlpHttpExporter(base, "logs",
          auth = Some(Auth.BearerTokenClient("wrong"))).export(logs)
      }
      assert(rx.obs.denied.get == 2)

      // rejected requests never entered the pipeline: exactly ONE
      // request's rows in the spool
      val back = OtlpJsonSource.parseLogsPb(
        spark.read.format("binaryFile").load(rx.spoolPath("logs", pb = true))
          .select(col("content").as("pb")))
      assert(back.count() == 5)
    } finally rx.stop()
  }

  test("HTTP basic: subject publishes into _client.auth for downstream tenancy") {
    import spark.implicits._
    val spool = tmpDir("auth_http_basic")
    @volatile var published = Map.empty[String, String]
    val rx = new OtlpHttpReceiver(0, spool,
      auth = Some(Auth.BasicAuthServer(Map("alice" -> "pw1", "bob" -> "pw2"))),
      onAuthenticated = (_, attrs) => published = attrs)
    try {
      val base = s"http://localhost:${rx.boundPort}"
      val logs = OtlpJsonSource.parseLogs(Seq(mkLogRequest("api", 3)).toDF("json"))
      OtlpHttpExporter(base, "logs",
        auth = Some(Auth.BasicAuthClient("alice", "pw1"))).export(logs)
      assert(published == Map("subject" -> "alice"))

      // the receiver attaches the authenticator's attributes as
      // client.Info AuthData; a downstream stage routes on it
      val frame = ClientInfo.attach(
        OtlpJsonSource.parseLogsPb(
          spark.read.format("binaryFile").load(rx.spoolPath("logs", pb = true))
            .select(col("content").as("pb"))),
        ClientInfo(addr = Some("127.0.0.1"), auth = published))
      val subjects = frame.select(ClientInfo.authCol("subject").as("s"))
        .distinct().collect().map(_.getString(0))
      assert(subjects.sameElements(Array("alice")))

      // bad password refused
      intercept[Pipeline.PermanentExportException] {
        OtlpHttpExporter(base, "logs",
          auth = Some(Auth.BasicAuthClient("alice", "nope"))).export(logs)
      }
    } finally rx.stop()
  }

  test("HTTP 401 carries the WWW-Authenticate challenge of the configured scheme") {
    val spool = tmpDir("auth_http_challenge")
    val rx = new OtlpHttpReceiver(0, spool,
      auth = Some(Auth.ApiKeyServer("X-Api-Key", Map("k1" -> "tenantA"))))
    try {
      val conn = new java.net.URL(
        s"http://localhost:${rx.boundPort}/v1/logs")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setRequestMethod("POST"); conn.setDoOutput(true)
      conn.setRequestProperty("Content-Type", "application/x-protobuf")
      conn.getOutputStream.close()
      assert(conn.getResponseCode == 401)
      assert(conn.getHeaderField("WWW-Authenticate") == "ApiKey")
    } finally rx.stop()
  }

  test("gRPC bearer: valid passes; missing token is UNAUTHENTICATED(16) permanent") {
    import spark.implicits._
    val spool = tmpDir("auth_grpc")
    @volatile var published = Map.empty[String, String]
    val rx = new OtlpGrpcReceiver(0, spool,
      auth = Some(Auth.BearerTokenServer(Set("tok-1"),
        attrsFor = t => Map("tenant" -> s"tenant-of-$t"))),
      onAuthenticated = (_, attrs) => published = attrs)
    try {
      val logs = OtlpJsonSource.parseLogs(Seq(mkLogRequest("api", 4)).toDF("json"))
      OtlpGrpcExporter("localhost", rx.boundPort, "logs",
        auth = Some(Auth.BearerTokenClient("tok-1"))).export(logs)
      assert(rx.obs.requests.get == 1)
      assert(published == Map("tenant" -> "tenant-of-tok-1"))

      val e = intercept[Pipeline.PermanentExportException] {
        OtlpGrpcExporter("localhost", rx.boundPort, "logs").export(logs)
      }
      assert(e.getMessage.contains("grpc-status 16"))
      assert(rx.obs.denied.get == 1)

      val back = OtlpJsonSource.parseLogsPb(
        spark.read.format("binaryFile").load(rx.spoolPath("logs"))
          .select(col("content").as("pb")))
      assert(back.count() == 4)
    } finally rx.stop()
  }

  test("Arrow-gRPC stream bearer: valid streams; missing token is UNAUTHENTICATED permanent, no data spools") {
    import spark.implicits._
    import graft.sources.ArrowGrpc
    val spool = tmpDir("auth_agrpc")
    val rx = new ArrowGrpc.ArrowGrpcReceiver(0, spool,
      auth = Some(Auth.BearerTokenServer(Set("tok-1"))))
    try {
      val logs = OtlpJsonSource.parseLogs(Seq(mkLogRequest("api", 3)).toDF("json"))
      val ok = new ArrowGrpc.ArrowGrpcStreamExporter("localhost", rx.boundPort,
        "logs", numStreams = 1, auth = Some(Auth.BearerTokenClient("tok-1")))
      ok.export(logs)
      ok.shutdown()
      assert(rx.obs.batches.get == 1)

      // anonymous client: the stream is refused before any batch and
      // the refusal is PERMANENT (a retry loop can never fix auth)
      val anon = new ArrowGrpc.ArrowGrpcStreamExporter("localhost", rx.boundPort,
        "logs", numStreams = 1)
      val e = intercept[Pipeline.PermanentExportException] {
        anon.export(logs)
      }
      assert(e.getMessage.contains("grpc-status 16"), e.getMessage)
      assert(rx.obs.batches.get == 1)
      val back = graft.sources.ArrowIpc.readSpool(
        spark, rx.spoolPath("logs"), logs.schema)
      assert(back.count() == 3) // only the authenticated stream's rows
    } finally rx.stop()
  }

  test("configauth blocks build both halves; exporter auth is config-reachable") {
    // client: the three accepted block shapes
    val bearer = Auth.clientFromMap(Map("bearer_token" -> "t1"))
    assert(bearer.headers() == Map("authorization" -> "Bearer t1"))
    val basicCfg = new java.util.HashMap[String, Object]()
    basicCfg.put("username", "u"); basicCfg.put("password", "p")
    val basic = Auth.clientFromMap(Map("basic" -> basicCfg))
    assert(basic.headers()("authorization").startsWith("Basic "))
    val api = Auth.clientFromMap(Map(
      "api_key_header" -> "X-Api-Key", "api_key" -> "k9"))
    assert(api.headers() == Map("x-api-key" -> "k9"))

    // server: bearer_tokens list
    val toks = new java.util.ArrayList[Object]()
    toks.add("a"); toks.add("b")
    val srv = Auth.serverFromMap(Map("bearer_tokens" -> toks))
    assert(srv.authenticate(Map("authorization" -> Seq("Bearer b"))).isRight)
    assert(srv.authenticate(Map("authorization" -> Seq("Bearer c"))).isLeft)
    assert(srv.authenticate(Map.empty).isLeft)

    // an otlp_http exporter with an auth: block parses end-to-end
    val spool = tmpDir("auth_cfg")
    val rx = new OtlpHttpReceiver(0, spool,
      auth = Some(Auth.BearerTokenServer(Set("cfg-tok"))))
    try {
      import spark.implicits._
      val cfg =
        s"""{"pipelines": {"logs/auth": {
           |  "receiver": {"type": "parquet", "path": "IGNORED"},
           |  "exporters": [{"type": "otlp_http",
           |    "endpoint": "http://localhost:${rx.boundPort}",
           |    "signal": "logs",
           |    "auth": {"bearer_token": "cfg-tok"}}]
           |}}}""".stripMargin
      val svc = graft.pipeline.ConfigLoader.fromJson(cfg)
      val exporter = svc.pipelines.values.head.exporters.head
        .asInstanceOf[OtlpHttpExporter]
      assert(exporter.auth.isDefined)
      exporter.export(OtlpJsonSource.parseLogs(
        Seq(mkLogRequest("svc", 2)).toDF("json")))
      assert(rx.obs.requests.get == 1 && rx.obs.denied.get == 0)
    } finally rx.stop()
  }

  test("effectiveConfig: env resolved, opaque credential fields [REDACTED]") {
    val doc = """{
      "pipelines": {"logs/x": {
        "receiver": {"type": "parquet", "path": "${env:DATA_DIR}/logs"},
        "exporters": [
          {"type": "otlp_http", "endpoint": "http://h:1", "signal": "logs",
           "auth": {"bearer_token": "hunter2-secret"}},
          {"type": "otlp_http", "endpoint": "http://h:2", "signal": "logs",
           "auth": {"basic": {"username": "alice", "password": "pw-secret"}}},
          {"type": "otlp_http", "endpoint": "http://h:3", "signal": "logs",
           "auth": {"api_key_header": "X-Api-Key",
                    "api_keys": {"key-secret-1": "tenantA"}}}
        ]}}}"""
    val out = graft.pipeline.ConfigLoader.effectiveConfig(doc,
      env = { case "DATA_DIR" => Some("/data"); case _ => None })
    // env is RESOLVED (the effective config, not the template)
    assert(out.contains("/data/logs") && !out.contains("${env:"))
    // every declared-opaque value is masked; nothing sensitive leaks
    assert(!out.contains("hunter2-secret"))
    assert(!out.contains("pw-secret"))
    assert(!out.contains("key-secret-1"))
    assert(out.contains("[REDACTED]"))
    // non-sensitive structure survives: endpoints, usernames, header
    // names, the api-key header name
    assert(out.contains("http://h:1") && out.contains("alice")
      && out.contains("X-Api-Key"))
  }
}
