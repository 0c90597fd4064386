package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.ConfigLoader

/** Config-declared CONTINUOUS pipelines: a streaming receiver in the
  * same document, started by Service.runStreaming and drained by the
  * CLI's run — the collector's always-on mode, config-reachable. */
class ConfigStreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def mkLogRequest(svc: String, n: Int, base: Int = 0): String = {
    val recs = (0 until n).map { i =>
      s"""{"timeUnixNano":"${1700000000000000000L + base + i}","severityNumber":9,
         |"body":{"stringValue":"m${base + i}"},"attributes":[]}"""
        .stripMargin.replaceAll("\n", "")
    }.mkString(",")
    s"""{"resourceLogs":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"$svc"}}]},
       |"scopeLogs":[{"scope":{"name":"graft"},"logRecords":[$recs]}]}]}"""
      .stripMargin.replaceAll("\n", "")
  }

  test("a stream_json_logs pipeline declared in config drains through the CLI run") {
    val spool = java.nio.file.Files.createTempDirectory("cfg_stream_in")
    val outDir = java.nio.file.Files.createTempDirectory("cfg_stream_out").toString + "/sink"
    // two spooled requests, one JSON document per line
    java.nio.file.Files.write(spool.resolve("r1.json"),
      (mkLogRequest("api", 3) + "\n" + mkLogRequest("web", 2)).getBytes("UTF-8"))

    val cfg = java.nio.file.Files.createTempFile("cfg_stream", ".json")
    java.nio.file.Files.write(cfg,
      s"""{"pipelines": {"logs/stream": {
         |  "receiver": {"type": "stream_json_logs", "path": "$spool",
         |               "maxFilesPerTrigger": 4},
         |  "processors": [{"type": "filter",
         |                  "where": "severity_number >= 9"}],
         |  "exporters": [{"type": "parquet", "path": "$outDir"}]
         |}}}""".stripMargin.getBytes("UTF-8"))

    val bos = new java.io.ByteArrayOutputStream()
    val code = Collector.execute(
      Seq("run", "--config", cfg.toString),
      new java.io.PrintStream(bos, true, "UTF-8"))
    assert(code == 0, bos.toString("UTF-8"))
    assert(bos.toString("UTF-8").contains("drained 1 streaming pipeline(s)"))

    val back = spark.read.parquet(outDir)
    assert(back.count() == 5)
    assert(back.select(countDistinct(
      element_at(col("resource_attributes"), "service.name"))).head.getLong(0) == 2)
  }

  test("confignet datagram parse: aliases, and each family refuses the other's shapes by name") {
    import graft.pipeline.ConfigNet
    assert(ConfigNet.parseDatagram("", null) == ConfigNet.Udp)
    for (a <- Seq("udp", "udp4", "UDP6"))
      assert(ConfigNet.parseDatagram(a, null) == ConfigNet.Udp)
    assert(ConfigNet.parseDatagram("unixgram", "/tmp/x.sock") ==
      ConfigNet.Unixgram("/tmp/x.sock"))
    val needsPath = intercept[IllegalArgumentException] {
      ConfigNet.parseDatagram("unixgram", "")
    }
    assert(needsPath.getMessage.contains("path"))
    // a stream shape on a datagram endpoint names where it belongs
    val cross1 = intercept[IllegalArgumentException] {
      ConfigNet.parseDatagram("tcp", null)
    }
    assert(cross1.getMessage.contains("stream shape"))
    // and a datagram shape on a stream endpoint points at udp_lines
    val cross2 = intercept[IllegalArgumentException] {
      ConfigNet.parse("udp", null)
    }
    assert(cross2.getMessage.contains("udp_lines"))
  }

  test("config-declared udp_lines receiver: datagram lines serve the wire and stream to the sink") {
    import graft.pipeline.ConfigNet
    val spool = java.nio.file.Files.createTempDirectory("cfg_udp_spool").toString
    val sink = java.nio.file.Files.createTempDirectory("cfg_udp_out").toString + "/u"
    val ckpt = java.nio.file.Files.createTempDirectory("cfg_udp_ckpt").toString
    val svc = ConfigLoader.fromJson(
      s"""{"pipelines": {"logs/udp": {
         |  "receiver": {"type": "udp_lines", "port": 0, "spool": "$spool"},
         |  "exporters": [{"type": "parquet", "path": "$sink"}]}}}""".stripMargin)
    val queries = svc.runStreaming(spark, ckpt)
    try {
      val recv = svc.pipelines("logs/udp").receiver
        .asInstanceOf[graft.pipeline.Pipeline.UdpLinesServerReceiver]
      val port = recv.boundPort
      assert(port > 0)
      // CRLF sender with a trailing blank line, and an LF-less sender —
      // both spool normalized content
      ConfigNet.sendDatagram(ConfigNet.Udp, port,
        "alpha 1\r\nbeta 2\r\n\n".getBytes("UTF-8"))
      ConfigNet.sendDatagram(ConfigNet.Udp, port, "gamma 3".getBytes("UTF-8"))
      def rows(): Seq[String] =
        try spark.read.parquet(sink).collect().map(_.getString(0)).toSeq
        catch { case _: Exception => Seq.empty }
      val deadline = System.currentTimeMillis() + 30000
      while (rows().size < 3 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(rows().sorted == Seq("alpha 1", "beta 2", "gamma 3"))
      val c = recv.counters.get
      assert(c("accepted_datagrams") == 2L, c.toString)
      assert(c("accepted_lines") == 3L, c.toString)
      assert(c("truncated_datagrams") == 0L && c("receive_errors") == 0L,
        c.toString)
    } finally {
      queries.values.flatten.foreach(_.stop())
      svc.stopReceivers()
    }
  }

  test("udp_lines keeps (and counts) a buffer-filling datagram instead of dropping it") {
    import graft.pipeline.ConfigNet
    val spool = java.nio.file.Files.createTempDirectory("udp_trunc").toString
    val srv = new graft.sources.UdpLines.Server(ConfigNet.Udp, 0, spool,
      maxDatagramBytes = 8)
    try {
      ConfigNet.sendDatagram(ConfigNet.Udp, srv.boundPort,
        "abcdefghijkl".getBytes("UTF-8"))
      val dir = new java.io.File(spool, "lines")
      def files() = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => !f.getName.startsWith("."))
      val deadline = System.currentTimeMillis() + 10000
      while (files().isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(files().length == 1)
      val content = new String(
        java.nio.file.Files.readAllBytes(files().head.toPath), "UTF-8")
      assert(content == "abcdefgh") // OS-truncated to the buffer, KEPT
      assert(srv.obs.truncated.get == 1L)
    } finally srv.stop()
  }

  test("unixgram: a supporting JDK serves a roundtrip; others refuse loudly at bind") {
    import graft.pipeline.ConfigNet
    val path = java.nio.file.Files.createTempDirectory("unixgram").toString + "/g.sock"
    try {
      val srv = ConfigNet.listenDatagram(ConfigNet.Unixgram(path), 0)
      try {
        ConfigNet.sendDatagram(ConfigNet.Unixgram(path), 0, "x y".getBytes("UTF-8"))
        val buf = new Array[Byte](64)
        val n = srv.receive(buf)
        assert(new String(buf, 0, n, "UTF-8") == "x y")
      } finally srv.close()
    } catch {
      // never a silent downgrade: the refusal names the shape AND the
      // supported alternative
      case e: IllegalArgumentException =>
        assert(e.getMessage.contains("unixgram") && e.getMessage.contains("udp"),
          e.getMessage)
    }
  }

  test("Service.runStreaming starts ONLY the continuous pipelines; batch ones stay for run()") {
    import spark.implicits._
    val spool = java.nio.file.Files.createTempDirectory("api_stream_in")
    java.nio.file.Files.write(spool.resolve("r1.json"),
      mkLogRequest("api", 4).getBytes("UTF-8"))
    val streamOut = java.nio.file.Files.createTempDirectory("api_stream_out").toString + "/s"
    val batchIn = java.nio.file.Files.createTempDirectory("api_batch_in").toString
    val batchOut = java.nio.file.Files.createTempDirectory("api_batch_out").toString + "/b"
    (1 to 3).map(i => (i.toLong, s"x$i")).toDF("id", "v")
      .write.mode("overwrite").parquet(batchIn)

    val svc = ConfigLoader.fromJson(
      s"""{"pipelines": {
         |  "logs/live": {
         |    "receiver": {"type": "stream_json_logs", "path": "$spool"},
         |    "exporters": [{"type": "parquet", "path": "$streamOut"}]},
         |  "logs/batch": {
         |    "receiver": {"type": "parquet", "path": "$batchIn"},
         |    "exporters": [{"type": "parquet", "path": "$batchOut"}]}
         |}}""".stripMargin)

    val ckpt = java.nio.file.Files.createTempDirectory("api_ckpt").toString
    val queries = svc.runStreaming(spark, ckpt)
    try {
      assert(queries.keySet == Set("logs/live"), "batch pipeline must not start a query")
      queries.values.flatten.foreach(_.processAllAvailable())
      assert(spark.read.parquet(streamOut).count() == 4)
      // the batch pipeline still runs the classic way
      svc.pipelines("logs/batch").run(spark)
      assert(spark.read.parquet(batchOut).count() == 3)
    } finally queries.values.flatten.foreach(_.stop())
  }

  test("config-declared LIVE transports: otlp_http and otlp_grpc receivers serve the wire and stream to the sink") {
    import spark.implicits._
    val spoolH = java.nio.file.Files.createTempDirectory("cfg_live_http").toString
    val spoolG = java.nio.file.Files.createTempDirectory("cfg_live_grpc").toString
    val sinkH = java.nio.file.Files.createTempDirectory("cfg_live_outh").toString + "/h"
    val sinkG = java.nio.file.Files.createTempDirectory("cfg_live_outg").toString + "/g"
    val ckpt = java.nio.file.Files.createTempDirectory("cfg_live_ckpt").toString
    val svc = ConfigLoader.fromJson(
      s"""{"pipelines": {
         |"logs/http": {
         |  "receiver": {"type": "otlp_http", "port": 0, "spool": "$spoolH"},
         |  "exporters": [{"type": "parquet", "path": "$sinkH"}]},
         |"logs/grpc": {
         |  "receiver": {"type": "otlp_grpc", "port": 0, "spool": "$spoolG"},
         |  "exporters": [{"type": "parquet", "path": "$sinkG"}]}}}""".stripMargin)
    val queries = svc.runStreaming(spark, ckpt)
    try {
      val httpPort = svc.pipelines("logs/http").receiver
        .asInstanceOf[graft.pipeline.Pipeline.OtlpHttpServerReceiver].boundPort
      val grpcPort = svc.pipelines("logs/grpc").receiver
        .asInstanceOf[graft.pipeline.Pipeline.OtlpGrpcServerReceiver].boundPort
      val logs = graft.sources.OtlpJsonSource.parseLogs(
        Seq(mkLogRequest("api", 4)).toDF("json"))
      graft.sources.OtlpHttp.OtlpHttpExporter(
        s"http://localhost:$httpPort", "logs").export(logs)
      graft.sources.GrpcOtlp.OtlpGrpcExporter(
        "localhost", grpcPort, "logs").export(logs)
      def rows(p: String): Long =
        try spark.read.parquet(p).count() catch { case _: Exception => 0L }
      val deadline = System.currentTimeMillis() + 30000
      while ((rows(sinkH) < 4 || rows(sinkG) < 4) &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(rows(sinkH) == 4, s"http sink rows: ${rows(sinkH)}")
      assert(rows(sinkG) == 4, s"grpc sink rows: ${rows(sinkG)}")
      // wire-identical content through both transports
      val h = spark.read.parquet(sinkH).select("body").collect()
        .map(_.getString(0)).sorted.toSeq
      val g = spark.read.parquet(sinkG).select("body").collect()
        .map(_.getString(0)).sorted.toSeq
      assert(h == g)
    } finally {
      queries.values.flatten.foreach(_.stop())
      svc.stopReceivers()
    }
  }

  test("aggregate processor: declarative tumbling-window aggregation matches the programmatic operator") {
    val sink = java.nio.file.Files.createTempDirectory("agg_out").toString + "/o"
    val svc = ConfigLoader.fromJson(
      s"""{"pipelines": {"metrics/win": {
         |  "receiver": {"type": "table", "dir": "/root/testdata/sf0.001",
         |               "table": "events"},
         |  "processors": [{"type": "aggregate",
         |    "keys": ["event_type", "ts_ns DIV 3600000000000 AS window_start"],
         |    "aggs": [{"fn": "count", "as": "n"},
         |             {"fn": "countDistinct", "expr": "user_id", "as": "users"}]}],
         |  "exporters": [{"type": "parquet", "path": "$sink"}]}}}""".stripMargin)
    svc.run(spark)
    val back = spark.read.parquet(sink)
    val direct = Tables(spark, "/root/testdata/sf0.001", "events")
      .groupBy(col("event_type"),
        org.apache.spark.sql.functions.expr("ts_ns DIV 3600000000000").as("window_start"))
      .agg(org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.count_distinct(col("user_id")).as("users"))
    assert(back.count() == direct.count())
    assert(back.exceptAll(direct).isEmpty && direct.exceptAll(back).isEmpty)
  }

  test("sharedcomponent: identical receiver declarations share ONE instance across pipelines — one server, both sinks fed") {
    import spark.implicits._
    val spool = java.nio.file.Files.createTempDirectory("shared_rx").toString
    val sinkA = java.nio.file.Files.createTempDirectory("shared_a").toString + "/a"
    val sinkB = java.nio.file.Files.createTempDirectory("shared_b").toString + "/b"
    val ckpt = java.nio.file.Files.createTempDirectory("shared_ck").toString
    val svc = ConfigLoader.fromJson(
      s"""{"pipelines": {
         |"logs/a": {
         |  "receiver": {"type": "otlp_http", "port": 0, "spool": "$spool"},
         |  "exporters": [{"type": "parquet", "path": "$sinkA"}]},
         |"logs/b": {
         |  "receiver": {"type": "otlp_http", "port": 0, "spool": "$spool"},
         |  "processors": [{"type": "filter", "where": "severity_number >= 9"}],
         |  "exporters": [{"type": "parquet", "path": "$sinkB"}]}}}""".stripMargin)
    // the sharedcomponent contract: same id ⇒ same INSTANCE
    assert(svc.pipelines("logs/a").receiver eq svc.pipelines("logs/b").receiver)
    val queries = svc.runStreaming(spark, ckpt)
    try {
      val port = svc.pipelines("logs/a").receiver
        .asInstanceOf[graft.pipeline.Pipeline.OtlpHttpServerReceiver].boundPort
      graft.sources.OtlpHttp.OtlpHttpExporter(s"http://localhost:$port", "logs")
        .export(graft.sources.OtlpJsonSource.parseLogs(
          Seq(mkLogRequest("api", 3)).toDF("json")))
      def rows(p: String): Long =
        try spark.read.parquet(p).count() catch { case _: Exception => 0L }
      val deadline = System.currentTimeMillis() + 30000
      while ((rows(sinkA) < 3 || rows(sinkB) < 3) &&
             System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(rows(sinkA) == 3 && rows(sinkB) == 3,
        s"one wire POST must feed both pipelines (a=${rows(sinkA)} b=${rows(sinkB)})")
    } finally {
      queries.values.flatten.foreach(_.stop())
      svc.stopReceivers()
    }
  }

  test("sender-chain config blocks: retry_on_failure + timeout_ms wrap any exporter in reference order; otlp_grpc exporter is config-reachable") {
    // chain shape: retry(timeout(sink)) — visible on the zpages report
    val svc = ConfigLoader.fromJson(
      """{"pipelines": {"logs/x": {
        |  "receiver": {"type": "parquet", "path": "/in"},
        |  "exporters": [{"type": "parquet", "path": "/out",
        |    "timeout_ms": 250,
        |    "retry_on_failure": {"max_retries": 5,
        |      "initial_interval_ms": 10, "max_interval_ms": 100}}]}}}""".stripMargin)
    val z = svc.zpages(spark)
    assert(z.contains("retry(max=5) -> timeout(250ms) -> ParquetExporter"), z)

    // live loopback: a config-declared otlp_grpc exporter delivers to
    // a running gRPC receiver
    import spark.implicits._
    val spool = java.nio.file.Files.createTempDirectory("cfg_grpc_out").toString
    val rx = new graft.sources.GrpcOtlp.OtlpGrpcReceiver(0, spool)
    try {
      val in = java.nio.file.Files.createTempDirectory("cfg_grpc_in").toString + "/in.parquet"
      graft.sources.OtlpJsonSource.parseLogs(
        Seq(mkLogRequest("api", 5)).toDF("json")).write.parquet(in)
      val svc2 = ConfigLoader.fromJson(
        s"""{"pipelines": {"logs/push": {
           |  "receiver": {"type": "parquet", "path": "$in"},
           |  "exporters": [{"type": "otlp_grpc", "port": ${rx.boundPort},
           |                 "signal": "logs"}]}}}""".stripMargin)
      svc2.run(spark)
      val landed = graft.sources.OtlpJsonSource.parseLogsPb(
        spark.read.format("binaryFile").load(s"$spool/logs_pb")
          .select(col("content").as("pb")))
      assert(landed.count() == 5)
    } finally rx.stop()
  }
}
