package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline._
import graft.sources.{OtlpHttp, OtlpJsonSource}

/** Self-telemetry OTLP push (r14 verdict #1, the last reference
  * delta): the periodic metric reader's `exporter: {otlp: ...}`
  * (generated_config.go:142-174) and own-span export via a batch
  * span processor + OTLP exporter (generated_config.go:33-49,
  * 115-139), both wired through the EXISTING otlp client machinery
  * and LIVE-LOOPED through a graft receiver — the collector
  * re-ingesting its own telemetry. */
class SelfTelemetryOtlpSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // ---- config surface ------------------------------------------------

  test("config: periodic otlp reader and batch span processor parse; bad shapes refuse loudly") {
    val svc = ConfigLoader.fromJson(
      """{"service": {"telemetry": {
        |  "metrics": {"readers": [
        |    {"periodic": {"interval": 30000, "exporter": {"otlp": {
        |      "protocol": "http/protobuf",
        |      "endpoint": "https://collector.example:4318",
        |      "headers": {"x-tenant": "graft"},
        |      "compression": "gzip"}}}}]},
        |  "traces": {"processors": [
        |    {"batch": {"schedule_delay": 2000, "max_queue_size": 512,
        |      "max_export_batch_size": 128,
        |      "exporter": {"otlp": {"protocol": "grpc/protobuf",
        |        "endpoint": "collector.example:4317"}}}}]}}},
        |"pipelines": {}}""".stripMargin)
    val reader = svc.telemetryReaders match {
      case Seq(r: Extensions.PeriodicOtlpReader) => r
      case other => fail(s"expected one PeriodicOtlpReader, got $other")
    }
    assert(reader.intervalMs == 30000)
    assert(reader.otlp.protocol == SelfTelemetryOtlp.ProtocolHttp)
    assert(reader.otlp.endpoint == "https://collector.example:4318")
    assert(reader.otlp.headers == Map("x-tenant" -> "graft"))
    assert(reader.otlp.compression == "gzip")
    val proc = svc.telemetrySpanProcessors match {
      case Seq(p) => p
      case other => fail(s"expected one span processor conf, got $other")
    }
    assert(proc.scheduleDelayMs == 2000 && proc.maxQueueSize == 512 &&
      proc.maxExportBatchSize == 128)
    assert(proc.exporter.exists(_.protocol == SelfTelemetryOtlp.ProtocolGrpc))

    // the reference's teeth, one by one
    def refuse(doc: String, needle: String): Unit = {
      val e = intercept[Exception](ConfigLoader.fromJson(doc))
      assert(e.getMessage != null && e.getMessage.contains(needle),
        s"expected '$needle' in: ${e.getMessage}")
    }
    // unsupported protocol (proctelemetry config.go:257)
    refuse("""{"service": {"telemetry": {"metrics": {"readers": [
        |{"periodic": {"exporter": {"otlp": {"protocol": "http/json",
        |  "endpoint": "h:1"}}}}]}}}, "pipelines": {}}""".stripMargin,
      "unsupported protocol")
    // endpoint required (generated unmarshaler)
    refuse("""{"service": {"telemetry": {"metrics": {"readers": [
        |{"periodic": {"exporter": {"otlp": {"protocol": "http/protobuf"}}}}]}}},
        |"pipelines": {}}""".stripMargin,
      "field endpoint in Otlp: required")
    // non-batch span processor (SpanProcessor.Unmarshal config.go:158)
    refuse("""{"service": {"telemetry": {"traces": {"processors": [
        |{"simple": {"exporter": {"console": {}}}}]}}}, "pipelines": {}}""".stripMargin,
      "unsupported span processor type")
    // both exporters on one reader
    refuse("""{"service": {"telemetry": {"metrics": {"readers": [
        |{"periodic": {"exporter": {"console": {}, "otlp": {
        |  "protocol": "http/protobuf", "endpoint": "h:1"}}}}]}}},
        |"pipelines": {}}""".stripMargin,
      "BOTH console and otlp")
    // console periodic readers still parse (the pre-r15 path)
    val consoleSvc = ConfigLoader.fromJson(
      """{"service": {"telemetry": {"metrics": {"readers": [
        |{"periodic": {"interval": 1000, "exporter": {"console": {}}}}]}}},
        |"pipelines": {}}""".stripMargin)
    assert(consoleSvc.telemetryReaders ==
      Seq(Extensions.PeriodicConsoleReader(1000)))
  }

  // ---- metrics push loopback ----------------------------------------

  test("periodic otlp push: healthFrame re-ingests through a graft receiver, families intact") {
    val spool = tmpDir("selftel_metrics")
    val rx = new OtlpHttp.OtlpHttpReceiver(0, spool)
    try {
      val svc = Pipeline.Service(Map.empty,
        telemetryResource = Map("deployment.environment" -> "loopback"))
      val reg = new Obsreport.Registry
      reg.receiverAccepted("otlp_http", "http", "log_records", 42)
      reg.receiverRefused("otlp_http", "http", "log_records", 3)
      reg.exporterSent("parquet", "log_records", 39)
      val push = SelfTelemetryOtlp.OtlpPush(
        SelfTelemetryOtlp.ProtocolHttp, s"localhost:${rx.boundPort}")
      val pusher = new SelfTelemetryOtlp.PeriodicOtlpPusher(
        svc, spark, intervalMs = 3600000L,
        exporter = SelfTelemetryOtlp.metricExporter(push),
        obsreport = () => reg, autoStart = false)
      val t0 = 1700000000000000000L
      val n = pusher.pushOnce(t0)
      assert(n > 0, "push must carry datapoints")

      val back = OtlpJsonSource.parseMetricPointsPb(
        spark.read.format("binaryFile").load(rx.spoolPath("metrics", pb = true))
          .select(col("content").as("pb")))
      val rows = back.collect()
      assert(rows.length == n, "every pushed datapoint must re-ingest")
      val byName = rows.groupBy(_.getAs[String]("metric_name"))
      // the obsreport catalog survives the wire with dims and values
      val acc = byName("otelcol_receiver_accepted_log_records").head
      assert(acc.getAs[Double]("value") == 42.0)
      assert(acc.getAs[Map[String, String]]("attributes")("receiver") == "otlp_http")
      assert(acc.getAs[String]("metric_type") == "sum")
      assert(byName("otelcol_exporter_sent_log_records").head
        .getAs[Double]("value") == 39.0)
      // process self-metrics ride the push (a production backend
      // expects otelcol_process_*)
      assert(byName.contains("otelcol_process_uptime"))
      // resource: service.name + the configured override, on EVERY point
      rows.foreach { r =>
        val res = r.getAs[Map[String, String]]("resource_attributes")
        assert(res(graft.model.SemConv.AttributeServiceName) == "graft-collector")
        assert(res("deployment.environment") == "loopback")
      }
      // the reader's clock stamps the points
      assert(rows.forall(_.getAs[Long]("time_unix_nano") == t0))
      // level none pushes nothing (the healthFrame gate)
      val none = Pipeline.Service(Map.empty,
        telemetryLevel = Extensions.LevelNone)
      val nonePusher = new SelfTelemetryOtlp.PeriodicOtlpPusher(
        none, spark, 3600000L,
        SelfTelemetryOtlp.metricExporter(push), autoStart = false)
      assert(nonePusher.pushOnce() == 0)
    } finally rx.stop()
  }

  // ---- span batch processor loopback --------------------------------

  test("batch span processor: span tree round-trips; the SAMPLER gates what exports") {
    val spool = tmpDir("selftel_spans")
    val rx = new OtlpHttp.OtlpHttpReceiver(0, spool)
    try {
      val exporter = SelfTelemetryOtlp.spanExporter(SelfTelemetryOtlp.OtlpPush(
        SelfTelemetryOtlp.ProtocolHttp, s"http://localhost:${rx.boundPort}"))
      val bsp = new SelfTelemetryOtlp.BatchSpanProcessor(spark, exporter,
        resource = Map("svc.instance" -> "loop"), autoStart = false)
      val tracer = new SelfTrace.Tracer(SelfTrace.AlwaysOn,
        processors = Seq(bsp))
      val root = tracer.start("pipeline/logs/x")
      val t0 = tracer.nowNano()
      tracer.record("receiver/otlp_http", root.ref, t0, t0 + 1000)
      tracer.record("exporter/parquet", root.ref, t0 + 1000, t0 + 3000,
        error = Some("disk full"))
      root.end()
      assert(bsp.queued == 3)
      assert(bsp.flushOnce() == 3)

      val back = OtlpJsonSource.parseSpansPb(
        spark.read.format("binaryFile").load(rx.spoolPath("traces", pb = true))
          .select(col("content").as("pb"))).collect()
      assert(back.length == 3)
      // one trace, children hang off the root — the span TREE survives
      assert(back.map(_.getAs[String]("trace_id")).distinct.length == 1)
      val byName = back.map(r => r.getAs[String]("name") -> r).toMap
      val rootRow = byName("pipeline/logs/x")
      assert(rootRow.getAs[String]("parent_span_id") == null ||
        rootRow.getAs[String]("parent_span_id").isEmpty)
      Seq("receiver/otlp_http", "exporter/parquet").foreach { n =>
        assert(byName(n).getAs[String]("parent_span_id") ==
          rootRow.getAs[String]("span_id"), s"$n must parent on the root")
      }
      // status: the failed exporter reads ERROR(2) + message
      assert(byName("exporter/parquet").getAs[Int]("status_code") == 2)
      assert(byName("exporter/parquet").getAs[String]("status_message") == "disk full")
      assert(byName("receiver/otlp_http").getAs[Int]("status_code") == 0)
      back.foreach { r =>
        val res = r.getAs[Map[String, String]]("resource_attributes")
        assert(res(graft.model.SemConv.AttributeServiceName) == "graft-collector")
        assert(res("svc.instance") == "loop")
      }

      // sampler gating (telemetry.go:46-50 order; otel-go BSP OnEnd
      // drops unsampled): the DEFAULT record-only mode keeps spans
      // tracez-visible but exports NOTHING
      val bsp2 = new SelfTelemetryOtlp.BatchSpanProcessor(spark, exporter,
        autoStart = false)
      val recTracer = new SelfTrace.Tracer(SelfTrace.DefaultAlwaysRecord,
        processors = Seq(bsp2))
      recTracer.start("pipeline/rec").end()
      assert(recTracer.snapshot.exists(_.name == "pipeline/rec"),
        "record-only spans must stay tracez-visible")
      assert(bsp2.queued == 0 && bsp2.flushOnce() == 0,
        "record-only spans must NOT export")
      // always_off records nothing anywhere
      val offTracer = new SelfTrace.Tracer(SelfTrace.AlwaysOff,
        processors = Seq(bsp2))
      offTracer.start("pipeline/off").end()
      assert(offTracer.snapshot.isEmpty && bsp2.queued == 0)
    } finally rx.stop()
  }

  test("batch span processor: bounded queue drops NEW spans when full (SDK lossy contract)") {
    val sink = new java.util.concurrent.atomic.AtomicInteger
    val countingExporter = new Pipeline.Exporter {
      def export(df: org.apache.spark.sql.DataFrame): Unit =
        sink.addAndGet(df.count().toInt)
    }
    val bsp = new SelfTelemetryOtlp.BatchSpanProcessor(spark,
      countingExporter, maxQueueSize = 4, maxExportBatchSize = 2,
      autoStart = false)
    val tracer = new SelfTrace.Tracer(SelfTrace.AlwaysOn,
      processors = Seq(bsp))
    (1 to 10).foreach(i => tracer.start(s"s$i").end())
    assert(bsp.queued == 4, "queue holds its bound")
    assert(bsp.dropped == 6, "overflow drops the NEW span, counted")
    // flush drains in maxExportBatchSize chunks until dry
    assert(bsp.flushOnce() == 4)
    assert(sink.get == 4 && bsp.queued == 0)
    // shutdown flushes what arrived after the last flush
    tracer.start("late").end()
    bsp.shutdown()
    assert(sink.get == 5)
  }

  test("batch log processor: admitted records round-trip; level gate and sampler sit before export") {
    val spool = tmpDir("selftel_logs")
    val rx = new OtlpHttp.OtlpHttpReceiver(0, spool)
    try {
      val exporter = SelfTelemetryOtlp.logExporter(SelfTelemetryOtlp.OtlpPush(
        SelfTelemetryOtlp.ProtocolHttp, s"http://localhost:${rx.boundPort}"))
      val blp = new SelfTelemetryOtlp.BatchLogProcessor(spark, exporter,
        resource = Map("run.kind" -> "spec"),
        attributes = Map("component" -> "collector"), autoStart = false)
      val logger = new ServiceLogger(
        ServiceLogger.LogsConfig(level = "info",
          outputPaths = Seq("stderr"),
          initialFields = Map("component" -> "collector")),
        processors = Seq(blp))
      logger.debug("below the gate")   // level info: filtered
      logger.info("pipeline started")
      logger.error("exporter failed: disk full")
      assert(blp.queued == 2, "the level gate must sit BEFORE the processor")
      assert(blp.flushOnce() == 2)

      val back = OtlpJsonSource.parseLogsPb(
        spark.read.format("binaryFile").load(rx.spoolPath("logs", pb = true))
          .select(col("content").as("pb"))).collect()
      assert(back.length == 2)
      val byBody = back.map(r => r.getAs[String]("body") -> r).toMap
      assert(byBody.keySet == Set("pipeline started", "exporter failed: disk full"))
      // plog severity mapping for the zap level set
      assert(byBody("pipeline started").getAs[Int]("severity_number") == 9 &&
        byBody("pipeline started").getAs[String]("severity_text") == "INFO")
      assert(byBody("exporter failed: disk full").getAs[Int]("severity_number") == 17)
      back.foreach { r =>
        val res = r.getAs[Map[String, String]]("resource_attributes")
        assert(res(graft.model.SemConv.AttributeServiceName) == "graft-collector")
        assert(res("run.kind") == "spec")
        // initial_fields stamp as record attributes
        assert(r.getAs[Map[String, String]]("attributes")("component") == "collector")
      }
    } finally rx.stop()
  }

  // ---- the live CLI loopback ----------------------------------------

  test("CLI run: the service pushes its OWN run telemetry through a graft receiver (live loopback)") {
    // pre-pick a port so the config can name the endpoint the spec's
    // receiver will bind
    val port = {
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort finally s.close()
    }
    val spool = tmpDir("selftel_cli")
    val rx = new OtlpHttp.OtlpHttpReceiver(port, spool)
    try {
      import spark.implicits._
      val in = tmpDir("selftel_in") + "/in"
      Seq(("a", 1L), ("b", 2L)).toDF("body", "time_unix_nano")
        .write.parquet(in)
      val out = tmpDir("selftel_out") + "/out"
      val cfg = java.nio.file.Files.createTempFile("selftel_", ".json")
      java.nio.file.Files.write(cfg,
        s"""{"service": {"telemetry": {
           |  "resource": {"run.id": "loop15"},
           |  "metrics": {"readers": [
           |    {"periodic": {"interval": 3600000, "exporter": {"otlp": {
           |      "protocol": "http/protobuf",
           |      "endpoint": "http://localhost:$port"}}}}]},
           |  "traces": {
           |    "sampler": {"always_on": {}},
           |    "processors": [{"batch": {"schedule_delay": 3600000,
           |      "exporter": {"otlp": {"protocol": "http/protobuf",
           |        "endpoint": "http://localhost:$port"}}}}]},
           |  "logs": {"level": "info", "output_paths": ["stderr"],
           |    "processors": [{"batch": {"schedule_delay": 3600000,
           |      "exporter": {"otlp": {"protocol": "http/protobuf",
           |        "endpoint": "http://localhost:$port"}}}}]}}},
           |"pipelines": {"logs/loop": {
           |  "receiver": {"type": "parquet", "path": "$in"},
           |  "exporters": [{"type": "parquet", "path": "$out"}]}}}"""
          .stripMargin.getBytes("UTF-8"))
      val bos = new java.io.ByteArrayOutputStream()
      val ps = new java.io.PrintStream(bos, true, "UTF-8")
      // intervals are 1 h: everything that lands in the spool is the
      // SHUTDOWN flush (periodic reader Shutdown export + batch span
      // processor final flush) — deterministic, no sleeps
      val code = Collector.execute(Seq("run", "--config", cfg.toString), ps)
      assert(code == 0, bos.toString("UTF-8"))
      assert(spark.read.parquet(out).count() == 2)

      // re-ingest the collector's OWN metrics: the obsreport catalog
      // of the run that just happened
      val points = OtlpJsonSource.parseMetricPointsPb(
        spark.read.format("binaryFile").load(rx.spoolPath("metrics", pb = true))
          .select(col("content").as("pb"))).collect()
      val byName = points.groupBy(_.getAs[String]("metric_name"))
      val accepted = byName.get("otelcol_receiver_accepted_log_records")
        .getOrElse(fail(s"no accepted family; got ${byName.keys}"))
      assert(accepted.exists(_.getAs[Double]("value") == 2.0),
        "the run ingested 2 log records and its own telemetry must say so")
      assert(byName("otelcol_exporter_sent_log_records")
        .exists(_.getAs[Double]("value") == 2.0))
      assert(points.forall(_.getAs[Map[String, String]]("resource_attributes")
        .get("run.id").contains("loop15")))

      // re-ingest the collector's OWN spans: the pipeline run tree
      val spans = OtlpJsonSource.parseSpansPb(
        spark.read.format("binaryFile").load(rx.spoolPath("traces", pb = true))
          .select(col("content").as("pb"))).collect()
      val names = spans.map(_.getAs[String]("name")).toSet
      assert(names.contains("pipeline/logs/loop"), s"got $names")
      assert(names.exists(_.startsWith("exporter/")), s"got $names")
      val rootSpan = spans.find(_.getAs[String]("name") == "pipeline/logs/loop").get
      val children = spans.filter(s =>
        Option(s.getAs[String]("parent_span_id")).exists(_.nonEmpty))
      assert(children.nonEmpty)
      children.foreach { c =>
        assert(c.getAs[String]("trace_id") == rootSpan.getAs[String]("trace_id"),
          "children ride the root's trace")
      }

      // re-ingest the collector's OWN log records: the lifecycle
      // lines of the run that just happened — the THIRD signal
      val logs = OtlpJsonSource.parseLogsPb(
        spark.read.format("binaryFile").load(rx.spoolPath("logs", pb = true))
          .select(col("content").as("pb"))).collect()
      val bodies = logs.map(_.getAs[String]("body"))
      // the CLOSING record must export too — it logs inside the
      // data-path bracket, before the log processors' final flush
      // (review-wave finding: a record emitted after their shutdown
      // silently vanished from the exported stream)
      assert(bodies.exists(_.contains("ran 1 pipeline(s)")),
        s"closing record missing; got ${bodies.toSeq}")
      assert(bodies.exists(_.startsWith("started")), s"got ${bodies.toSeq}")
      assert(logs.forall(_.getAs[Int]("severity_number") == 9),
        "lifecycle messages are info-level")
      assert(logs.forall(_.getAs[Map[String, String]]("resource_attributes")
        .get("run.id").contains("loop15")))
    } finally rx.stop()
  }

  test("plain-run default logger: a logs block carrying ONLY processors exports the run's records (r15 verdict #4)") {
    // the reference's service builds its zap logger UNCONDITIONALLY
    // with production defaults (telemetry.go newLogger); graft now
    // does too, so a `logs:` block with NO zap knobs — just
    // `processors:` — means "default logger + export what it admits".
    // Before this round the logger existed only when the block
    // carried configuration, and a plain run had nothing for the
    // processor seam to observe.
    val port = {
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort finally s.close()
    }
    val spool = tmpDir("selftel_plain")
    val rx = new OtlpHttp.OtlpHttpReceiver(port, spool)
    try {
      import spark.implicits._
      val in = tmpDir("selftel_plain_in") + "/in"
      Seq(("x", 7L)).toDF("body", "time_unix_nano").write.parquet(in)
      val out = tmpDir("selftel_plain_out") + "/out"
      val cfg = java.nio.file.Files.createTempFile("selftel_plain_", ".json")
      java.nio.file.Files.write(cfg,
        s"""{"service": {"telemetry": {
           |  "logs": {"processors": [{"batch": {"schedule_delay": 3600000,
           |    "exporter": {"otlp": {"protocol": "http/protobuf",
           |      "endpoint": "http://localhost:$port"}}}}]}}},
           |"pipelines": {"logs/plain": {
           |  "receiver": {"type": "parquet", "path": "$in"},
           |  "exporters": [{"type": "parquet", "path": "$out"}]}}}"""
          .stripMargin.getBytes("UTF-8"))
      val bos = new java.io.ByteArrayOutputStream()
      val ps = new java.io.PrintStream(bos, true, "UTF-8")
      val code = Collector.execute(Seq("run", "--config", cfg.toString), ps)
      assert(code == 0, bos.toString("UTF-8"))
      val logs = OtlpJsonSource.parseLogsPb(
        spark.read.format("binaryFile").load(rx.spoolPath("logs", pb = true))
          .select(col("content").as("pb"))).collect()
      val bodies = logs.map(_.getAs[String]("body"))
      assert(bodies.exists(_.contains("ran 1 pipeline(s)")),
        s"closing record missing; got ${bodies.toSeq}")
      // defaults: info level, no initial fields — severity rides
      // the default logger's gate
      assert(logs.forall(_.getAs[Int]("severity_number") == 9))
    } finally rx.stop()
  }

  test("a run with NO telemetry block still runs clean under the default logger") {
    import spark.implicits._
    val in = tmpDir("plainrun_in") + "/in"
    Seq(("y", 9L)).toDF("body", "time_unix_nano").write.parquet(in)
    val out = tmpDir("plainrun_out") + "/out"
    val cfg = java.nio.file.Files.createTempFile("plainrun_", ".json")
    java.nio.file.Files.write(cfg,
      s"""{"pipelines": {"logs/plain": {
         |  "receiver": {"type": "parquet", "path": "$in"},
         |  "exporters": [{"type": "parquet", "path": "$out"}]}}}"""
        .stripMargin.getBytes("UTF-8"))
    val bos = new java.io.ByteArrayOutputStream()
    val ps = new java.io.PrintStream(bos, true, "UTF-8")
    val code = Collector.execute(Seq("run", "--config", cfg.toString), ps)
    assert(code == 0, bos.toString("UTF-8"))
    assert(spark.read.parquet(out).count() == 1)
    // the CLI stdout contract is unchanged: the closing record still
    // prints to `out` (the default logger's copy goes to stderr)
    assert(bos.toString("UTF-8").contains("ran 1 pipeline(s)"))
  }
}
