package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Self-telemetry OTLP PUSH — the service exporting its OWN metrics
  * and spans to a remote OTLP endpoint, the reference's
  * `service::telemetry::metrics::readers: [{periodic: {exporter:
  * {otlp: ...}}}]` (service/telemetry/generated_config.go:142-174
  * `OtlpMetric`; service/internal/proctelemetry/config.go:236-265
  * initPeriodicExporter) and `service::telemetry::traces::processors:
  * [{batch: {exporter: {otlp: ...}}}]` (generated_config.go:33-49
  * BatchSpanProcessor, :390-396 SpanExporter, :115-139 Otlp).
  *
  * Spark-first adaptation: both signals ride the EXISTING exporter
  * machinery — the periodic reader pushes the same
  * [[Pipeline.Service.healthFrame]] the Prometheus endpoint serves
  * (metricPointSchema rows → [[graft.sources.OtlpHttp.OtlpHttpExporter]]
  * / [[graft.sources.GrpcOtlp.OtlpGrpcExporter]] with signal
  * "metrics"), and span export is a real SDK-shaped batch processor
  * over [[SelfTrace]]'s onEnd hook whose flush converts the buffered
  * spans to spanSchema rows for the same exporters with signal
  * "traces". The configured [[SelfTrace.Sampler]] gates what leaves
  * the process (telemetry.go:46-50 sampler-before-processor order;
  * otel-go batch_span_processor.go OnEnd drops unsampled spans).
  */
object SelfTelemetryOtlp {

  /** proctelemetry/config.go:46-47: the two supported transports.
    * This reference snapshot names them `http/protobuf` and
    * `grpc/protobuf`; anything else refuses with the reference's
    * "unsupported protocol" (config.go:257-258). */
  val ProtocolHttp = "http/protobuf"
  val ProtocolGrpc = "grpc/protobuf"

  /** One OTLP push target (generated_config.go Otlp/OtlpMetric:
    * endpoint + protocol required; headers/compression/timeout
    * optional; the TLS certificate trio maps onto the existing
    * configtls client block). */
  final case class OtlpPush(
      protocol: String,
      endpoint: String,
      headers: Map[String, String] = Map.empty,
      compression: String = "",
      timeoutMs: Option[Long] = None,
      tls: Option[graft.sources.TlsConfig] = None) {
    require(protocol == ProtocolHttp || protocol == ProtocolGrpc,
      s"unsupported protocol $protocol " +
        s"($ProtocolHttp|$ProtocolGrpc)") // proctelemetry config.go:257
    // a zero/negative timeout would only surface at export time
    // inside a swallowed NonFatal catch — refuse loudly at parse,
    // the repo's sibling-knob discipline (review-wave finding)
    timeoutMs.foreach(t => require(t > 0,
      s"otlp exporter timeout must be positive, got $t"))
    // otlpmetrichttp accepts gzip|none only (config.go:323-331);
    // grpc passes the compressor through (gzip in practice — graft's
    // grpc codec set adds snappy/zstd, which configgrpc also knows)
    if (protocol == ProtocolHttp)
      require(compression.isEmpty || compression == "gzip" || compression == "none",
        s"unsupported compression \"$compression\" (gzip|none)")
    // the grpc transport constraints refuse AT PARSE like every
    // sibling knob — a misconfigured push must fail at config load,
    // not mid-startup after log processors/extensions already run
    // (ADVICE r15): graft's gRPC client does not model the SDK's
    // WithHeaders (headers are a confighttp surface here), and
    // otlpmetricgrpc.WithEndpoint needs an explicit host:port
    if (protocol == ProtocolGrpc) {
      require(headers.isEmpty,
        "grpc/protobuf self-telemetry push does not carry custom " +
          "headers — use http/protobuf for header-authenticated backends")
      require(java.net.URI.create(normalizeEndpoint(endpoint)).getPort > 0,
        s"grpc endpoint '$endpoint' carries no port")
    }
  }

  /** normalizeEndpoint (proctelemetry/config.go:268-273): a bare
    * host:port gets an http:// scheme so URI parsing works; https
    * stays https (the TLS path). */
  def normalizeEndpoint(e: String): String =
    if (e.startsWith("http://") || e.startsWith("https://")) e
    else s"http://$e"

  /** build the metrics-signal exporter for a push target — the
    * existing otlp_http / otlp_grpc client machinery, never a new
    * transport */
  def metricExporter(p: OtlpPush): Pipeline.Exporter = exporterFor(p, "metrics")

  /** build the traces-signal exporter for a push target */
  def spanExporter(p: OtlpPush): Pipeline.Exporter = exporterFor(p, "traces")

  /** build the logs-signal exporter for a push target */
  def logExporter(p: OtlpPush): Pipeline.Exporter = exporterFor(p, "logs")

  private def exporterFor(p: OtlpPush, signal: String): Pipeline.Exporter = {
    val uri = java.net.URI.create(normalizeEndpoint(p.endpoint))
    // an https:// scheme means TLS even without the certificate trio
    // (the reference derives security from the scheme — proctelemetry
    // config.go adds WithInsecure only for http; a public-CA backend
    // configures no certs and must still get a TLS client with JDK
    // default trust, not a plaintext dial the handshake rejects)
    val tls = p.tls.orElse(
      if (uri.getScheme == "https") Some(graft.sources.Tls.fromMap(Map.empty))
      else None)
    p.protocol match {
      case ProtocolHttp =>
        val base = s"${uri.getScheme}://${uri.getAuthority}"
        graft.sources.OtlpHttp.OtlpHttpExporter(
          endpoint = base, signal = signal,
          compression = if (p.compression == "none") "" else p.compression,
          headers = p.headers,
          // WithURLPath (config.go:316-318): an endpoint path replaces
          // the default /v1/<signal>
          pathOverride = Option(uri.getPath).filter(s => s.nonEmpty && s != "/")
            .getOrElse(""),
          readTimeoutMs = p.timeoutMs.map(_.toInt).getOrElse(30000),
          tls = tls)
      case ProtocolGrpc =>
        // otlpmetricgrpc.WithEndpoint takes host:port (config.go:283).
        // headers-refused and port-required are OtlpPush CONSTRUCTOR
        // invariants (refuse-at-parse) — every value reaching here
        // already satisfies them.
        val port = uri.getPort
        graft.sources.GrpcOtlp.OtlpGrpcExporter(
          host = uri.getHost, port = port, signal = signal,
          compression = if (p.compression == "none") "" else p.compression,
          readTimeoutMs = p.timeoutMs.map(_.toInt).getOrElse(30000),
          tls = tls)
    }
  }

  // ---- span frame ---------------------------------------------------

  /** ended self-trace spans → OtelModel.spanSchema rows, the frame
    * shape every OTLP trace surface in graft speaks. kind is
    * SPAN_KIND_INTERNAL (the SDK default for in-process work);
    * status maps error→ERROR(2)+message, clean→UNSET(0). */
  def spansFrame(spark: SparkSession, spans: Seq[SelfTrace.Span],
                 resource: Map[String, String]): DataFrame = {
    val res = Map(graft.model.SemConv.AttributeServiceName ->
      "graft-collector") ++ resource
    val rows = spans.map { s =>
      Row(s.traceId, s.spanId, null, s.parentSpanId.orNull, s.name,
        1 /* INTERNAL */, s.startUnixNano, s.endUnixNano,
        if (s.error.isDefined) 2 else 0, s.error.orNull,
        s.attrs, null, null, null, res, "graft")
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      graft.model.OtelModel.spanSchema)
  }

  /** the `exporter: {console: {}}` span exporter (stdouttrace
    * analog): one JSON line per span document. Injectable stream so
    * specs capture deterministically. */
  final class ConsoleSpanExporter(out: java.io.PrintStream = System.out)
      extends Pipeline.Exporter {
    def export(df: DataFrame): Unit = {
      df.toJSON.collect().foreach(out.println)
      out.flush()
    }
  }

  // ---- batch export processors (spans + logs) -----------------------

  /** The ONE bounded-queue batch export driver behind the span AND
    * log processors (SDK BatchSpanProcessor / BatchLogRecordProcessor
    * share this machinery in otel-go too): bounded queue
    * (maxQueueSize, drop-new-when-full — the SDK's lossy contract; a
    * pipeline must never block on its own telemetry), a daemon drains
    * every scheduleDelayMs or as soon as maxExportBatchSize items
    * buffer, each flush exports ≤ maxExportBatchSize items per
    * request. Defaults are the SDK's (2048 / 5000 ms / 512). */
  sealed abstract class BatchExportProcessor[T](
      exporter: Pipeline.Exporter,
      maxQueueSize: Int,
      scheduleDelayMs: Long,
      maxExportBatchSize: Int,
      threadName: String,
      autoStart: Boolean) {
    require(maxQueueSize > 0 && maxExportBatchSize > 0 && scheduleDelayMs > 0,
      "batch processor sizes/delay must be positive")
    protected def toFrame(items: Seq[T]): DataFrame
    private val queue =
      new java.util.concurrent.LinkedBlockingQueue[T](maxQueueSize)
    private val droppedCount = new java.util.concurrent.atomic.AtomicLong
    @volatile protected var running = true

    protected final def offer(item: T): Unit = {
      if (!running) return
      if (!queue.offer(item)) droppedCount.incrementAndGet()
      else if (queue.size() >= maxExportBatchSize) wake()
    }

    def dropped: Long = droppedCount.get()
    def queued: Int = queue.size()

    private val lock = new Object
    private def wake(): Unit = lock.synchronized { lock.notifyAll() }

    /** drain + export everything currently buffered; returns items
      * exported. Synchronous — the testable kernel, also ForceFlush. */
    final def flushOnce(): Int = this.synchronized {
      var total = 0
      var batch = drain()
      while (batch.nonEmpty) {
        exporter.export(toFrame(batch))
        total += batch.length
        batch = drain()
      }
      total
    }

    private def drain(): Seq[T] = {
      val buf = new java.util.ArrayList[T](maxExportBatchSize)
      queue.drainTo(buf, maxExportBatchSize)
      scala.jdk.CollectionConverters.ListHasAsScala(buf).asScala.toSeq
    }

    private val t = new Thread(() => {
      while (running) {
        lock.synchronized { lock.wait(scheduleDelayMs) }
        if (running)
          try flushOnce()
          catch { case scala.util.control.NonFatal(_) => () }
      }
    }, threadName)
    t.setDaemon(true)
    if (autoStart) t.start()

    /** start the flush daemon when constructed with autoStart=false —
      * the leak-safe two-phase path: realize everything first (any
      * construction throw leaks nothing), then start inside the
      * caller's shutdown bracket. No-op once started — synchronized,
      * because a bare check-then-act would let two concurrent
      * callers both see NEW and the loser's t.start() throw
      * IllegalThreadStateException (review-wave finding; this is
      * public API for embedding hosts, not just the CLI's
      * single-threaded startup). */
    final def start(): Unit = synchronized {
      if (t.getState == Thread.State.NEW) t.start()
    }

    /** SDK Shutdown: stop the loop, then one final flush so buffered
      * items are not lost on an orderly exit (idempotent) */
    protected final def stopAndFlush(): Unit = {
      running = false
      wake()
      try flushOnce()
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  /** sdktrace.BatchSpanProcessor over the [[SelfTrace.SpanProcessor]]
    * seam. Only SAMPLED spans enter the queue (batch_span_processor.go
    * OnEnd) — the configured sampler mode is therefore the knob that
    * governs what leaves the process. */
  final class BatchSpanProcessor(
      spark: SparkSession,
      exporter: Pipeline.Exporter,
      resource: Map[String, String] = Map.empty,
      maxQueueSize: Int = 2048,
      scheduleDelayMs: Long = 5000L,
      maxExportBatchSize: Int = 512,
      autoStart: Boolean = true)
      extends BatchExportProcessor[SelfTrace.Span](exporter,
        maxQueueSize, scheduleDelayMs, maxExportBatchSize,
        "graft-batch-span-processor", autoStart)
      with SelfTrace.SpanProcessor {
    protected def toFrame(items: Seq[SelfTrace.Span]): DataFrame =
      spansFrame(spark, items, resource)
    def onEnd(span: SelfTrace.Span, sampled: Boolean): Unit =
      if (sampled) offer(span)
    override def forceFlush(): Unit = flushOnce()
    override def shutdown(): Unit = stopAndFlush()
  }

  /** one admitted self-log record, the queue element of the log
    * processor */
  final case class LogRec(tsMs: Long, level: String, msg: String)

  /** sdklog BatchLogRecordProcessor over the
    * [[ServiceLogger.LogProcessor]] seam — the THIRD self-telemetry
    * signal (generated_config.go:57-76 LogRecordProcessor/
    * LogRecordExporter; the reference's generated schema declares it
    * even though its own service wires only zap — graft wires it the
    * way the traces side is wired). Processors sit AFTER the level
    * gate and zap sampler, so what exports is what the sinks see. */
  final class BatchLogProcessor(
      spark: SparkSession,
      exporter: Pipeline.Exporter,
      resource: Map[String, String] = Map.empty,
      attributes: Map[String, String] = Map.empty,
      maxQueueSize: Int = 2048,
      scheduleDelayMs: Long = 5000L,
      maxExportBatchSize: Int = 512,
      autoStart: Boolean = true)
      extends BatchExportProcessor[LogRec](exporter,
        maxQueueSize, scheduleDelayMs, maxExportBatchSize,
        "graft-batch-log-processor", autoStart)
      with ServiceLogger.LogProcessor {
    protected def toFrame(items: Seq[LogRec]): DataFrame =
      logsFrame(spark, items, resource, attributes)
    def onLog(tsMs: Long, level: String, msg: String): Unit =
      offer(LogRec(tsMs, level, msg))
    override def forceFlush(): Unit = flushOnce()
    override def shutdown(): Unit = stopAndFlush()
  }

  /** admitted self-log records → OtelModel.logSchema rows: plog
    * severity numbers for the zap level set, the logger's
    * initial_fields as record attributes, the telemetry resource on
    * every record. */
  def logsFrame(spark: SparkSession, recs: Seq[LogRec],
                resource: Map[String, String],
                attributes: Map[String, String] = Map.empty): DataFrame = {
    val res = Map(graft.model.SemConv.AttributeServiceName ->
      "graft-collector") ++ resource
    val rows = recs.map { r =>
      val ns = r.tsMs * 1000000L
      Row(ns, ns, ServiceLogger.SeverityNumbers.getOrElse(r.level, 9),
        r.level.toUpperCase, r.msg,
        if (attributes.isEmpty) null else attributes,
        0, 0, null, null, res, "graft")
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava),
      graft.model.OtelModel.logSchema)
  }

  // ---- periodic OTLP metric pusher -----------------------------------

  /** The `periodic: {exporter: {otlp: ...}}` metric reader
    * (sdkmetric.NewPeriodicReader over an OTLP exporter,
    * proctelemetry/config.go:249-264): every intervalMs the service's
    * OWN metrics — the same healthFrame the Prometheus endpoint and
    * console writer serve, same level gate, same views — push as one
    * ExportMetricsServiceRequest to the configured endpoint.
    * pushOnce is the testable kernel the loop drives; stop() does a
    * final push (the SDK reader's Shutdown exports once more). */
  final class PeriodicOtlpPusher(
      service: Pipeline.Service,
      spark: SparkSession,
      intervalMs: Long,
      exporter: Pipeline.Exporter,
      obs: () => Map[String, Pipeline.QueueObs] = () => Map.empty,
      transports: () => Map[String, Map[String, Long]] = () => Map.empty,
      obsreport: () => Obsreport.Registry = () => null,
      processMetrics: Boolean = true,
      autoStart: Boolean = true)
      extends PeriodicHealthLoop(service, spark, intervalMs,
        obs, transports, obsreport, processMetrics,
        // sleep before the first push (a fresh service has nothing
        // to say); ONE final export inside stop() — the SDK periodic
        // reader's Shutdown contract
        immediateFirst = false, finalOnStop = true,
        threadName = "graft-periodic-otlp-metrics", autoStart = autoStart) {

    private val pushedCount = new java.util.concurrent.atomic.AtomicLong

    protected def sink(frame: org.apache.spark.sql.DataFrame): Int = {
      val n = frame.count().toInt
      if (n > 0) exporter.export(frame)
      pushedCount.addAndGet(n.toLong)
      n
    }

    /** one export pass; returns datapoints pushed (0 at level none) */
    def pushOnce(timeUnixNano: Long = System.currentTimeMillis() * 1000000L): Int =
      passOnce(timeUnixNano)

    def pushed: Long = pushedCount.get()
  }

  // ---- config shapes -------------------------------------------------

  /** one `traces::processors` entry, parsed but not yet realized
    * (realization needs the SparkSession + resource — Collector's
    * job). exporter: Left(()) = console, Right(push) = otlp. */
  final case class SpanProcessorConf(
      exporter: Either[Unit, OtlpPush],
      scheduleDelayMs: Long = 5000L,
      maxQueueSize: Int = 2048,
      maxExportBatchSize: Int = 512,
      exportTimeoutMs: Option[Long] = None) {
    exportTimeoutMs.foreach(t => require(t > 0,
      s"batch span processor export_timeout must be positive, got $t"))
    def realize(spark: SparkSession, resource: Map[String, String],
                out: java.io.PrintStream = System.out,
                autoStart: Boolean = true): BatchSpanProcessor = {
      val exp = exporter match {
        case Left(())    => new ConsoleSpanExporter(out)
        case Right(push) =>
          // export_timeout bounds one flush attempt — the OTLP client's
          // read timeout is the faithful carrier
          spanExporter(push.copy(timeoutMs =
            exportTimeoutMs.orElse(push.timeoutMs)))
      }
      new BatchSpanProcessor(spark, exp, resource,
        maxQueueSize = maxQueueSize, scheduleDelayMs = scheduleDelayMs,
        maxExportBatchSize = maxExportBatchSize, autoStart = autoStart)
    }

    /** the SAME conf shape realizes a `logs::processors` entry
      * (BatchLogRecordProcessor fields are identical to the span
      * one's — generated_config.go:11-31 vs :33-49); `attributes` =
      * the logger's initial_fields, stamped per record */
    def realizeLogs(spark: SparkSession, resource: Map[String, String],
                    attributes: Map[String, String],
                    out: java.io.PrintStream = System.out,
                    autoStart: Boolean = true): BatchLogProcessor = {
      val exp = exporter match {
        case Left(())    => new ConsoleSpanExporter(out) // toJSON lines
        case Right(push) =>
          logExporter(push.copy(timeoutMs =
            exportTimeoutMs.orElse(push.timeoutMs)))
      }
      new BatchLogProcessor(spark, exp, resource, attributes,
        maxQueueSize = maxQueueSize, scheduleDelayMs = scheduleDelayMs,
        maxExportBatchSize = maxExportBatchSize, autoStart = autoStart)
    }
  }
}
