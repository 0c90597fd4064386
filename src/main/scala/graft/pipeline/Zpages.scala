package graft.pipeline

import org.apache.spark.sql.SparkSession

/** zpagesextension's HTTP surface (reference:
  * extension/zpagesextension/zpagesextension.go — a local HTTP server
  * registering the service's debug pages; service/zpages.go:17-23 —
  * the page set: servicez, pipelinez, extensionz, featurez). The
  * existing [[Pipeline.Service.zpages]] text report is the data; this
  * serves it live the way the reference does: loopback HTTP, HTML
  * tables, one handler per page, all read-only.
  *
  * Page fidelity: servicez carries build/runtime properties and links
  * to the other pages (zpages.go:47-69); pipelinez one table row per
  * pipeline with its receiver/processor/exporter chain; featurez the
  * feature-gate registry (id, stage, enabled — zpages.go:71-89);
  * extensionz the caller-registered extension names. configz is a
  * graft addition (the reference exposes the effective config via the
  * otelcol print surface, not zpages): the REDACTED rendering of
  * [[ConfigLoader.effectiveConfig]], safe by construction.
  */
final class ZpagesServer(
    service: Pipeline.Service,
    spark: SparkSession,
    port: Int = 0,
    gates: FeatureGate.Registry = FeatureGate.global,
    extensions: Seq[String] = Nil,
    configDoc: Option[String] = None,
    buildInfo: Map[String, String] = Map("command" -> "graft"),
    // self-trace store → /debug/tracez (reference zpagesextension.go:
    // 46-52 registers the zpages SpanProcessor on the service's own
    // TracerProvider and serves contrib's tracez handler off it)
    tracer: SelfTrace.Tracer = null) {

  private val startedAt = java.time.Instant.now().toString

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def page(title: String, body: String): String =
    s"""<!DOCTYPE html><html><head><title>${esc(title)}</title></head>
       |<body><h1>${esc(title)}</h1>$body</body></html>""".stripMargin

  private def propsTable(name: String, props: Seq[(String, String)]): String =
    s"<h2>${esc(name)}</h2><table border='1'>" +
      props.map { case (k, v) =>
        s"<tr><td>${esc(k)}</td><td>${esc(v)}</td></tr>" }.mkString +
      "</table>"

  private def servicez: String = page("Service " +
      buildInfo.getOrElse("command", "graft"),
    propsTable("Build Info", buildInfo.toSeq.sortBy(_._1)) +
      propsTable("Runtime Info", Seq(
        "StartTimestamp" -> startedAt,
        "JVM" -> System.getProperty("java.version"),
        "OS" -> System.getProperty("os.name"),
        "Arch" -> System.getProperty("os.arch"))) +
      (Seq("pipelinez", "extensionz", "featurez") ++
        (if (tracer != null) Seq("tracez") else Nil))
        .map(p => s"<p><a href='/debug/$p'>$p</a></p>").mkString)

  private def pipelinez: String = {
    def chain(e: Pipeline.Exporter): String = e match {
      case q: Pipeline.PersistentQueueExporter =>
        s"persistent_queue → ${chain(q.delegate)}"
      case Pipeline.RetryingExporter(d, n, _, _, _) => s"retry(max=$n) → ${chain(d)}"
      case Pipeline.QueuedExporter(d, _, _, _, _) => s"queue → ${chain(d)}"
      case Pipeline.TimeoutExporter(d, ms) => s"timeout(${ms}ms) → ${chain(d)}"
      case other => other.getClass.getSimpleName.stripSuffix("$")
    }
    page("Pipelines",
      "<table border='1'><tr><th>pipeline</th><th>receiver</th>" +
        "<th>processors</th><th>exporters</th></tr>" +
        service.pipelines.toSeq.sortBy(_._1).map { case (name, p) =>
          s"<tr><td>${esc(name)}</td>" +
            s"<td>${esc(p.receiver.getClass.getSimpleName.stripSuffix("$"))}</td>" +
            s"<td>${p.processors.size}</td>" +
            s"<td>${esc(p.exporters.map(chain).mkString("; "))}</td></tr>"
        }.mkString + "</table>")
  }

  private def featurez: String = page("Feature Gates",
    "<table border='1'><tr><th>id</th><th>stage</th><th>enabled</th></tr>" +
      gates.visitAll.map(g =>
        s"<tr><td>${esc(g.id)}</td><td>${g.stage}</td><td>${g.isEnabled}</td></tr>")
        .mkString + "</table>")

  private def extensionz: String = page("Extensions",
    "<table border='1'><tr><th>extension</th></tr>" +
      extensions.map(e => s"<tr><td>${esc(e)}</td></tr>").mkString + "</table>")

  /** tracez (contrib zpages shape): one row per span name — running
    * count, the nine latency-bucket counts, error count — plus the
    * bounded recent samples below (span/trace ids, duration, status).
    * The drill-down-by-bucket links of the contrib handler are
    * flattened into the samples table; counts and samples are the
    * same data either way. */
  private def tracez: String = {
    val rows = tracer.snapshot
    val bucketHdrs = Seq(">0us", ">10us", ">100us", ">1ms", ">10ms",
      ">100ms", ">1s", ">10s", ">100s")
    val counts =
      s"<table border='1'><tr><th>span name</th><th>running</th>" +
        bucketHdrs.map(h => s"<th>$h</th>").mkString +
        "<th>errors</th></tr>" +
        rows.map { r =>
          s"<tr><td>${esc(r.name)}</td><td>${r.running}</td>" +
            r.bucketCounts.map(c => s"<td>$c</td>").mkString +
            s"<td>${r.errors}</td></tr>"
        }.mkString + "</table>"
    val samples =
      "<h2>Recent samples</h2><table border='1'><tr><th>span name</th>" +
        "<th>trace id</th><th>span id</th><th>parent</th>" +
        "<th>duration ms</th><th>status</th></tr>" +
        rows.flatMap(r => (r.samples ++ r.errorSamples).map { s =>
          s"<tr><td>${esc(s.name)}</td><td>${s.traceId}</td>" +
            s"<td>${s.spanId}</td><td>${s.parentSpanId.getOrElse("")}</td>" +
            f"<td>${s.durationNano / 1e6}%.3f</td>" +
            s"<td>${esc(s.error.map(e => s"ERROR: $e").getOrElse("OK"))}</td></tr>"
        }).mkString + "</table>"
    page("Tracez", s"<p>sampler: ${esc(tracer.sampler.description)}</p>" +
      counts + samples)
  }

  private val server = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress("localhost", port), 0)

  private def handler(body: () => (Int, String, String)):
      com.sun.net.httpserver.HttpHandler = ex => {
    try {
      val (code, ct, text) = body()
      val bytes = text.getBytes("UTF-8")
      ex.getResponseHeaders.set("Content-Type", ct)
      ex.sendResponseHeaders(code, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
    } finally ex.close()
  }

  private val html = "text/html; charset=utf-8"
  server.createContext("/debug/servicez", handler(() => (200, html, servicez)))
  server.createContext("/debug/pipelinez", handler(() => (200, html, pipelinez)))
  server.createContext("/debug/featurez", handler(() => (200, html, featurez)))
  server.createContext("/debug/extensionz", handler(() => (200, html, extensionz)))
  if (tracer != null)
    server.createContext("/debug/tracez", handler(() => (200, html, tracez)))
  configDoc.foreach { doc =>
    server.createContext("/debug/configz", handler(() =>
      (200, "application/json",
        ConfigLoader.effectiveConfig(doc, yaml = !doc.trim.startsWith("{")))))
  }
  // the text report (queue depths included) as plaintext — the same
  // value Service.zpages prints, now fetchable
  server.createContext("/debug/statusz", handler(() =>
    (200, "text/plain; charset=utf-8", service.zpages(spark, gates))))
  server.createContext("/", handler(() => (404, "text/plain", "not found")))
  server.setExecutor(null)
  server.start()

  def boundPort: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
}

/** `service::telemetry::metrics::address` — the collector's OWN
  * metrics served in Prometheus text exposition format 0.0.4 at
  * GET /metrics (reference service/telemetry.go:202-206: the service
  * spins a Prometheus exporter + HTTP server on `metrics.address`;
  * every production collector is scraped this way).
  *
  * One source of truth: the families are EXACTLY
  * [[Pipeline.Service.healthFrame]]'s rows — the same data whether
  * consumed as a metrics DataFrame (the dogfood loop) or scraped —
  * and the configured TelemetryLevel gates them identically
  * (`none` serves an EMPTY exposition; basic → queue gauges +
  * delivery/dead-letter totals; normal adds retry/partial-success;
  * detailed adds the per-transport dimensioned counters). The
  * `obs`/`transports` thunks supply the counter sources per scrape:
  * the collector CLI wires `transports` from every live wire
  * receiver it started; `obs` (per-pipeline QueueObs delivery
  * totals) is the embedding caller's to provide, since QueueObs
  * instances live with whoever constructs the queued exporters.
  * Names stay in the otelcol_* space; `gauge` rows expose as gauge,
  * cumulative monotonic sums as counter. Binds loopback like the
  * zpages server (the reference default address is 0.0.0.0:8888;
  * this sandbox is loopback-only).
  */
/** The `periodic: {exporter: {console: {}}}` metric reader
  * (telemetry/generated_config.go PeriodicMetricReader with the
  * console exporter): every `intervalMs` the service's OWN metrics —
  * the same healthFrame the Prometheus endpoint serves, same level
  * gate — write as one JSON line per metric point (the jsonl
  * exporter's line discipline). `out` is injectable so specs capture
  * deterministically; writeOnce is the testable kernel the loop
  * drives. */
/** The ONE periodic self-metrics loop driver, shared by the console
  * jsonl writer and the OTLP pusher (r15 review-wave: the two were
  * near-copies whose level-gate/healthFrame plumbing would drift —
  * one loop, a pluggable sink). `sink` consumes one healthFrame and
  * returns rows delivered; `immediateFirst` emits before the first
  * sleep (the console reader's historical cadence), `finalOnStop`
  * runs one last pass inside stop() (the SDK periodic reader's
  * Shutdown export — the OTLP pusher's contract). */
abstract class PeriodicHealthLoop(
    service: Pipeline.Service,
    spark: SparkSession,
    intervalMs: Long,
    obs: () => Map[String, Pipeline.QueueObs],
    transports: () => Map[String, Map[String, Long]],
    obsreport: () => Obsreport.Registry,
    processMetrics: Boolean,
    immediateFirst: Boolean,
    finalOnStop: Boolean,
    threadName: String,
    autoStart: Boolean) {
  // interval 0 would busy-loop Spark jobs; a negative one would kill
  // the thread on the first sleep (IllegalArgumentException escapes
  // the NonFatal catch) — refuse at construction, loudly
  require(intervalMs > 0,
    s"periodic metrics interval must be positive, got $intervalMs")
  @volatile private var running = true

  protected def sink(df: org.apache.spark.sql.DataFrame): Int

  /** one pass; returns rows delivered (0 at level none).
    * Synchronized: a finalOnStop pass must not race a loop pass
    * already mid-flight — concurrent exports would land the same
    * cumulative counters twice at different timestamps. */
  final def passOnce(timeUnixNano: Long = System.currentTimeMillis() * 1000000L): Int = synchronized {
    if (service.telemetryLevel.rank < Extensions.LevelBasic.rank) return 0
    sink(service.healthFrame(spark, timeUnixNano,
      obs = obs(), transports = transports(),
      obsreport = obsreport(), processMetrics = processMetrics))
  }

  private def safePass(): Unit =
    try passOnce()
    catch { case scala.util.control.NonFatal(_) => () }

  private val t = new Thread(() => {
    if (immediateFirst) safePass()
    while (running) {
      try Thread.sleep(intervalMs)
      catch { case _: InterruptedException => () }
      if (running) safePass()
    }
  }, threadName)
  t.setDaemon(true)
  if (autoStart) t.start()

  def stop(): Unit = {
    running = false
    t.interrupt()
    if (finalOnStop) safePass()
  }
}

final class PeriodicMetricsWriter(
    service: Pipeline.Service,
    spark: SparkSession,
    intervalMs: Long,
    out: java.io.PrintStream = System.out,
    obs: () => Map[String, Pipeline.QueueObs] = () => Map.empty,
    transports: () => Map[String, Map[String, Long]] = () => Map.empty,
    obsreport: () => Obsreport.Registry = () => null,
    processMetrics: Boolean = true,
    autoStart: Boolean = true)
    extends PeriodicHealthLoop(service, spark, intervalMs,
      obs, transports, obsreport, processMetrics,
      immediateFirst = true, finalOnStop = false,
      threadName = "graft-periodic-metrics", autoStart = autoStart) {

  protected def sink(df: org.apache.spark.sql.DataFrame): Int = {
    val lines = df.toJSON.collect()
    lines.foreach(out.println)
    out.flush()
    lines.length
  }

  /** one export pass; returns rows written (0 at level none) */
  def writeOnce(timeUnixNano: Long = System.currentTimeMillis() * 1000000L): Int =
    passOnce(timeUnixNano)
}

object PromTelemetryServer {
  /** Collapse per-receiver counter maps onto their transport-type key
    * by SUMMING each counter: a service may run several receivers of
    * ONE transport type (two pipelines, two ports) and the exposition
    * dimension is the type — last-wins would silently drop every
    * receiver's traffic but one. */
  def mergeTransports(perReceiver: Seq[(String, Map[String, Long])])
      : Map[String, Map[String, Long]] =
    perReceiver.groupBy(_._1).map { case (t, ms) =>
      t -> ms.flatMap(_._2.toSeq).groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).sum }
    }
}

final class PromTelemetryServer(
    service: Pipeline.Service,
    spark: SparkSession,
    address: String = "localhost:0",
    obs: () => Map[String, Pipeline.QueueObs] = () => Map.empty,
    transports: () => Map[String, Map[String, Long]] = () => Map.empty,
    // the obsreport per-component catalog (accepted/refused/sent/
    // send_failed/dropped per component id) — one registry for the
    // service lifetime, filled by Service.runObsreport
    obsreport: () => Obsreport.Registry = () => null,
    // process self-metrics are ON for a scrape endpoint — every
    // production collector dashboard expects otelcol_process_*
    processMetrics: Boolean = true) {

  private val port = {
    val idx = address.lastIndexOf(':')
    require(idx >= 0 && idx < address.length - 1,
      s"telemetry metrics address '$address' is not host:port")
    val p = address.substring(idx + 1)
    require(p.forall(_.isDigit), s"bad port in telemetry address '$address'")
    p.toInt
  }

  private def esc(v: String): String =
    v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  /** label NAMES must match [a-zA-Z_][a-zA-Z0-9_]* — stricter than
    * METRIC names, which also allow ':' (the Prometheus data model
    * draws exactly that distinction). Semconv dim keys
    * (net.sock.peer.addr) carry dots, custom resource keys can carry
    * colons; the otel Prometheus exporter's sanitizer maps every
    * invalid rune to '_' (the exposition would otherwise be
    * unparseable by any scraper). */
  private def lbl(k: String): String = {
    val s = k.map(c =>
      if (c.isLetterOrDigit && c < 128 || c == '_') c else '_')
    if (s.nonEmpty && s.head.isDigit) "_" + s else s
  }

  private def num(v: Double): String =
    if (v == math.floor(v) && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  /** the exposition document; deterministic family and label order */
  def exposition(timeUnixNano: Long = System.currentTimeMillis() * 1000000L): String = {
    if (service.telemetryLevel.rank < Extensions.LevelBasic.rank) return ""
    val rows = service.healthFrame(spark, timeUnixNano,
      obs = obs(), transports = transports(),
      obsreport = obsreport(), processMetrics = processMetrics).collect()
    val sb = new StringBuilder
    for ((name, fam) <- rows.groupBy(_.getAs[String]("metric_name"))
        .toSeq.sortBy(_._1)) {
      val tpe =
        if (fam.head.getAs[String]("metric_type") == "gauge") "gauge"
        else "counter" // healthFrame sums are cumulative monotonic
      val unit = Option(fam.head.getAs[String]("unit")).getOrElse("")
      sb.append(s"# HELP $name graft self-telemetry ($unit)\n")
      sb.append(s"# TYPE $name $tpe\n")
      for (r <- fam) {
        val attrs = Option(r.getAs[scala.collection.Map[String, String]]("attributes"))
          .getOrElse(scala.collection.Map.empty[String, String])
        val labels = attrs.toSeq.sortBy(_._1)
          .map { case (k, v) => s"""${lbl(k)}="${esc(v)}"""" }.mkString(",")
        sb.append(
          if (labels.isEmpty) s"$name ${num(r.getAs[Double]("value"))}\n"
          else s"$name{$labels} ${num(r.getAs[Double]("value"))}\n")
      }
    }
    sb.toString
  }

  private val server = com.sun.net.httpserver.HttpServer.create(
    new java.net.InetSocketAddress("localhost", port), 0)
  server.createContext("/metrics",
    (ex: com.sun.net.httpserver.HttpExchange) => {
      try {
        val bytes = exposition().getBytes("UTF-8")
        ex.getResponseHeaders.set("Content-Type",
          "text/plain; version=0.0.4; charset=utf-8")
        ex.sendResponseHeaders(200,
          if (bytes.isEmpty) -1L else bytes.length.toLong)
        if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      } finally ex.close()
    })
  server.setExecutor(null)
  server.start()

  def boundPort: Int = server.getAddress.getPort
  def stop(): Unit = server.stop(0)
}
