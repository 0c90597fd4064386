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
    buildInfo: Map[String, String] = Map("command" -> "graft")) {

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
      Seq("pipelinez", "extensionz", "featurez")
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
