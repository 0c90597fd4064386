package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{ConfigLoader, Extensions}
import graft.pipeline.Pipeline._

/** Service extensions (reference extension/extension.go +
  * service/extensions/extensions.go), the experimental storage
  * contract (extension/experimental/storage/storage.go), the memory
  * ballast, and configtelemetry levels applied to healthFrame. */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  // ---------------- storage client contract (storage.go) ----------------

  test("storage client: golang-map semantics — get miss None, set overwrites, delete no-ops") {
    val dir = Files.createTempDirectory("stor").toString
    val ext = new Extensions.FileStorage(dir)
    ext.start()
    val c = ext.getClient("exporter", "logs/out", "queue")
    assert(c.get("k") == None)                      // miss is not an error
    c.set("k", "v1".getBytes)
    assert(c.get("k").map(new String(_)) == Some("v1"))
    c.set("k", "v2".getBytes)                       // silent overwrite
    assert(c.get("k").map(new String(_)) == Some("v2"))
    c.delete("k")
    assert(c.get("k") == None)
    c.delete("k")                                   // delete miss no-ops
    // keys with arbitrary characters are fine (encoded file names)
    c.set("a/b:c d%e", Array[Byte](0, 1, 2))
    assert(c.get("a/b:c d%e").get.toSeq == Seq[Byte](0, 1, 2))
    c.close()
    intercept[IllegalStateException](c.get("k"))    // use-after-close is a bug
  }

  test("storage keys and tmp scratch live in disjoint namespaces: a key named like an in-flight tmp file is just a key") {
    val ext = new Extensions.FileStorage(
      Files.createTempDirectory("stor_ns").toString)
    ext.start()
    val c = ext.getClient("exporter", "e", "q")
    // '.', '_', letters and digits all pass enc() unencoded, so this
    // key's file name used to be exactly another key's tmp name
    val hostile = s".tmp_real_${Thread.currentThread().getId}"
    c.set(hostile, "hostile".getBytes)
    c.set("real", "value".getBytes) // writes + renames its tmp
    assert(c.get(hostile).map(new String(_)) == Some("hostile"))
    assert(c.get("real").map(new String(_)) == Some("value"))
    c.delete("real")
    assert(c.get(hostile).map(new String(_)) == Some("hostile"))
    c.close()
  }

  test("storage layout migration: v1 (unprefixed) key files survive the upgrade to the k_ namespace") {
    val dir = Files.createTempDirectory("stor_mig").toString
    // hand-build a v1-layout scope: key files with NO k_ prefix
    val scope = java.nio.file.Paths.get(dir, "exporter_e_q")
    Files.createDirectories(scope)
    Files.write(scope.resolve("alpha"), "v1-alpha".getBytes)
    Files.write(scope.resolve("_offsets"), "v1-off".getBytes)  // '_' passes enc()
    Files.write(scope.resolve(".state"), "v1-dot".getBytes)    // '.' passes enc()
    // a file ALREADY in the k_ namespace is treated as v2 and left
    // alone — re-running a crash-interrupted sweep must be idempotent
    // (never k_k_*), which outranks the unresolvable v1-key-named-k_*
    // ambiguity
    Files.write(scope.resolve("k_done"), "v2-done".getBytes)
    val ext = new Extensions.FileStorage(dir)
    ext.start()
    val c = ext.getClient("exporter", "e", "q")
    assert(c.get("alpha").map(new String(_)) == Some("v1-alpha"))
    assert(c.get("_offsets").map(new String(_)) == Some("v1-off"))
    assert(c.get(".state").map(new String(_)) == Some("v1-dot"))
    assert(c.get("done").map(new String(_)) == Some("v2-done"))
    // migration runs ONCE: new-format writes are not re-prefixed by a
    // second client over the same dir
    c.set("beta", "v2".getBytes)
    c.close()
    val c2 = ext.getClient("exporter", "e", "q")
    assert(c2.get("alpha").map(new String(_)) == Some("v1-alpha"))
    assert(c2.get("beta").map(new String(_)) == Some("v2"))
    c2.close()
  }

  test("storage batch: operations run in order, Get results land in-place") {
    val ext = new Extensions.FileStorage(
      Files.createTempDirectory("stor_b").toString)
    ext.start()
    val c = ext.getClient("processor", "p", "state")
    val g1 = Extensions.Operation.get("x")
    val s1 = Extensions.Operation.set("x", "after".getBytes)
    val g2 = Extensions.Operation.get("x")
    val d = Extensions.Operation.delete("x")
    val g3 = Extensions.Operation.get("x")
    c.batch(g1, s1, g2, d, g3)
    assert(g1.value == null)                         // before the set
    assert(new String(g2.value) == "after")          // sees the set
    assert(g3.value == null)                         // after the delete
    c.close()
  }

  test("storage isolation + restart: components never see each other; a new instance over the same dir serves the same data") {
    val dir = Files.createTempDirectory("stor_iso").toString
    val ext = new Extensions.FileStorage(dir)
    ext.start()
    val a = ext.getClient("exporter", "logs/out", "queue")
    val b = ext.getClient("exporter", "metrics/out", "queue")
    val a2 = ext.getClient("exporter", "logs/out", "dlq") // same comp, other storageName
    a.set("k", "A".getBytes)
    assert(b.get("k") == None && a2.get("k") == None)
    a.close(); b.close(); a2.close()
    // "restart": a brand-new extension instance over the same directory
    val ext2 = new Extensions.FileStorage(dir)
    ext2.start()
    val c = ext2.getClient("exporter", "logs/out", "queue")
    assert(c.get("k").map(new String(_)) == Some("A"))
    c.close()
  }

  // ------------- config wiring + service lifecycle -------------

  test("config: declared+enabled extensions build, start in order, shut down in reverse; validation is two-sided") {
    val dir = Files.createTempDirectory("stor_cfg").toString
    val svc = ConfigLoader.fromJson(
      s"""{"extensions": {
         |  "file_storage": {"directory": "$dir"},
         |  "memory_ballast": {"size_mib": 1}},
         |"service": {"extensions": ["file_storage", "memory_ballast"]},
         |"pipelines": {"p": {
         |  "receiver": {"type": "parquet", "path": "/in"},
         |  "exporters": [{"type": "logging"}]}}}""".stripMargin)
    assert(svc.extensions.map(_.name) == Seq("file_storage", "memory_ballast"))
    svc.startExtensions()
    val ballast = svc.extension("memory_ballast").get
      .asInstanceOf[Extensions.MemoryBallast]
    assert(ballast.allocatedBytes == (1L << 20))
    svc.shutdownExtensions()
    assert(ballast.allocatedBytes == 0L)

    // enabled-but-undeclared rejects the document
    val e1 = intercept[IllegalArgumentException](ConfigLoader.fromJson(
      """{"service": {"extensions": ["file_storage"]},
        |"pipelines": {"p": {"receiver": {"type": "parquet", "path": "/in"},
        |"exporters": [{"type": "logging"}]}}}""".stripMargin))
    assert(e1.getMessage.contains("undeclared"))

    // declared-but-unlisted is never built
    val svc2 = ConfigLoader.fromJson(
      s"""{"extensions": {"file_storage": {"directory": "$dir"}},
         |"pipelines": {"p": {"receiver": {"type": "parquet", "path": "/in"},
         |"exporters": [{"type": "logging"}]}}}""".stripMargin)
    assert(svc2.extensions.isEmpty)
  }

  test("lifecycle order: start in declared order, shutdown in reverse (service/extensions.go)") {
    val events = scala.collection.mutable.ArrayBuffer[String]()
    final class Probe(val name: String) extends Extensions.Extension {
      override def start(): Unit = events += s"start:$name"
      override def shutdown(): Unit = events += s"stop:$name"
      override def notifyConfig(cfg: String): Unit = events += s"notify:$name"
    }
    val svc = Service(Map.empty, extensions = Seq(new Probe("a"), new Probe("b")))
    svc.startExtensions()
    svc.notifyConfig("{}")
    svc.shutdownExtensions()
    assert(events.toSeq ==
      Seq("start:a", "start:b", "notify:a", "notify:b", "stop:b", "stop:a"))
  }

  test("shutdownExporters reaches a pooled exporter through the wrapper chain, best-effort across failures") {
    val calls = new java.util.concurrent.atomic.AtomicInteger
    final class Probe extends graft.pipeline.Pipeline.Exporter {
      def export(df: org.apache.spark.sql.DataFrame): Unit = ()
      override def shutdown(): Unit = { calls.incrementAndGet(); () }
    }
    final class Broken extends graft.pipeline.Pipeline.Exporter {
      def export(df: org.apache.spark.sql.DataFrame): Unit = ()
      override def shutdown(): Unit = throw new RuntimeException("boom")
    }
    import graft.pipeline.Pipeline._
    val dlq = Files.createTempDirectory("sx_dlq").toString
    // the chain every queued arrow exporter ships as: wrappers must
    // FORWARD shutdown down to the delegate holding live resources —
    // and one failing exporter must not strand the next pipeline's
    val chained: Exporter = RetryingExporter(
      QueuedExporter(TimeoutExporter(new Probe, 1000L), dlq))
    val svc = Service(Map(
      "logs/a" -> PipelineDef(ParquetReceiver("/nowhere"),
        exporters = Seq(new Broken, chained)),
      "logs/b" -> PipelineDef(ParquetReceiver("/nowhere"),
        exporters = Seq(new Probe))))
    svc.shutdownExporters()
    assert(calls.get == 2, s"shutdown reached ${calls.get} probes, want 2")
  }

  test("storage-backed persistent queue: the extension owns the durable location; batches survive a crash through it") {
    val stor = Files.createTempDirectory("stor_q").toString
    val sink = Files.createTempDirectory("stor_sink").toString
    def doc =
      s"""{"extensions": {"file_storage": {"directory": "$stor"}},
         |"service": {"extensions": ["file_storage"]},
         |"pipelines": {"logs/out": {
         |  "receiver": {"type": "parquet", "path": "IN"},
         |  "exporters": [{"type": "parquet_persistent", "path": "$sink/out",
         |                 "storage": "file_storage"}]}}}""".stripMargin
    // seed an input file
    val in = Files.createTempDirectory("stor_in").toString + "/in.parquet"
    spark.range(0, 7).select(col("id"), (col("id") * 3).as("v"))
      .write.parquet(in)
    val svc = ConfigLoader.fromJson(doc.replace("IN", in))
    svc.startExtensions()
    svc.run(spark)
    // the queue dir lives under the storage extension's component
    // scope — the extension owns the location, not the exporter config
    val scopes = new java.io.File(stor).listFiles().filter(_.isDirectory)
    assert(scopes.length == 1 && scopes.head.getName.startsWith("exporter_"),
      scopes.map(_.getName).toSeq)
    assert(spark.read.parquet(s"$sink/out").count() == 7)
    // a REBUILT service from the same document recovers the same queue
    // (crash-restart: nothing pending here, but the dir resolves
    // identically — recovery finds the same scope)
    val svc2 = ConfigLoader.fromJson(doc.replace("IN", in))
    svc2.startExtensions()
    assert(svc2.recover(spark).values.forall(_.stillPending == 0))

    // misconfig: both queue and storage, or a non-storage reference
    val e = intercept[IllegalArgumentException](ConfigLoader.fromJson(
      s"""{"extensions": {"memory_ballast": {"size_mib": 1}},
         |"service": {"extensions": ["memory_ballast"]},
         |"pipelines": {"p": {
         |  "receiver": {"type": "parquet", "path": "/in"},
         |  "exporters": [{"type": "parquet_persistent", "path": "/o",
         |                 "storage": "memory_ballast"}]}}}""".stripMargin))
    assert(e.getMessage.contains("not a storage extension"))
  }

  // ---------------- configtelemetry levels ----------------

  test("telemetry level: parse + config default basic; healthFrame row sets widen with the level") {
    import Extensions._
    assert(TelemetryLevel.parse("Detailed") == LevelDetailed)
    assert(TelemetryLevel.parse("none") == LevelNone)
    intercept[IllegalArgumentException](TelemetryLevel.parse("verbose"))

    val base =
      """{"pipelines": {"p": {
        |  "receiver": {"type": "parquet", "path": "/in"},
        |  "exporters": [{"type": "logging"}]}}""".stripMargin
    assert(ConfigLoader.fromJson(base + "}").telemetryLevel == LevelBasic)
    val svcN = ConfigLoader.fromJson(base +
      ""","service": {"telemetry": {"metrics": {"level": "normal"}}}}""")
    assert(svcN.telemetryLevel == LevelNormal)

    // row sets: one obs map + one transport map, scraped at each level
    val obs = new QueueObs
    obs.delivered.set(3); obs.retries.set(2)
    val transports = Map("otlp_http/logs" -> Map("accepted_requests" -> 5L))
    val svc = Service(Map.empty)
    def names(level: TelemetryLevel): Set[String] =
      svc.healthFrame(spark, 1000L, obs = Map("p" -> obs),
          transports = transports, level = level)
        .select("metric_name").collect().map(_.getString(0)).toSet

    assert(names(LevelNone).isEmpty)
    val basic = names(LevelBasic)
    assert(basic.contains("otelcol_exporter_sent_batches"))
    assert(!basic.contains("otelcol_exporter_send_retries"))
    assert(!basic.exists(_.startsWith("otelcol_receiver_")))
    val normal = names(LevelNormal)
    assert(normal.contains("otelcol_exporter_send_retries"))
    assert(!normal.exists(_.startsWith("otelcol_receiver_")))
    val detailed = names(LevelDetailed)
    assert(detailed.contains("otelcol_receiver_accepted_requests"))
    assert(basic.subsetOf(normal) && normal.subsetOf(detailed))

    // the obsreport catalog gates at basic (the reference emits it
    // whenever telemetry is on at all), and scraper mirrors use SET
    // semantics — refreshing a lifetime total never double-counts
    val reg = new graft.pipeline.Obsreport.Registry
    reg.receiverAccepted("otlp_http", "http", "log_records", 7L)
    reg.scraperScraped("scrape_jvm", "jvm", 10L)
    reg.scraperScraped("scrape_jvm", "jvm", 12L) // refresh, not +=
    def catNames(level: TelemetryLevel): Map[String, Double] =
      svc.healthFrame(spark, 1000L, obsreport = reg, level = level)
        .select("metric_name", "value").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(catNames(LevelNone).isEmpty)
    val cat = catNames(LevelBasic)
    assert(cat("otelcol_receiver_accepted_log_records") == 7.0)
    assert(cat("otelcol_scraper_scraped_metric_points") == 12.0)
    // scraper dims are {receiver, scraper} (obs_scraper.go)
    val scrRow = svc.healthFrame(spark, 1000L, obsreport = reg,
        level = LevelBasic)
      .filter(org.apache.spark.sql.functions.col("metric_name") ===
        "otelcol_scraper_scraped_metric_points")
      .select("attributes").head()
      .getAs[scala.collection.Map[String, String]](0)
    assert(scrRow == scala.collection.Map(
      "receiver" -> "scrape_jvm", "scraper" -> "jvm"))
  }

  test("logging exporter: verbosity gates the data dump, zap sampling bounds log volume, none is rejected (loggingexporter/config.go)") {
    import graft.pipeline.Pipeline.LoggingExporter
    val df = spark.range(0, 5).toDF("id")
    def mk(v: Extensions.TelemetryLevel, init: Int = 2, after: Int = 500,
           clock: () => Long = () => 0L) = {
      val bos = new java.io.ByteArrayOutputStream()
      (bos, LoggingExporter(rows = 10, verbosity = v,
        samplingInitial = init, samplingThereafter = after,
        out = new java.io.PrintStream(bos, true, "UTF-8"), nowMs = clock))
    }
    // basic/normal: the one summary line, never the data (the
    // reference's only verbosity gate is `!= detailed`)
    for (v <- Seq(Extensions.LevelBasic, Extensions.LevelNormal)) {
      val (bos, exp) = mk(v)
      exp.export(df)
      val outStr = bos.toString("UTF-8")
      assert(outStr.contains("rows=5"), outStr)
      assert(!outStr.contains("| id|") && !outStr.contains("|id |"), outStr)
    }
    // detailed: summary + the bounded data dump
    val (bosD, expD) = mk(Extensions.LevelDetailed)
    expD.export(df)
    val outD = bosD.toString("UTF-8")
    assert(outD.contains("rows=5") && outD.contains("id"), outD)
    assert(outD.linesIterator.count(_.startsWith("|")) == 6, outD) // header + 5 rows
    // zap sampling, fixed clock: initial 2 pass, then every 3rd
    var now = 0L
    val (bosS, expS) = mk(Extensions.LevelBasic, init = 2, after = 3,
      clock = () => now)
    (1 to 8).foreach(_ => expS.export(df))
    assert(bosS.toString("UTF-8").linesIterator.size == 4) // #1 #2 #5 #8
    // window rollover resets the counters
    now = 1000L
    expS.export(df)
    assert(bosS.toString("UTF-8").linesIterator.size == 5)
    // LevelNone is not a supported verbosity (config.go supportedLevels)
    intercept[IllegalArgumentException](mk(Extensions.LevelNone))
    // config wiring: the knobs parse; a bad verbosity is a config error
    val svc = ConfigLoader.fromJson(
      """{"pipelines": {"p": {"receiver": {"type": "parquet", "path": "/in"},
        |"exporters": [{"type": "logging", "verbosity": "detailed",
        |  "sampling_initial": 1, "sampling_thereafter": 7}]}}}""".stripMargin)
    val built = svc.pipelines.values.head.exporters.head
      .asInstanceOf[LoggingExporter]
    assert(built.verbosity == Extensions.LevelDetailed)
    assert(built.samplingInitial == 1 && built.samplingThereafter == 7)
    intercept[IllegalArgumentException](ConfigLoader.fromJson(
      """{"pipelines": {"p": {"receiver": {"type": "parquet", "path": "/in"},
        |"exporters": [{"type": "logging", "verbosity": "nope"}]}}}""".stripMargin))
    // `debug` = the reference's rename of the same component
    val dbg = ConfigLoader.fromJson(
      """{"pipelines": {"p": {"receiver": {"type": "parquet", "path": "/in"},
        |"exporters": [{"type": "debug", "verbosity": "basic"}]}}}""".stripMargin)
      .pipelines.values.head.exporters.head.asInstanceOf[LoggingExporter]
    assert(dbg.verbosity == Extensions.LevelBasic)
  }

  test("zpages extension: config-declared debug server binds to the built service and stops on shutdown") {
    val svc = ConfigLoader.fromJson(
      """{"extensions": {"zpages": {"port": 0}},
        |"service": {"extensions": ["zpages"]},
        |"pipelines": {"logs/zp": {
        |  "receiver": {"type": "parquet", "path": "/in"},
        |  "exporters": [{"type": "logging"}]}}}""".stripMargin)
    svc.startExtensions()
    val z = svc.extension("zpages").get
      .asInstanceOf[Extensions.ZpagesExtension]
    z.bind(svc, spark)
    def get(path: String): (Int, String) = {
      val c = java.net.URI.create(s"http://localhost:${z.boundPort}$path")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      val code = c.getResponseCode
      val body = new String(
        (if (code >= 400) c.getErrorStream else c.getInputStream).readAllBytes(),
        "UTF-8")
      (code, body)
    }
    val (pc, pb) = get("/debug/pipelinez")
    assert(pc == 200 && pb.contains("logs/zp"))
    val (ec, eb) = get("/debug/extensionz")
    assert(ec == 200 && eb.contains("zpages"))
    val port = z.boundPort
    svc.shutdownExtensions()
    intercept[Exception] {
      java.net.URI.create(s"http://localhost:$port/debug/servicez")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
        .getResponseCode
    }
  }

  test("semconv: the catalog names match the published conventions and self-telemetry uses them") {
    import graft.model.SemConv
    assert(SemConv.AttributeServiceName == "service.name")
    assert(SemConv.AttributeServiceInstanceId == "service.instance.id")
    assert(SemConv.AttributeProcessRuntimeName == "process.runtime.name")
    assert(SemConv.SchemaUrl.endsWith("/1.18.0"))
    // every constant is a dotted lowercase key — the convention shape
    for (m <- SemConv.getClass.getMethods
         if m.getParameterCount == 0 && m.getReturnType == classOf[String]
           && m.getName.startsWith("Attribute")) {
      val v = m.invoke(SemConv).asInstanceOf[String]
      assert(v.matches("[a-z0-9_.]+") && v.contains("."), s"${m.getName}=$v")
    }
    val frame = Service(Map.empty).healthFrame(spark, 1000L)
    assert(frame.columns.contains("resource_attributes"))
  }

  test("semconv multi-version: per-version catalogs with stability markers; 1.18->1.23 renames migrate a live attrs map; bad shapes refuse") {
    import graft.model.SemConv
    // per-version lookup: the same concept resolves to each version's
    // spelling; 1.23 drops the old constants outright
    assert(SemConv.V1_18_0.key("HttpMethod") == "http.method")
    assert(SemConv.V1_23_0.key("HttpRequestMethod") == "http.request.method")
    assert(SemConv.V1_23_0.key("UrlFull") == "url.full")
    assert(SemConv.V1_23_0.key("ServerAddress") == "server.address")
    intercept[NoSuchElementException] { SemConv.V1_23_0.key("HttpMethod") }
    intercept[NoSuchElementException] { SemConv.V1_23_0.key("EventDomain") }
    // stability markers: HTTP experimental at 1.18, stable at 1.23;
    // the core identity attributes stable at both
    assert(SemConv.V1_18_0.stability("http.method") == "experimental")
    assert(SemConv.V1_23_0.stability("http.request.method") == "stable")
    assert(SemConv.V1_18_0.stability("service.name") == "stable")
    assert(SemConv.V1_23_0.stability("service.name") == "stable")
    // the net.* fold is side-aware: one server.address from two old
    // spellings, so the per-side tables never collide
    val cl = SemConv.renames("1.18.0", "1.23.0", "client")
    val sv = SemConv.renames("1.18.0", "1.23.0", "server")
    assert(cl("net.peer.name") == "server.address" && !cl.contains("net.host.name"))
    assert(sv("net.host.name") == "server.address" && !sv.contains("net.peer.name"))
    assert(cl("http.method") == "http.request.method")
    // the socket-level renames are side-AGNOSTIC (only the
    // server.address fold splits by side) — both views rewrite them
    for (t <- Seq(cl, sv)) {
      assert(t("net.sock.peer.addr") == "network.peer.address")
      assert(t("net.sock.host.addr") == "network.local.address")
      assert(t("net.sock.host.port") == "network.local.port")
    }
    assert(SemConv.V1_23_0.key("NetworkLocalAddress") == "network.local.address")
    assert(SemConv.renames("1.18.0", "1.18.0").isEmpty)
    val noTable = intercept[IllegalArgumentException] {
      SemConv.renames("1.23.0", "1.18.0")
    }
    assert(noTable.getMessage.contains("1.18.0 -> 1.23.0"))
    intercept[IllegalArgumentException] { SemConv.renames("1.18.0", "9.9.9") }
    intercept[IllegalArgumentException] {
      SemConv.renames("1.18.0", "1.23.0", "bidirectional")
    }
    // live migration in one projection: renamed keys rewrite, unknown
    // keys and all values pass through
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(
      (1L, Map("http.method" -> "GET", "net.peer.name" -> "api.local",
        "custom.key" -> "kept")),
      (2L, Map("http.status_code" -> "200"))
    ).toDF("id", "attrs")
    val migrated = df.withColumn("attrs",
        SemConv.migrateAttrs(org.apache.spark.sql.functions.col("attrs"),
          "1.18.0", "1.23.0"))
      .collect().map(r => r.getLong(0) ->
        r.getAs[Map[String, String]]("attrs")).toMap
    assert(migrated(1L) == Map("http.request.method" -> "GET",
      "server.address" -> "api.local", "custom.key" -> "kept"))
    assert(migrated(2L) == Map("http.response.status_code" -> "200"))
    // a row carrying BOTH spellings of one key fails LOUDLY (duplicate
    // map key after the rewrite), never silently drops one value
    val both = Seq(Map("http.method" -> "GET",
      "http.request.method" -> "POST")).toDF("attrs")
    val dup = intercept[RuntimeException] {
      both.withColumn("attrs", SemConv.migrateAttrs(
        org.apache.spark.sql.functions.col("attrs"),
        "1.18.0", "1.23.0")).collect()
    }
    assert(dup.getMessage.toLowerCase.contains("duplicate"), dup.getMessage)
    // ...and the yaml seam reaches it
    val dir = java.nio.file.Files.createTempDirectory("semconv_mig").toString
    df.write.mode("overwrite").parquet(s"$dir/in")
    val out = s"$dir/out"
    ConfigLoader.fromJson(
      s"""{"pipelines": {"logs/m": {
         |  "receiver": {"type": "parquet", "path": "$dir/in"},
         |  "processors": [{"type": "semconv_migrate", "attrs": "attrs",
         |    "from": "1.18.0", "to": "1.23.0", "side": "client"}],
         |  "exporters": [{"type": "parquet", "path": "$out"}]}}}""".stripMargin)
      .run(spark)
    val back = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> r.getAs[Map[String, String]]("attrs")).toMap
    assert(back(1L)("http.request.method") == "GET")
  }

  test("service telemetry resource: configured attributes stamp self-telemetry, override wins") {
    val svc = ConfigLoader.fromJson(
      """{"service": {"telemetry": {"resource": {
        |  "service.name": "edge-east", "deployment.environment": "prod"}}},
        |"pipelines": {"p": {
        |  "receiver": {"type": "parquet", "path": "/in"},
        |  "exporters": [{"type": "logging"}]}}}""".stripMargin)
    val obs = new QueueObs
    obs.delivered.set(1)
    val res = svc.healthFrame(spark, 1000L, obs = Map("p" -> obs))
      .head().getAs[Map[String, String]]("resource_attributes")
    assert(res("service.name") == "edge-east")     // override wins
    assert(res("deployment.environment") == "prod")
  }

  test("receivers LIST: every member feeds the same processor chain; lifecycle members start/stop with the pipeline") {
    val inA = Files.createTempDirectory("multi_a").toString + "/a.parquet"
    val inB = Files.createTempDirectory("multi_b").toString + "/b.parquet"
    spark.range(0, 3).select(col("id"), lit("a").as("src")).write.parquet(inA)
    spark.range(3, 8).select(col("id"), lit("b").as("src")).write.parquet(inB)
    val sink = Files.createTempDirectory("multi_out").toString + "/out"
    val svc = ConfigLoader.fromJson(
      s"""{"pipelines": {"p": {
         |  "receivers": [{"type": "parquet", "path": "$inA"},
         |                {"type": "parquet", "path": "$inB"}],
         |  "processors": [{"type": "filter", "where": "id >= 2"}],
         |  "exporters": [{"type": "parquet", "path": "$sink"}]}}}""".stripMargin)
    svc.run(spark)
    val back = spark.read.parquet(sink)
    assert(back.count() == 6) // id 2 from a, 3..7 from b
    assert(back.select("src").distinct().count() == 2)

    // declaring both singular and list forms is a config error
    val e = intercept[IllegalArgumentException](ConfigLoader.fromJson(
      """{"pipelines": {"p": {
        |  "receiver": {"type": "parquet", "path": "/x"},
        |  "receivers": [{"type": "parquet", "path": "/y"}],
        |  "exporters": [{"type": "logging"}]}}}""".stripMargin))
    assert(e.getMessage.contains("not both"))
  }
}
