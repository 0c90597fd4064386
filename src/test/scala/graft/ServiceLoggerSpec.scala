package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.ServiceLogger
import graft.pipeline.ServiceLogger.LogsConfig

/** service::telemetry::logs — the zap-config analog: level gate,
  * console/json encodings, output path routing, zap-sampler window,
  * internal-failure split, config validation, CLI integration. */
class ServiceLoggerSpec extends AnyFunSuite {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("slog").toString

  private def lines(p: String): Seq[String] = {
    val f = java.nio.file.Paths.get(p)
    if (java.nio.file.Files.exists(f))
      scala.jdk.CollectionConverters.ListHasAsScala(
        java.nio.file.Files.readAllLines(f)).asScala.toSeq
    else Seq.empty
  }

  test("level gates records below it; file paths append in order") {
    val out = s"${tmp()}/svc.log"
    val log = new ServiceLogger(LogsConfig(
      level = "warn", outputPaths = Seq(out)), nowMs = () => 1755000000000L)
    log.debug("d"); log.info("i"); log.warn("w"); log.error("e")
    val got = lines(out)
    assert(got.length == 2)
    assert(got(0).contains("WARN") && got(0).endsWith("\tw"))
    assert(got(1).contains("ERROR") && got(1).endsWith("\te"))
  }

  test("console encoding: ISO-8601 timestamp, upper level, tab-separated, initial_fields rendered") {
    val out = s"${tmp()}/c.log"
    val log = new ServiceLogger(LogsConfig(outputPaths = Seq(out),
      initialFields = Map("service" -> "graft", "env" -> "dev")),
      nowMs = () => 1755000000123L)
    log.info("hello world")
    val l = lines(out).head
    // the reference switches zap's console encoder to ISO8601 time
    assert(l.matches("""\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d+Z\tINFO\thello world\t\{env=dev, service=graft\}"""), l)
  }

  test("json encoding: zap production shape, parseable, content escaped") {
    val out = s"${tmp()}/j.log"
    val log = new ServiceLogger(LogsConfig(encoding = "json",
      outputPaths = Seq(out), initialFields = Map("svc" -> "graft")),
      nowMs = () => 1755000000123L)
    log.warn("a \"quoted\"\nline")
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readValue(lines(out).head, classOf[java.util.Map[String, Object]])
    assert(root.get("level") == "warn")
    assert(root.get("msg") == "a \"quoted\"\nline")
    assert(root.get("svc") == "graft")
    assert(root.get("ts").asInstanceOf[Number].doubleValue() == 1755000000.123)
  }

  test("zap sampler: per-message per-second window — initial pass, every thereafter-th after; window resets") {
    val out = s"${tmp()}/s.log"
    var now = 1755000000000L
    val log = new ServiceLogger(LogsConfig(outputPaths = Seq(out),
      samplingInitial = 1, samplingThereafter = 2), nowMs = () => now)
    (1 to 5).foreach(_ => log.info("hot"))
    // 1st (initial), 3rd and 5th (thereafter=2) pass — 3 records
    assert(lines(out).length == 3)
    // a DIFFERENT message has its own counter
    log.info("cold")
    assert(lines(out).length == 4)
    // next one-second window starts fresh
    now += 1000L
    log.info("hot")
    assert(lines(out).length == 5)
  }

  test("a failing output path routes the failure note to error_output_paths, not silence") {
    val dir = tmp()
    val errOut = s"$dir/err.log"
    // the output path IS a directory — the write fails internally
    val log = new ServiceLogger(LogsConfig(
      outputPaths = Seq(dir), errorOutputPaths = Seq(errOut)),
      nowMs = () => 1755000000000L)
    log.info("x")
    val e = lines(errOut)
    assert(e.length == 1 && e.head.contains("log write to") &&
      e.head.contains("failed"), e)
  }

  test("json encoding round-trips ANY message content (1000-seed escape fuzz)") {
    val out = s"${tmp()}/fuzz.log"
    val log = new ServiceLogger(LogsConfig(encoding = "json",
      outputPaths = Seq(out)), nowMs = () => 1755000000000L)
    val rnd = new scala.util.Random(7)
    val nasty = "\"\\\n\r\t\u0000\u0001{}[],:π❤" + ('a' to 'z').mkString
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val sent = (1 to 1000).map { _ =>
      val msg = Seq.fill(rnd.nextInt(30))(nasty(rnd.nextInt(nasty.length))).mkString
      log.info(msg); msg
    }
    log.close()
    val got = lines(out)
    assert(got.length == 1000)
    // every record parses and the message survives byte-for-byte —
    // a control char or quote in operational text must never corrupt
    // the log stream a collector ships to its aggregator
    sent.zip(got).foreach { case (msg, line) =>
      val root = mapper.readValue(line, classOf[java.util.Map[String, Object]])
      assert(root.get("msg") == msg,
        s"msg mangled: ${msg.toList} vs ${root.get("msg")}")
    }
  }

  test("concurrent writers to one file sink produce whole lines, never interleaved fragments") {
    val out = s"${tmp()}/conc.log"
    val log = new ServiceLogger(LogsConfig(outputPaths = Seq(out)),
      nowMs = () => 1755000000000L)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val fs = (0 until 4).map(t => pool.submit(new Runnable {
        def run(): Unit = (0 until 100).foreach(i => log.info(s"t$t m$i"))
      }))
      fs.foreach(_.get(30, java.util.concurrent.TimeUnit.SECONDS))
    } finally pool.shutdownNow()
    log.close()
    val got = lines(out)
    assert(got.length == 400, got.length)
    // every line is a complete record (the synchronized sink): the
    // console shape with an intact message, no torn interleavings
    assert(got.forall(_.matches(""".*\tINFO\tt\d m\d+""")), got.take(3))
  }

  test("config surface: service::telemetry::logs builds, validates, and rejects bad knobs") {
    import graft.pipeline.ConfigLoader
    def doc(logs: String) =
      s"""{"service": {"telemetry": {"logs": $logs}},
         |"pipelines": {"logs/x": {
         |  "receiver": {"type": "parquet", "path": "/nowhere"},
         |  "exporters": [{"type": "logging"}]}}}""".stripMargin
    val svc = ConfigLoader.fromJson(doc(
      """{"level": "debug", "encoding": "json",
        |"output_paths": ["stdout", "/tmp/x.log"],
        |"sampling": {"initial": 5, "thereafter": 50},
        |"initial_fields": {"cluster": "a"}}""".stripMargin))
    val lc = svc.telemetryLogs.get
    assert(lc.level == "debug" && lc.encoding == "json")
    assert(lc.outputPaths == Seq("stdout", "/tmp/x.log"))
    assert(lc.samplingInitial == 5 && lc.samplingThereafter == 50)
    assert(lc.initialFields == Map("cluster" -> "a"))
    // absent block → None (no self-logger)
    assert(ConfigLoader.fromJson(
      """{"pipelines": {"logs/x": {
        |  "receiver": {"type": "parquet", "path": "/nowhere"},
        |  "exporters": [{"type": "logging"}]}}}""".stripMargin)
      .telemetryLogs.isEmpty)
    // zap-Build refusals: unknown encoding / level refuse the DOCUMENT
    intercept[IllegalArgumentException] {
      ConfigLoader.fromJson(doc("""{"encoding": "logfmt"}"""))
    }
    intercept[IllegalArgumentException] {
      ConfigLoader.fromJson(doc("""{"level": "trace"}"""))
    }
    // sampling block present without fields gets zap's 100/100 default
    val s2 = ConfigLoader.fromJson(doc("""{"sampling": {}}"""))
    assert(s2.telemetryLogs.get.samplingInitial == 100 &&
      s2.telemetryLogs.get.samplingThereafter == 100)
  }

  test("CLI run routes lifecycle messages through the configured self-logger") {
    val spark = TestSession.spark
    import spark.implicits._
    val in = tmp()
    val outP = s"${tmp()}/o"
    val logFile = s"${tmp()}/collector.log"
    Seq((1L, "x")).toDF("id", "msg").write.mode("overwrite").parquet(in)
    val cfgPath = java.nio.file.Files.createTempFile("slogcli", ".json")
    java.nio.file.Files.writeString(cfgPath,
      s"""{"service": {"telemetry": {"logs": {
         |  "encoding": "json", "output_paths": ["$logFile"]}}},
         |"pipelines": {"logs/sl": {
         |  "receiver": {"type": "parquet", "path": "$in"},
         |  "exporters": [{"type": "parquet", "path": "$outP"}]}}}""".stripMargin)
    val bos = new java.io.ByteArrayOutputStream()
    val ps = new java.io.PrintStream(bos, true, "UTF-8")
    assert(Collector.execute(Seq("run", "--config", cfgPath.toString), ps) == 0)
    // the CLI's own output contract is unchanged
    assert(bos.toString("UTF-8").contains("ran 1 pipeline(s)"))
    // and the self-logger carries the same lifecycle record as JSON
    val recs = lines(logFile)
    assert(recs.nonEmpty, "self-logger file is empty")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val msgs = recs.map(r => mapper.readValue(r,
      classOf[java.util.Map[String, Object]]).get("msg").toString)
    assert(msgs.contains("ran 1 pipeline(s)"), msgs)
  }
}
