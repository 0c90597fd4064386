package graft

import org.scalatest.funsuite.AnyFunSuite

/** The collector CLI surface: validate / print-config / components /
  * run, the repeatable --config flag, and the registry-matches-
  * builder pin. */
class CollectorCliSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def exec(args: String*): (Int, String) = {
    val bos = new java.io.ByteArrayOutputStream()
    val ps = new java.io.PrintStream(bos, true, "UTF-8")
    val code = Collector.execute(args.toSeq, ps)
    (code, bos.toString("UTF-8"))
  }

  private def write(name: String, content: String): String = {
    val f = java.nio.file.Files.createTempFile("cli_", name)
    java.nio.file.Files.write(f, content.getBytes("UTF-8"))
    f.toString
  }

  test("components lists the registry, and every listed type is known to the builder") {
    val (code, outStr) = exec("components")
    assert(code == 0)
    for ((kind, types) <- Collector.componentTypes; t <- types)
      assert(outStr.contains(s"  - $t"), s"$kind $t missing from output")

    // mechanical teeth: a config using each listed type must never
    // fail with "unknown ... type" — wrong field errors are fine,
    // an unknown name means the registry lies
    def tryCfg(cfg: String): Unit =
      try { graft.pipeline.ConfigLoader.fromJson(cfg); () }
      catch {
        case e: Exception =>
          assert(e.getMessage == null || !e.getMessage.contains("unknown"),
            s"registry lists a type the builder rejects: ${e.getMessage}")
      }
    for (t <- Collector.componentTypes("receivers"))
      tryCfg(s"""{"pipelines": {"p": {"receiver": {"type": "$t"},
                |"exporters": [{"type": "logging"}]}}}""".stripMargin)
    for (t <- Collector.componentTypes("processors"))
      tryCfg(s"""{"pipelines": {"p": {"receiver": {"type": "parquet", "path": "x"},
                |"processors": [{"type": "$t"}],
                |"exporters": [{"type": "logging"}]}}}""".stripMargin)
    for (t <- Collector.componentTypes("exporters"))
      tryCfg(s"""{"pipelines": {"p": {"receiver": {"type": "parquet", "path": "x"},
                |"exporters": [{"type": "$t"}]}}}""".stripMargin)
    for (t <- Collector.componentTypes("extensions"))
      tryCfg(s"""{"extensions": {"$t": {"directory": "/tmp/x", "size_mib": 1}},
                |"service": {"extensions": ["$t"]},
                |"pipelines": {"p": {"receiver": {"type": "parquet", "path": "x"},
                |"exporters": [{"type": "logging"}]}}}""".stripMargin)
  }

  test("--set: dotted property overrides merge LAST, over every config document") {
    val in = java.nio.file.Files.createTempDirectory("set_in").toString + "/in.parquet"
    TestSession.spark.range(0, 4).toDF("id").write.parquet(in)
    val outA = java.nio.file.Files.createTempDirectory("set_outA").toString + "/a"
    val outB = java.nio.file.Files.createTempDirectory("set_outB").toString + "/b"
    val cfg = write(".json",
      s"""{"pipelines": {"p": {
         |  "receiver": {"type": "parquet", "path": "$in"},
         |  "exporters": [{"type": "parquet", "path": "$outA"}]}}}""".stripMargin)
    // maps JOIN under --set: retune the receiver path... here we
    // retune nothing structural, but override the exporters ARRAY
    // wholesale is not addressable — the reference overrides scalars
    // and joins maps; we override the receiver's path scalar and
    // check the sink still fills (the set path wins)
    val in2 = java.nio.file.Files.createTempDirectory("set_in2").toString + "/in2.parquet"
    TestSession.spark.range(0, 9).toDF("id").write.parquet(in2)
    val (c, o) = exec("run", "--config", cfg,
      s"--set=pipelines.p.receiver.path=$in2")
    assert(c == 0, o)
    assert(TestSession.spark.read.parquet(outA).count() == 9,
      "--set override must win over the config document")
    val _ = outB
    // malformed set is a config error
    val (c2, o2) = exec("validate", "--config", cfg, "--set", "nokey")
    assert(c2 == 1 && o2.contains("key=value"), o2)
  }

  test("builder: manifest → distribution; validate enforces the built component set") {
    // a minimal logs-only distribution
    val mf = write(".yaml",
      """dist:
        |  name: graft-logs-only
        |receivers: [parquet, otlp_json_logs]
        |processors: [filter]
        |exporters: [parquet, logging]
        |""".stripMargin)
    val distFile = java.nio.file.Files.createTempFile("dist_", ".json").toString
    val (bc, bo) = exec("builder", "--manifest", mf, "--output", distFile)
    assert(bc == 0 && bo.contains("graft-logs-only"), bo)

    // a config inside the distribution validates
    val okCfg = write(".json",
      """{"pipelines": {"logs/x": {
        |  "receiver": {"type": "parquet", "path": "/in"},
        |  "processors": [{"type": "filter", "where": "1=1"}],
        |  "exporters": [{"type": "logging"}]}}}""".stripMargin)
    val (c1, o1) = exec("validate", "--config", okCfg, "--distribution", distFile)
    assert(c1 == 0 && o1.contains("OK"), o1)

    // a config using a component the distribution was built WITHOUT
    // fails validation, naming the missing component — the ocb-built
    // binary simply does not contain it
    val badCfg = write(".json",
      """{"pipelines": {"logs/x": {
        |  "receiver": {"type": "otlp_pb_logs", "path": "/in"},
        |  "exporters": [{"type": "logging"}]}}}""".stripMargin)
    val (c2, o2) = exec("validate", "--config", badCfg, "--distribution", distFile)
    assert(c2 == 1 && o2.contains("receivers/otlp_pb_logs"), o2)

    // a manifest requesting a component the registry cannot provide
    // fails the BUILD (ocb's unresolvable module)
    val badMf = write(".yaml", "receivers: [no_such_receiver]\n")
    val (c3, o3) = exec("builder", "--manifest", badMf)
    assert(c3 == 1 && o3.contains("receivers/no_such_receiver"), o3)

    // a --set override steering a component OUTSIDE the distribution
    // faces the same gate — the overlay participates in the
    // distribution check, not just the build
    val (c4, o4) = exec("validate", "--config", okCfg,
      "--distribution", distFile,
      "--set", "pipelines.logs/x.receiver.type=otlp_pb_logs")
    assert(c4 == 1 && o4.contains("receivers/otlp_pb_logs"), o4)
  }

  test("validate: green config OK(0); unknown component and missing --config are errors(1)") {
    val good = write(".json",
      """{"pipelines": {"logs/v": {
        |  "receiver": {"type": "parquet", "path": "/in"},
        |  "exporters": [{"type": "logging"}]}}}""".stripMargin)
    val (c1, o1) = exec("validate", "--config", good)
    assert(c1 == 0 && o1.contains("OK"))

    val bad = write(".json",
      """{"pipelines": {"logs/v": {
        |  "receiver": {"type": "parquet", "path": "/in"},
        |  "exporters": [{"type": "no_such_exporter"}]}}}""".stripMargin)
    val (c2, o2) = exec("validate", "--config", bad)
    assert(c2 == 1 && o2.contains("unknown exporter"))

    val (c3, o3) = exec("validate")
    assert(c3 == 1 && o3.contains("--config"))

    val (c4, o4) = exec("no-such-command")
    assert(c4 == 1 && o4.contains("unknown command"))
  }

  test("print-config validates first and renders with credentials redacted") {
    val cfg = write(".json",
      """{"pipelines": {"logs/pc": {
        |  "receiver": {"type": "parquet", "path": "/in"},
        |  "exporters": [{"type": "otlp_http", "endpoint": "http://h:1",
        |    "signal": "logs", "auth": {"bearer_token": "cli-secret"}}]}}}"""
        .stripMargin)
    val (code, outStr) = exec("print-config", "--config", cfg)
    assert(code == 0)
    assert(outStr.contains("[REDACTED]") && !outStr.contains("cli-secret"))
    assert(outStr.contains("http://h:1"))
  }

  test("run executes the configured pipelines; a second --config overlay retunes the sink") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("cli_in").toString
    val outA = java.nio.file.Files.createTempDirectory("cli_outA").toString + "/a"
    val outB = java.nio.file.Files.createTempDirectory("cli_outB").toString + "/b"
    (1 to 7).map(i => (i.toLong, s"m$i")).toDF("id", "msg")
      .write.mode("overwrite").parquet(in)

    val base = write(".json",
      s"""{"pipelines": {"logs/cp": {
         |  "receiver": {"type": "parquet", "path": "$in"},
         |  "exporters": [{"type": "parquet", "path": "$outA"}]}}}""".stripMargin)
    val (c1, o1) = exec("run", "--config", base)
    assert(c1 == 0 && o1.contains("ran 1 pipeline(s)"))
    assert(spark.read.parquet(outA).count() == 7)

    // overlay ONLY the exporter path (recursive merge via fromUris)
    val overlay = write(".yaml",
      s"""pipelines:
         |  logs/cp:
         |    exporters:
         |      - {type: parquet, path: $outB}
         |""".stripMargin)
    val (c2, _) = exec("run", "--config", base, "--config", overlay)
    assert(c2 == 0)
    assert(spark.read.parquet(outB).count() == 7)
  }

  test("run pays the obsreport counting pass only when the catalog has a consumer; a failing sibling never stops the others, at any telemetry level") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("cli_gate_in").toString
    Seq((1L, "x"), (2L, "y")).toDF("id", "msg").write.mode("overwrite").parquet(in)
    def cfgFor(telemetry: String, out: String): String = write(".json",
      s"""{$telemetry"pipelines": {"logs/g": {
         |  "receiver": {"type": "parquet", "path": "$in"},
         |  "exporters": [{"type": "parquet", "path": "$out"}]}}}""".stripMargin)
    // count Spark jobs per run (the CLI shares this JVM's session):
    // obsreport's exact stats cost one dedicated counting job on top
    // of the export job — a config with NO telemetry address and NO
    // readers must not pay it (level basic is the DEFAULT, so plain
    // configs are exactly this case)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      def jobsOf(cfg: String): Int = {
        jobs.set(0)
        val (c, _) = exec("run", "--config", cfg)
        assert(c == 0)
        // listener events post asynchronously — wait for the count to
        // go quiet (two consecutive reads equal) before sampling
        var last = -1
        var waited = 0
        while (jobs.get() != last && waited < 5000) {
          last = jobs.get(); Thread.sleep(100); waited += 100
        }
        jobs.get()
      }
      val outPlain = java.nio.file.Files.createTempDirectory("cli_gp").toString + "/o"
      val outObs = java.nio.file.Files.createTempDirectory("cli_go").toString + "/o"
      val plainJobs = jobsOf(cfgFor("", outPlain))
      val obsJobs = jobsOf(cfgFor(
        """"service": {"telemetry": {"metrics": {"address": "localhost:0"}}}, """,
        outObs))
      assert(spark.read.parquet(outPlain).count() == 2)
      assert(spark.read.parquet(outObs).count() == 2)
      assert(obsJobs > plainJobs,
        s"served catalog must add the counting pass: $obsJobs vs $plainJobs")
    } finally spark.sparkContext.removeSparkListener(listener)

    // sibling discipline is NOT a telemetry-knob side effect: at level
    // none (the plain-run path) a failing pipeline still lets the
    // later-sorted sibling run, and the failure rethrows at the end
    val okOut = java.nio.file.Files.createTempDirectory("cli_sib").toString + "/ok"
    val blocked = write(".txt", "not a directory") // exporter path inside a FILE
    val sib = write(".json",
      s"""{"service": {"telemetry": {"metrics": {"level": "none"}}},
         |"pipelines": {
         |  "logs/a_fails": {
         |    "receiver": {"type": "parquet", "path": "$in"},
         |    "exporters": [{"type": "parquet", "path": "$blocked/sub"}]},
         |  "logs/b_runs": {
         |    "receiver": {"type": "parquet", "path": "$in"},
         |    "exporters": [{"type": "parquet", "path": "$okOut"}]}}}""".stripMargin)
    val bos = new java.io.ByteArrayOutputStream()
    val ps = new java.io.PrintStream(bos, true, "UTF-8")
    val code = Collector.execute(Seq("run", "--config", sib), ps)
    assert(code != 0, "the first pipeline's failure must surface")
    assert(spark.read.parquet(okOut).count() == 2,
      "the sibling after the failing pipeline must still have run")
  }

  test("run shuts extensions down when the data path fails — no leaked zpages server") {
    // the pipeline plan fails (nonexistent input); zpages started
    // before it and must be stopped by the failure path, or the
    // debug server leaks in the embedding JVM
    val cfg = write(".json",
      """{"extensions": {"zpages": {"port": 0}},
        |"service": {"extensions": ["zpages"]},
        |"pipelines": {"logs/fail": {
        |  "receiver": {"type": "parquet", "path": "/nonexistent_graft_cli"},
        |  "exporters": [{"type": "logging"}]}}}""".stripMargin)
    val bos = new java.io.ByteArrayOutputStream()
    val ps = new java.io.PrintStream(bos, true, "UTF-8")
    intercept[Exception] {
      Collector.execute(Seq("run", "--config", cfg), ps)
    }
    val outStr = bos.toString("UTF-8")
    val port = "zpages serving on localhost:(\\d+)".r
      .findFirstMatchIn(outStr).map(_.group(1).toInt)
      .getOrElse(fail(s"zpages never started: $outStr"))
    // the server must be DOWN: a fresh connection is refused
    intercept[java.io.IOException] {
      val c = java.net.URI.create(s"http://localhost:$port/debug/servicez")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      c.setConnectTimeout(2000)
      c.getResponseCode
    }
  }

  test("run serves the telemetry metrics address and stops it with the bracket; a bad address still shuts down clean") {
    import spark.implicits._
    val in = java.nio.file.Files.createTempDirectory("cli_tm_in").toString
    val outP = java.nio.file.Files.createTempDirectory("cli_tm_out").toString + "/o"
    Seq((1L, "x")).toDF("id", "msg").write.mode("overwrite").parquet(in)
    val cfg = write(".json",
      s"""{"service": {"telemetry": {"metrics": {"address": "localhost:0"}}},
         |"pipelines": {"logs/tm": {
         |  "receiver": {"type": "parquet", "path": "$in"},
         |  "exporters": [{"type": "parquet", "path": "$outP"}]}}}""".stripMargin)
    val (c, o) = exec("run", "--config", cfg)
    assert(c == 0)
    val port = "telemetry metrics on localhost:(\\d+)/metrics".r
      .findFirstMatchIn(o).map(_.group(1).toInt)
      .getOrElse(fail(s"telemetry server never started: $o"))
    // stopped with the bracket: a fresh connection is refused
    intercept[java.io.IOException] {
      val conn = java.net.URI.create(s"http://localhost:$port/metrics")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(2000)
      conn.getResponseCode
    }

    // a BAD address (port out of range parses as digits but cannot
    // bind) fails the run — inside the bracket, so extensions and
    // receivers still shut down instead of leaking
    val bad = write(".json",
      s"""{"extensions": {"zpages": {"port": 0}},
         |"service": {"extensions": ["zpages"],
         |  "telemetry": {"metrics": {"address": "localhost:99999"}}},
         |"pipelines": {"logs/tm2": {
         |  "receiver": {"type": "parquet", "path": "$in"},
         |  "exporters": [{"type": "logging"}]}}}""".stripMargin)
    val bos = new java.io.ByteArrayOutputStream()
    val ps = new java.io.PrintStream(bos, true, "UTF-8")
    // the bad bind surfaces as the CLI's config-error exit, after the
    // finally bracket has run
    assert(Collector.execute(Seq("run", "--config", bad), ps) == 1)
    val outStr = bos.toString("UTF-8")
    assert(outStr.contains("Error:"), outStr)
    val zport = "zpages serving on localhost:(\\d+)".r
      .findFirstMatchIn(outStr).map(_.group(1).toInt)
      .getOrElse(fail(s"zpages never started: $outStr"))
    intercept[java.io.IOException] {
      val conn = java.net.URI.create(s"http://localhost:$zport/debug/servicez")
        .toURL.openConnection().asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(2000)
      conn.getResponseCode
    }
  }
}
