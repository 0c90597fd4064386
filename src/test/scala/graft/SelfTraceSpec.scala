package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{ConfigLoader, Pipeline, Obsreport, SelfTrace, ZpagesServer}
import graft.pipeline.SelfTrace._

/** Internal self-tracing (reference service/telemetry.go +
  * otel_trace_sampler.go + zpagesextension tracez): sampler modes
  * config-reachable and semantics-pinned, pipeline runs record a
  * span tree, propagators feed remote parents through, tracez serves
  * it all live. */
class SelfTraceSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def ref(sampled: Boolean, remote: Boolean) =
    SpanRef("0af7651916cd43dd8448eb211c80319c", "b7ad6b7169203331",
      sampled, remote)

  test("sampler config: every generated_config shape parses; jaeger_remote and malformed shapes refuse loudly") {
    def parse(json: String): Sampler = {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = om.readValue(json, classOf[java.util.Map[String, Object]])
      import scala.jdk.CollectionConverters._
      SelfTrace.parseSampler(node.asScala.toMap)
    }
    assert(parse("""{"always_on": {}}""") == AlwaysOn)
    assert(parse("""{"always_off": {}}""") == AlwaysOff)
    assert(parse("""{"trace_id_ratio_based": {"ratio": 0.25}}""") ==
      TraceIdRatioBased(0.25))
    // unset ratio samples everything (generated_config default)
    assert(parse("""{"trace_id_ratio_based": {}}""") == TraceIdRatioBased(1.0))
    // parent_based with every variant, nested samplers
    assert(parse("""{"parent_based": {
        "root": {"trace_id_ratio_based": {"ratio": 0.5}},
        "remote_parent_sampled": {"always_on": {}},
        "remote_parent_not_sampled": {"always_off": {}},
        "local_parent_sampled": {"always_on": {}},
        "local_parent_not_sampled": {"trace_id_ratio_based": {"ratio": 0.1}}
      }}""") == ParentBased(TraceIdRatioBased(0.5), AlwaysOn, AlwaysOff,
        AlwaysOn, TraceIdRatioBased(0.1)))
    // unset variants take the otel ParentBased defaults
    assert(parse("""{"parent_based": {}}""") ==
      ParentBased(AlwaysOn, AlwaysOn, AlwaysOff, AlwaysOn, AlwaysOff))
    // refusals: jaeger_remote (needs a live endpoint), unknown kind,
    // two kinds at once, bad ratio
    val e1 = intercept[IllegalArgumentException](parse("""{"jaeger_remote": {}}"""))
    assert(e1.getMessage.contains("remote sampling endpoint"))
    intercept[IllegalArgumentException](parse("""{"bogus": {}}"""))
    intercept[IllegalArgumentException](
      parse("""{"always_on": {}, "always_off": {}}"""))
    intercept[IllegalArgumentException](
      parse("""{"trace_id_ratio_based": {"ratio": 1.5}}"""))

    // config-reachable: service::telemetry::traces::sampler
    val svc = ConfigLoader.fromJson("""{
      "service": {"telemetry": {"traces": {"sampler":
        {"parent_based": {"root": {"always_off": {}}}}}}},
      "pipelines": {"logs/s": {
        "receiver": {"type": "parquet", "path": "IGNORED"},
        "exporters": [{"type": "logging"}]}}}""")
    assert(svc.telemetrySampler ==
      ParentBased(AlwaysOff, AlwaysOn, AlwaysOff, AlwaysOn, AlwaysOff))
    // absent = the reference's record-only provider default
    val dflt = ConfigLoader.fromJson("""{
      "pipelines": {"logs/s": {
        "receiver": {"type": "parquet", "path": "IGNORED"},
        "exporters": [{"type": "logging"}]}}}""")
    assert(dflt.telemetrySampler == DefaultAlwaysRecord)
  }

  test("the alwaysRecord default pins the reference's SHIPPED matrix, including the duplicate-option quirk") {
    val s = DefaultAlwaysRecord
    val t = "0af7651916cd43dd8448eb211c80319c"
    // root: record-only (spans feed zpages, sampled flag stays off)
    assert(s.shouldSample(None, t) == RecordOnly)
    // remote parent sampled: RecordOnly — otel_trace_sampler.go:23
    // sets AlwaysSample but line 27 passes WithRemoteParentSampled a
    // SECOND time (surely meant to be WithLocalParentNotSampled) and
    // otel-go applies options in order, so the record sampler wins
    assert(s.shouldSample(Some(ref(sampled = true, remote = true)), t) == RecordOnly)
    assert(s.shouldSample(Some(ref(sampled = false, remote = true)), t) == RecordOnly)
    // local parent sampled: AlwaysSample (line 26, not overridden)
    assert(s.shouldSample(Some(ref(sampled = true, remote = false)), t) == RecordAndSample)
    // local parent NOT sampled: never received the record sampler —
    // ParentBased default NeverSample ⇒ Drop (the quirk's victim)
    assert(s.shouldSample(Some(ref(sampled = false, remote = false)), t) == Drop)
  }

  test("TraceIdRatioBased is a pure function of the trace id; parent_based routes by (remote, sampled)") {
    val r = TraceIdRatioBased(0.5)
    for (i <- 0 until 200) {
      val tid = f"$i%032x"
      assert(r.shouldSample(None, tid) == r.shouldSample(None, tid)) // deterministic
    }
    assert(TraceIdRatioBased(0.0).shouldSample(None, "ff" * 16) == Drop)
    assert(TraceIdRatioBased(1.0).shouldSample(None, "ff" * 16) == RecordAndSample)
    // a high trace id (leading bits set) drops under 0.5
    assert(TraceIdRatioBased(0.5).shouldSample(None, "f" * 32) == Drop)
    assert(TraceIdRatioBased(0.5).shouldSample(None, "0" * 32) == RecordAndSample)
    val pb = ParentBased(AlwaysOff, localParentSampled = AlwaysOn)
    assert(pb.shouldSample(None, "0" * 32) == Drop)
    assert(pb.shouldSample(Some(ref(sampled = true, remote = false)), "0" * 32)
      == RecordAndSample)
  }

  test("tracer store: buckets, errors, bounded samples, running spans; AlwaysOff records nothing") {
    // injectable clock: drive durations into chosen latency buckets
    var clock = 1000000000000L
    val tr = new Tracer(AlwaysOn, maxSamplesPerName = 3,
      nowNano = () => clock)
    val h = tr.start("op")
    assert(h.recording && h.ref.sampled)
    // running visible before end
    assert(tr.snapshot.find(_.name == "op").get.running == 1)
    clock += 5000 // 5µs → bucket 0 (>0us)
    h.end()
    val row0 = tr.snapshot.find(_.name == "op").get
    assert(row0.running == 0 && row0.bucketCounts(0) == 1)
    // one span per bucket boundary class
    for ((d, b) <- Seq(50000L -> 1, 500000L -> 2, 5000000L -> 3,
      50000000L -> 4, 500000000L -> 5, 5000000000L -> 6,
      50000000000L -> 7, 500000000000L -> 8)) {
      tr.record(s"bucket", h.ref, clock, clock + d)
      assert(tr.snapshot.find(_.name == "bucket").get.bucketCounts(b) == 1,
        s"duration $d expected bucket $b")
    }
    // errors count separately and keep their own bounded samples
    for (i <- 0 until 5)
      tr.record("op", h.ref, clock, clock + 1000, error = Some(s"boom$i"))
    val row = tr.snapshot.find(_.name == "op").get
    assert(row.errors == 5)
    assert(row.errorSamples.length == 3) // bounded
    assert(row.errorSamples.last.error.contains("boom4")) // most recent kept
    // sample ring bounded too
    for (_ <- 0 until 10) { val x = tr.start("op"); clock += 10; x.end() }
    assert(tr.snapshot.find(_.name == "op").get.samples.length == 3)
    // double-end is a no-op (no double-count)
    val h2 = tr.start("once"); h2.end(); h2.end()
    assert(tr.snapshot.find(_.name == "once").get.bucketCounts.sum == 1)

    // AlwaysOff: nothing recorded, handle non-recording, context unsampled
    val off = new Tracer(AlwaysOff)
    val hoff = off.start("dropped")
    assert(!hoff.recording && !hoff.ref.sampled)
    hoff.end()
    assert(off.snapshot.isEmpty)
  }

  test("pipeline run records a span tree: root + receiver/processor/exporter/materialize children with counts; error status on failure") {
    import Pipeline._
    val dir = java.nio.file.Files.createTempDirectory("selftrace_in").toString
    spark.range(100).toDF("id").write.mode("overwrite").parquet(dir)
    val tr = new Tracer() // default record-only sampler — tracez-visible
    val reg = new Obsreport.Registry
    val p = PipelineDef(
      ParquetReceiver(dir),
      processors = Seq(df => df.filter(org.apache.spark.sql.functions.col("id") < 40)),
      exporters = Seq(new CollectingExporter),
      receiverIds = Seq(("parquet", "file")),
      processorIds = Seq("filter"),
      exporterIds = Seq("collect"))
    p.runObsreport(spark, "logs/t", reg, tracer = tr)
    val rows = tr.snapshot
    val names = rows.map(_.name)
    assert(names.contains("pipeline/logs/t"))
    assert(names.contains("receiver/parquet"))
    assert(names.contains("processor/filter"))
    assert(names.contains("exporter/collect"))
    assert(names.contains("pipeline/logs/t/materialize"))
    // one trace: every child carries the root's trace id and parent
    val root = rows.find(_.name == "pipeline/logs/t").get.samples.head
    assert(root.parentSpanId.isEmpty)
    for (n <- names.filterNot(_ == "pipeline/logs/t")) {
      val s = rows.find(_.name == n).get.samples.head
      assert(s.traceId == root.traceId, s"$n trace id")
      assert(s.parentSpanId.contains(root.spanId), s"$n parent")
      assert(s.startUnixNano >= root.startUnixNano &&
        s.endUnixNano <= root.endUnixNano, s"$n not inside the root span")
    }
    // row counts ride as attributes
    assert(rows.find(_.name == "receiver/parquet").get
      .samples.head.attrs("items") == "100")
    val proc = rows.find(_.name == "processor/filter").get.samples.head
    assert(proc.attrs("in") == "100" && proc.attrs("out") == "40")
    assert(rows.find(_.name == "exporter/collect").get
      .samples.head.attrs("items") == "40")

    // failure path: exporter throws → exporter child and root carry
    // ERROR status; the run still rethrows (telemetry never swallows)
    val tr2 = new Tracer()
    val bad = PipelineDef(ParquetReceiver(dir),
      exporters = Seq(new Exporter {
        def export(df: org.apache.spark.sql.DataFrame): Unit =
          throw new RuntimeException("sink down")
      }),
      receiverIds = Seq(("parquet", "file")), exporterIds = Seq("bad"))
    intercept[RuntimeException] {
      bad.runObsreport(spark, "logs/f", new Obsreport.Registry, tracer = tr2)
    }
    val rootRow = tr2.snapshot.find(_.name == "pipeline/logs/f").get
    assert(rootRow.errors == 1)
    assert(rootRow.errorSamples.head.error.get.contains("sink down"))
    val expRow = tr2.snapshot.find(_.name == "exporter/bad").get
    assert(expRow.errors == 1)

    // runTraced (the plain-config path): root + exporter child only
    val tr3 = new Tracer()
    p.runTraced(spark, "logs/plain", tr3)
    val n3 = tr3.snapshot.map(_.name)
    assert(n3 == Seq("exporter/collect", "pipeline/logs/plain"))
  }

  test("propagators feed remote parents: an extracted traceparent routes the sampler's remote modes and stamps the trace id") {
    import graft.sources.Propagators
    val ctx = Propagators.TraceContext.extract(Map(
      "traceparent" ->
        "00-0af7651916cd43dd8448eb211c80319c-b7ad6b7169203331-01")).get
    val parent = SelfTrace.fromPropagated(ctx)
    assert(parent.remote && parent.sampled)
    // default sampler: remote-parent-sampled ⇒ RecordOnly (the quirk)
    val tr = new Tracer()
    val h = tr.start("pipeline/remote", Some(parent))
    assert(h.recording && !h.ref.sampled)
    assert(h.ref.traceId == "0af7651916cd43dd8448eb211c80319c")
    h.end()
    val span = tr.snapshot.head.samples.head
    assert(span.traceId == ctx.traceId)
    assert(span.parentSpanId.contains(ctx.spanId))
    // a sampler configured to honor sampled remote parents samples on
    val tr2 = new Tracer(ParentBased(AlwaysOff))
    assert(tr2.start("x", Some(parent)).ref.sampled)
    // remote NOT sampled + default variants: dropped
    val notSampled = parent.copy(sampled = false)
    assert(!tr2.start("y", Some(notSampled)).recording)
  }

  test("tracez zpage serves the span tree live: counts, buckets, samples, sampler description; absent tracer serves 404") {
    import Pipeline._
    val dir = java.nio.file.Files.createTempDirectory("tracez_in").toString
    spark.range(10).toDF("id").write.mode("overwrite").parquet(dir)
    val tr = new Tracer()
    val reg = new Obsreport.Registry
    val svc = Service(Map("logs/z" -> PipelineDef(
      ParquetReceiver(dir), exporters = Seq(new CollectingExporter),
      receiverIds = Seq(("parquet", "file")), exporterIds = Seq("collect"))))
    svc.pipelines("logs/z").runObsreport(spark, "logs/z", reg, tracer = tr)
    val running = tr.start("pipeline/inflight") // stays running
    val zp = new ZpagesServer(svc, spark, tracer = tr)
    try {
      val conn = new java.net.URL(
        s"http://localhost:${zp.boundPort}/debug/tracez")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode == 200)
      val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
      assert(body.contains("pipeline/logs/z"))
      assert(body.contains("exporter/collect"))
      assert(body.contains("pipeline/inflight")) // running span visible
      assert(body.contains("Always record sampler")) // the default's description
      assert(body.contains(">10ms")) // the bucket header row
      // servicez links to tracez when the store is wired
      val c2 = new java.net.URL(
        s"http://localhost:${zp.boundPort}/debug/servicez")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      val b2 = new String(c2.getInputStream.readAllBytes(), "UTF-8")
      assert(b2.contains("/debug/tracez"))
    } finally { running.end(); zp.stop() }

    // no tracer wired → no tracez page (the extension-not-registered shape)
    val zp2 = new ZpagesServer(svc, spark)
    try {
      val conn = new java.net.URL(
        s"http://localhost:${zp2.boundPort}/debug/tracez")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode == 404)
    } finally zp2.stop()

    // the zpages EXTENSION binds the tracer through (the CLI's path)
    val ext = new graft.pipeline.Extensions.ZpagesExtension(0)
    ext.bind(svc, spark, tracer = tr)
    try {
      val conn = new java.net.URL(
        s"http://localhost:${ext.boundPort}/debug/tracez")
        .openConnection().asInstanceOf[java.net.HttpURLConnection]
      assert(conn.getResponseCode == 200)
      val b = new String(conn.getInputStream.readAllBytes(), "UTF-8")
      assert(b.contains("pipeline/logs/z"))
    } finally ext.shutdown()
  }
}
