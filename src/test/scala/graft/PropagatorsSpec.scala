package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Propagators
import graft.sources.Propagators.{B3, Composite, SpanContext, TraceContext}

/** service::telemetry::traces::propagators — W3C TraceContext + B3
  * codecs, the composite contract, config validation, and the live
  * receiver surface (extracted context rides the metadata sidecar). */
class PropagatorsSpec extends AnyFunSuite {

  private val tid = "4bf92f3577b34da6a3ce929d0e0e4736"
  private val sid = "00f067aa0ba902b7"

  test("W3C traceparent: valid forms extract, ff/zero-id/malformed refuse, case-insensitive") {
    assert(TraceContext.extract(Map("traceparent" -> s"00-$tid-$sid-01"))
      .contains(SpanContext(tid, sid, sampled = true)))
    assert(TraceContext.extract(Map("Traceparent" -> s"00-$tid-$sid-00"))
      .contains(SpanContext(tid, sid, sampled = false)))
    // a FUTURE version parses (W3C forward compatibility), ff does not
    assert(TraceContext.extract(Map("traceparent" -> s"cc-$tid-$sid-01")).isDefined)
    assert(TraceContext.extract(Map("traceparent" -> s"ff-$tid-$sid-01")).isEmpty)
    // §4.3: a future version may carry ADDITIONAL -delimited fields —
    // parse the known prefix, ignore the rest; version 00 may NOT
    assert(TraceContext.extract(
      Map("traceparent" -> s"cc-$tid-$sid-01-extrafield"))
      .contains(SpanContext(tid, sid, sampled = true)))
    assert(TraceContext.extract(
      Map("traceparent" -> s"00-$tid-$sid-01-extrafield")).isEmpty)
    // all-zero ids are invalid span contexts
    assert(TraceContext.extract(
      Map("traceparent" -> s"00-${"0" * 32}-$sid-01")).isEmpty)
    assert(TraceContext.extract(
      Map("traceparent" -> s"00-$tid-${"0" * 16}-01")).isEmpty)
    // uppercase hex / wrong lengths / missing header refuse
    assert(TraceContext.extract(
      Map("traceparent" -> s"00-${tid.toUpperCase}-$sid-01")).isEmpty)
    assert(TraceContext.extract(Map("traceparent" -> s"00-$tid-01")).isEmpty)
    assert(TraceContext.extract(Map.empty).isEmpty)
    // inject round-trips through extract
    val injected = TraceContext.inject(SpanContext(tid, sid, sampled = true))
    assert(injected == Map("traceparent" -> s"00-$tid-$sid-01"))
    assert(TraceContext.extract(injected).contains(SpanContext(tid, sid, true)))
  }

  test("B3: single header (2/3/4 part, debug, deny), multi headers, 64-bit pad, inject single") {
    // 3-part single: sampled states 0|1|d
    assert(B3.extract(Map("b3" -> s"$tid-$sid-1"))
      .contains(SpanContext(tid, sid, sampled = true)))
    assert(B3.extract(Map("b3" -> s"$tid-$sid-0"))
      .contains(SpanContext(tid, sid, sampled = false)))
    assert(B3.extract(Map("b3" -> s"$tid-$sid-d"))
      .contains(SpanContext(tid, sid, sampled = true)))
    // 2-part: context without a sampling decision
    assert(B3.extract(Map("b3" -> s"$tid-$sid"))
      .contains(SpanContext(tid, sid, sampled = false)))
    // 4-part (parent span id trailing) still extracts the first three
    assert(B3.extract(Map("b3" -> s"$tid-$sid-1-${"ab" * 8}"))
      .contains(SpanContext(tid, sid, sampled = true)))
    // the lone deny marker carries NO context
    assert(B3.extract(Map("b3" -> "0")).isEmpty)
    // 64-bit trace id left-pads to 128-bit
    val t64 = "80f198ee56343ba8"
    assert(B3.extract(Map("b3" -> s"$t64-$sid-1"))
      .contains(SpanContext("0" * 16 + t64, sid, sampled = true)))
    // multi-header form, flags:1 = debug = sampled
    assert(B3.extract(Map("X-B3-TraceId" -> tid, "X-B3-SpanId" -> sid,
      "X-B3-Sampled" -> "1")).contains(SpanContext(tid, sid, true)))
    assert(B3.extract(Map("x-b3-traceid" -> tid, "x-b3-spanid" -> sid,
      "x-b3-flags" -> "1")).contains(SpanContext(tid, sid, true)))
    assert(B3.extract(Map("x-b3-traceid" -> tid, "x-b3-spanid" -> sid))
      .contains(SpanContext(tid, sid, false)))
    // single wins over multi when both present (the b3.New preference)
    assert(B3.extract(Map("b3" -> s"$tid-$sid-0",
      "x-b3-traceid" -> ("9" * 32), "x-b3-spanid" -> sid,
      "x-b3-sampled" -> "1")).contains(SpanContext(tid, sid, false)))
    // a present single header DECIDES: its deny marker (or a
    // malformed value) must not fall through to the multi form and
    // resurrect a context the single header refused
    assert(B3.extract(Map("b3" -> "0",
      "x-b3-traceid" -> tid, "x-b3-spanid" -> sid,
      "x-b3-sampled" -> "1")).isEmpty)
    // trailing dash is MALFORMED, never a 2-part context (split keeps
    // trailing empties)
    assert(B3.extract(Map("b3" -> s"$tid-$sid-")).isEmpty)
    // inject writes the single form
    assert(B3.inject(SpanContext(tid, sid, sampled = true))
      == Map("b3" -> s"$tid-$sid-1"))
  }

  test("composite: later successful extract overrides, inject is the union, empty is a no-op") {
    val comp = Composite(Seq(TraceContext, B3))
    val w3c = s"00-${"1" * 32}-${"2" * 16}-00"
    val b3h = s"${"3" * 32}-${"4" * 16}-1"
    // both present: B3 (later) wins — each member updates the context
    assert(comp.extract(Map("traceparent" -> w3c, "b3" -> b3h))
      .contains(SpanContext("3" * 32, "4" * 16, sampled = true)))
    // only the earlier one present: its result stands
    assert(comp.extract(Map("traceparent" -> w3c))
      .contains(SpanContext("1" * 32, "2" * 16, sampled = false)))
    // inject: union of both encodings
    val inj = comp.inject(SpanContext(tid, sid, sampled = true))
    assert(inj == Map("traceparent" -> s"00-$tid-$sid-01",
      "b3" -> s"$tid-$sid-1"))
    assert(comp.fields == Seq("traceparent", "b3", "x-b3-traceid",
      "x-b3-spanid", "x-b3-sampled", "x-b3-flags"))
    // the empty composite extracts nothing and injects nothing
    assert(Composite(Nil).extract(Map("traceparent" -> w3c)).isEmpty)
    assert(Composite(Nil).inject(SpanContext(tid, sid, true)).isEmpty)
  }

  test("config surface: propagators list reaches the otlp_http receiver; unknown name refuses the document") {
    import graft.pipeline.ConfigLoader
    def doc(props: String) =
      s"""{"service": {"telemetry": {"traces": {"propagators": $props}}},
         |"pipelines": {"logs/p": {
         |  "receiver": {"type": "otlp_http", "port": 0, "spool": "/tmp/px",
         |    "include_metadata": true},
         |  "exporters": [{"type": "logging"}]}}}""".stripMargin
    val svc = ConfigLoader.fromJson(doc("""["tracecontext", "b3"]"""))
    val rx = svc.pipelines("logs/p").receiver
      .asInstanceOf[graft.pipeline.Pipeline.OtlpHttpServerReceiver]
    assert(rx.propagator.contains(Composite(Seq(TraceContext, B3))))
    // telemetry.go errUnsupportedPropagator: the whole document refuses
    intercept[IllegalArgumentException] {
      ConfigLoader.fromJson(doc("""["jaeger"]"""))
    }
    // no propagators block → none configured
    val bare = ConfigLoader.fromJson(
      """{"pipelines": {"logs/p": {
        |  "receiver": {"type": "otlp_http", "port": 0, "spool": "/tmp/px"},
        |  "exporters": [{"type": "logging"}]}}}""".stripMargin)
    assert(bare.pipelines("logs/p").receiver
      .asInstanceOf[graft.pipeline.Pipeline.OtlpHttpServerReceiver]
      .propagator.isEmpty)
    // DEAD config refuses loudly: propagators declared but no
    // receiver consumes them (no include_metadata otlp_http) would
    // run as a silent no-op otherwise
    val dead = intercept[IllegalArgumentException] {
      ConfigLoader.fromJson(
        """{"service": {"telemetry": {"traces": {"propagators": ["b3"]}}},
          |"pipelines": {"logs/p": {
          |  "receiver": {"type": "otlp_http", "port": 0, "spool": "/tmp/px"},
          |  "exporters": [{"type": "logging"}]}}}""".stripMargin)
    }
    assert(dead.getMessage.contains("no receiver consumes"), dead.getMessage)
  }

  test("extract never throws on hostile headers; any produced context carries well-formed ids (2000-seed fuzz)") {
    val comp = Propagators.fromConfig(Seq("tracecontext", "b3"))
    val rnd = new scala.util.Random(42)
    val alphabet = "0123456789abcdefABCDEF-—π\u0000 .:$ffx"
    val names = Seq("traceparent", "b3", "x-b3-traceid", "x-b3-spanid",
      "x-b3-sampled", "x-b3-flags")
    def hexOk(s: String, n: Int) =
      s.length == n && s.forall(c => "0123456789abcdef".contains(c))
    for (_ <- 1 to 2000) {
      val hdrs = names.filter(_ => rnd.nextBoolean()).map { n =>
        val len = rnd.nextInt(60)
        n -> Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
      }.toMap
      val got = comp.extract(hdrs) // must never throw
      got.foreach { sc =>
        assert(hexOk(sc.traceId, 32), s"bad traceId from $hdrs: $sc")
        assert(hexOk(sc.spanId, 16), s"bad spanId from $hdrs: $sc")
      }
    }
  }

  test("live receiver: configured propagators stamp the caller's trace context into the metadata sidecar") {
    val spark = TestSession.spark
    import spark.implicits._
    import graft.sources.{OtlpHttp, OtlpJsonSource}
    val spool = java.nio.file.Files.createTempDirectory("prop_meta").toString
    val rx = new OtlpHttp.OtlpHttpReceiver(0, spool, includeMetadata = true,
      propagator = Some(Propagators.fromConfig(Seq("tracecontext", "b3"))))
    try {
      val logs = OtlpJsonSource.parseLogs(Seq(
        """{"resourceLogs":[{"resource":{"attributes":[]},"scopeLogs":[{"scope":{},
          |"logRecords":[{"timeUnixNano":"1","body":{"stringValue":"m"}}]}]}]}"""
          .stripMargin.replace("\n", "")).toDF("json"))
      OtlpHttp.OtlpHttpExporter(s"http://localhost:${rx.boundPort}", "logs",
        headers = Map("traceparent" -> s"00-$tid-$sid-01")).export(logs)
      val meta = OtlpHttp.readSpoolMetadata(spool, "logs_pb")
      assert(meta.size == 1, meta.keys)
      val m = meta.values.head
      assert(m("trace.trace_id") == Seq(tid))
      assert(m("trace.span_id") == Seq(sid))
      assert(m("trace.sampled") == Seq("true"))
    } finally rx.stop()
  }
}
