package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ottl

/** Every OTTL mapping in [[graft.operators.Ottl]] evaluates with the
  * reference language's semantics (editors over maps, converters over
  * scalars). */
class OttlSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private lazy val df = Seq(
    ("Hello World", Map("a" -> "1", "b" -> "22", "secret" -> "xyz"),
      """{"k": 41, "s": "v"}""", 1700000000123456789L)
  ).toDF("msg", "attrs", "js", "ts_ns")

  test("editors: delete/keep/truncate/replace/limit") {
    val r = df.select(
      Ottl.deleteKey(col("attrs"), "secret").as("del"),
      Ottl.keepKeys(col("attrs"), Seq("a")).as("keep"),
      Ottl.truncateAll(col("attrs"), 1).as("trunc"),
      Ottl.replacePattern(col("msg"), "World", "OTTL").as("rep"),
      Ottl.replaceAllPatterns(col("attrs"), "\\d", "#").as("repall"),
      Ottl.limitKeys(col("attrs"), 2).as("lim")).head()
    assert(r.getAs[Map[String, String]]("del") == Map("a" -> "1", "b" -> "22"))
    assert(r.getAs[Map[String, String]]("keep") == Map("a" -> "1"))
    assert(r.getAs[Map[String, String]]("trunc")("b") == "2")
    assert(r.getAs[String]("rep") == "Hello OTTL")
    assert(r.getAs[Map[String, String]]("repall")("b") == "##")
    assert(r.getAs[Map[String, String]]("lim").keySet == Set("a", "b"))
  }

  test("converters: patterns/kv/base64/hex/math/time-of-day/arrays") {
    val r = df.select(
      Ottl.extractPatterns(col("msg"), "(\\w+) (\\w+)",
        Seq("first" -> 1, "second" -> 2)).as("pats"),
      Ottl.parseKeyValue(lit("a=1;b=2"), ";", "=").as("kv"),
      Ottl.toKeyValueString(col("attrs"), ",", "=").as("kvs"),
      Ottl.base64Encode(col("msg").cast("binary")).as("b64"),
      Ottl.base64Decode(Ottl.base64Encode(col("msg").cast("binary")))
        .cast("string").as("b64rt"),
      Ottl.intToHex(lit(255L)).as("hex"),
      Ottl.logOttl(lit(math.E)).as("ln"),
      Ottl.sqrtOttl(lit(9.0)).as("sq"),
      Ottl.hourOfDay(col("ts_ns")).as("hh"),
      Ottl.minuteOfHour(col("ts_ns")).as("mm"),
      Ottl.secondOfMinute(col("ts_ns")).as("ss"),
      Ottl.sortArr(array(lit(3), lit(1), lit(2))).as("sorted"),
      Ottl.uniqueArr(array(lit(1), lit(1), lit(2))).as("uniq")).head()
    assert(r.getAs[Map[String, String]]("pats") == Map("first" -> "Hello", "second" -> "World"))
    assert(r.getAs[Map[String, String]]("kv") == Map("a" -> "1", "b" -> "2"))
    assert(r.getAs[String]("kvs") == "a=1,b=22,secret=xyz")
    assert(r.getAs[String]("b64rt") == "Hello World")
    assert(r.getAs[String]("hex") == "ff") // hex(long) strips leading zeros
    assert(math.abs(r.getAs[Double]("ln") - 1.0) < 1e-12)
    assert(r.getAs[Double]("sq") == 3.0)
    // 1700000000123456789 ns = 2023-11-14T22:13:20.123Z
    assert(r.getAs[Int]("hh") == 22 && r.getAs[Int]("mm") == 13 && r.getAs[Int]("ss") == 20)
    // boundary exactness: epoch-ns exceeds 2^53, so naive double
    // division rounds ...19.9999999 up to :20 — pmod-first must not
    val b = df.select(
      Ottl.secondOfMinute(lit(1699999999999999900L)).as("ss"),
      Ottl.minuteOfHour(lit(1699999999999999900L)).as("mm")).head()
    assert(b.getAs[Int]("ss") == 19 && b.getAs[Int]("mm") == 13)
    assert(r.getAs[scala.collection.Seq[Int]]("sorted").toSeq == Seq(1, 2, 3))
    assert(r.getAs[scala.collection.Seq[Int]]("uniq").toSeq == Seq(1, 2))
    val u = df.select(
      Ottl.urlPart(lit("https://api.example.com/v1/traces?svc=web&env=prod"), "HOST").as("host"),
      Ottl.urlPart(lit("https://api.example.com/v1/traces?svc=web&env=prod"), "PATH").as("path"),
      Ottl.urlPart(lit("https://api.example.com/v1/traces?svc=web&env=prod"), "QUERY:svc").as("svc")).head()
    assert(u.getString(0) == "api.example.com" && u.getString(1) == "/v1/traces" &&
      u.getString(2) == "web")
  }

  test("FNV converter is real FNV-1a 64 (spec test vectors)") {
    val r = Seq(("", "a", "foobar")).toDF("e", "a", "f").select(
      Ottl.fnvOf(col("e")).as("he"),
      Ottl.fnvOf(col("a")).as("ha"),
      Ottl.fnvOf(col("f")).as("hf")).head()
    // published FNV-1a 64 vectors (offset basis; "a"; "foobar")
    assert(r.getAs[Long]("he") == 0xcbf29ce484222325L)
    assert(r.getAs[Long]("ha") == 0xaf63dc4c8601ec8cL)
    assert(r.getAs[Long]("hf") == 0x85944171f73967e8L)
  }

  test("Flatten: nested struct attributes become dotted keys") {
    val nested = Seq(("x", 1, "deep")).toDF("top0", "n0", "s0")
      .select(struct(col("top0").as("top"),
        struct(col("n0").as("n"),
          struct(col("s0").as("s")).as("inner")).as("obj")).as("attrs"))
    val schema = nested.schema("attrs").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val got = nested.select(Ottl.flatten(col("attrs"), schema).as("m"))
      .head().getAs[Map[String, String]]("m")
    assert(got == Map("top" -> "x", "obj.n" -> "1", "obj.inner.s" -> "deep"))
  }

  test("ParseCSV: header-named map with a custom delimiter") {
    val got = Seq("alice;30;nyc").toDF("line")
      .select(Ottl.parseCsv(col("line"), Seq("name", "age", "city"), ";").as("m"))
      .head().getAs[Map[String, String]]("m")
    assert(got == Map("name" -> "alice", "age" -> "30", "city" -> "nyc"))
  }

  test("converters: string/number/hash/json/time functions") {
    val r = df.select(
      Ottl.concatWs("-", col("msg"), lit("x")).as("cat"),
      Ottl.splitStr(col("msg"), " ").as("sp"),
      Ottl.substringOttl(col("msg"), 0, 5).as("sub"),
      Ottl.toInt(lit("42")).as("i"),
      Ottl.isMatch(col("msg"), "^Hello").as("m"),
      Ottl.sha256Of(lit("abc")).as("sha"),
      Ottl.parseJsonField(col("js"), "k").as("jk"),
      Ottl.convertCase(col("msg"), "upper").as("uc"),
      Ottl.len(col("msg")).as("n"),
      Ottl.nanosToSeconds(col("ts_ns")).as("secs"),
      Ottl.default(lit(null).cast("string"), lit("dflt")).as("d")).head()
    assert(r.getAs[String]("cat") == "Hello World-x")
    assert(r.getSeq[String](r.fieldIndex("sp")).toSeq == Seq("Hello", "World"))
    assert(r.getAs[String]("sub") == "Hello")
    assert(r.getAs[Long]("i") == 42L)
    assert(r.getAs[Boolean]("m"))
    assert(r.getAs[String]("sha") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(r.getAs[String]("jk") == "41")
    assert(r.getAs[String]("uc") == "HELLO WORLD")
    assert(r.getAs[Int]("n") == 11)
    assert(math.abs(r.getAs[Double]("secs") - 1.700000000123456789e9) < 1)
    assert(r.getAs[String]("d") == "dflt")
  }

  test("editors: merge_maps strategies and append") {
    val r = df.select(
      Ottl.mergeMaps(col("attrs"), map(lit("a"), lit("9"), lit("z"), lit("26")),
        "upsert").as("up"),
      Ottl.mergeMaps(col("attrs"), map(lit("a"), lit("9"), lit("z"), lit("26")),
        "insert").as("ins"),
      Ottl.append(array(lit("x")), lit("y")).as("app"),
      Ottl.append(lit(null).cast("array<string>"), lit("y")).as("app_null")).head()
    assert(r.getAs[Map[String, String]]("up") ==
      Map("a" -> "9", "b" -> "22", "secret" -> "xyz", "z" -> "26"))
    assert(r.getAs[Map[String, String]]("ins") ==
      Map("a" -> "1", "b" -> "22", "secret" -> "xyz", "z" -> "26"))
    assert(r.getSeq[String](r.fieldIndex("app")).toSeq == Seq("x", "y"))
    assert(r.getSeq[String](r.fieldIndex("app_null")).toSeq == Seq("y"))
    intercept[IllegalArgumentException] {
      Ottl.mergeMaps(col("attrs"), col("attrs"), "replace")
    }
  }

  test("Duration converter: time.ParseDuration vectors, codegen'd, NULL on malformed") {
    val vectors = Seq(
      "0" -> 0L, "1h" -> 3600000000000L, "1h30m" -> 5400000000000L,
      "-1.5h" -> -5400000000000L, "250ms" -> 250000000L,
      "2h45m10s500ms" -> 9910500000000L, "100ns" -> 100L,
      "1.5us" -> 1500L, "3µs" -> 3000L, "+2m" -> 120000000000L)
    val df2 = vectors.map(_._1).toDF("d")
    val got = df2.select(col("d"), Ottl.duration(col("d")).as("ns"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    vectors.foreach { case (s, want) => assert(got(s) == want, s) }
    // malformed inputs degrade to NULL (error_mode=ignore), never throw
    val bad = Seq("abc", "1x", "h", "1.2.3s", "5 m", "").toDF("d")
      .select(Ottl.duration(col("d")).as("ns")).collect()
    assert(bad.forall(_.isNullAt(0)), bad.mkString(","))
    // the kernel call stays inside whole-stage codegen (a non-local
    // source — a local Seq folds to LocalTableScan at optimize time)
    val plan = spark.range(8)
      .select(Ottl.duration(concat(col("id").cast("string"), lit("s"))))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(") || plan.contains("WholeStageCodegen"), plan)
  }

  test("Time converter: ctime format parse to timestamp and unix nanos") {
    val r = Seq(("2024-03-05 17:30:45", "05/Mar/2024:17:30:45 +0000"))
      .toDF("iso", "clf")
      .select(
        Ottl.timeUnixNano(col("iso"), "%Y-%m-%d %H:%M:%S").as("ns"),
        Ottl.time(col("clf"), "%d/%b/%Y:%T %z").as("ts"))
      .head()
    assert(r.getLong(0) == 1709659845000000000L)
    assert(r.getTimestamp(1).toInstant.getEpochSecond == 1709659845L)
    // unknown directive fails at PLAN time with the directive named
    val e = intercept[IllegalArgumentException] {
      Ottl.ctimeToJavaPattern("%Y-%Q")
    }
    assert(e.getMessage.contains("%Q"))
  }

  test("calendar accessors and Format") {
    // 2024-03-05 is a Tuesday → Go weekday 2
    val r = df.select(
      Ottl.yearOf(Ottl.timeFromUnixNano(lit(1709659845000000000L))).as("y"),
      Ottl.monthOf(Ottl.timeFromUnixNano(lit(1709659845000000000L))).as("mo"),
      Ottl.dayOf(Ottl.timeFromUnixNano(lit(1709659845000000000L))).as("d"),
      Ottl.weekdayOf(Ottl.timeFromUnixNano(lit(1709659845000000000L))).as("wd"),
      Ottl.format("%s=%d", lit("sev"), lit(17)).as("f")).head()
    assert(r.getAs[Int]("y") == 2024 && r.getAs[Int]("mo") == 3 &&
      r.getAs[Int]("d") == 5 && r.getAs[Int]("wd") == 2)
    assert(r.getAs[String]("f") == "sev=17")
  }

  test("context paths address record, scope, and resource levels") {
    val logRow = Seq((
      "payment failed", 17, Map("http.route" -> "/pay", "retry" -> "2"),
      Map("service.name" -> "api", "internal.tag" -> "x"),
      "graft-instr", "1a2b"))
      .toDF("body", "severity_number", "attributes",
        "resource_attributes", "scope_name", "trace_id")
    // reads at all three levels resolve to the flattened columns
    val r = logRow.select(
      Ottl.path("body").as("b"),
      Ottl.path("severity_number").as("sev"),
      Ottl.path("""attributes["http.route"]""").as("route"),
      Ottl.path("""resource.attributes["service.name"]""").as("svc"),
      Ottl.path("instrumentation_scope.name").as("scope"),
      Ottl.path("scope.name").as("scope2"),
      Ottl.path("trace_id.string").as("tid")).head()
    assert(r.getAs[String]("b") == "payment failed")
    assert(r.getAs[Int]("sev") == 17)
    assert(r.getAs[String]("route") == "/pay")
    assert(r.getAs[String]("svc") == "api")
    assert(r.getAs[String]("scope") == "graft-instr")
    assert(r.getAs[String]("scope2") == "graft-instr")
    assert(r.getAs[String]("tid") == "1a2b")

    // statement-level writes: set into maps at record AND resource
    // level, set a scope field, delete a resource attribute
    val out = Ottl.deleteAtPath(
      Ottl.setPath(
        Ottl.setPath(
          Ottl.setPath(logRow, """resource.attributes["deployment"]""", lit("prod")),
          """attributes["sampled"]""", lit("true")),
        "scope.name", lit("graft-renamed")),
      "resource.attributes", "internal.tag").head()
    val resAttrs = out.getAs[Map[String, String]]("resource_attributes")
    assert(resAttrs("deployment") == "prod" && !resAttrs.contains("internal.tag"))
    assert(resAttrs("service.name") == "api")
    assert(out.getAs[Map[String, String]]("attributes")("sampled") == "true")
    assert(out.getAs[String]("scope_name") == "graft-renamed")

    // datapoint context: the enclosing metric's flattened fields
    val point = Seq(("req_total", "sum", "1", 4.0))
      .toDF("metric_name", "metric_type", "unit", "value")
      .select(Ottl.path("metric.name").as("n"), Ottl.path("metric.type").as("t"),
        Ottl.path("metric.unit").as("u")).head()
    assert(point.getString(0) == "req_total" && point.getString(1) == "sum" &&
      point.getString(2) == "1")

    // bad paths fail at PLAN time with the path named — config
    // validation, not a runtime surprise
    assert(intercept[IllegalArgumentException] {
      Ottl.setPath(logRow, "resource.weird", lit(1))
    }.getMessage.contains("resource.weird"))
    assert(intercept[IllegalArgumentException] {
      Ottl.deleteAtPath(logRow, "body", "k")
    }.getMessage.contains("not an OTTL map path"))
  }

  test("spanevent and link contexts: statement-level reads, sets, and deletes over the exploded frames") {
    import graft.sources.OtlpJsonSource
    // one span with an event and a link, through the real source path
    val req =
      """{"resourceSpans":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"api"}}]},
        |"scopeSpans":[{"scope":{"name":"graft"},"spans":[{
        |"traceId":"t1","spanId":"s1","name":"op","kind":2,
        |"startTimeUnixNano":"100","endTimeUnixNano":"200",
        |"status":{"code":1,"message":"ok"},
        |"attributes":[],
        |"events":[{"timeUnixNano":"150","name":"exception",
        |  "attributes":[{"key":"exception.type","value":{"stringValue":"IOError"}},
        |               {"key":"exception.stacktrace","value":{"stringValue":"at ..."}}]}],
        |"links":[{"traceId":"lt9","spanId":"ls9","traceState":"w3c=1",
        |  "attributes":[{"key":"rel","value":{"stringValue":"follows"}}]}]}]}]}]}"""
        .stripMargin.replaceAll("\n", "")
    val events = OtlpJsonSource.parseSpanEvents(Seq(req).toDF("json"))
    val links = OtlpJsonSource.parseSpanLinks(Seq(req).toDF("json"))

    // spanevent context reads: event fields AND the owning span
    val er = events.select(
      Ottl.path("spanevent.name").as("n"),
      Ottl.path("spanevent.time_unix_nano").as("t"),
      Ottl.path("""spanevent.attributes["exception.type"]""").as("et"),
      Ottl.path("span.span_id").as("own")).head()
    assert(er.getAs[String]("n") == "exception")
    assert(er.getAs[Long]("t") == 150L)
    assert(er.getAs[String]("et") == "IOError")
    assert(er.getAs[String]("own") == "s1")

    // spanevent statement-level set + delete (the transform
    // processor's `context: spanevent` statements): rename the event,
    // stamp an attribute, drop the stacktrace
    val eOut = Ottl.deleteAtPath(
      Ottl.setPath(
        Ottl.setPath(events, "spanevent.name", lit("exception.redacted")),
        """spanevent.attributes["handled"]""", lit("true")),
      "spanevent.attributes", "exception.stacktrace").head()
    assert(eOut.getAs[String]("name") == "exception.redacted")
    val eAttrs = eOut.getAs[Map[String, String]]("attributes")
    assert(eAttrs("handled") == "true" && !eAttrs.contains("exception.stacktrace"))
    assert(eAttrs("exception.type") == "IOError")

    // link context: `link.trace_id` is the LINKED trace, the owning
    // span stays addressable via `span.`
    val lr = links.select(
      Ottl.path("link.trace_id").as("lt"),
      Ottl.path("link.span_id").as("ls"),
      Ottl.path("link.trace_state").as("st"),
      Ottl.path("""link.attributes["rel"]""").as("rel"),
      Ottl.path("span.trace_id").as("own")).head()
    assert(lr.getAs[String]("lt") == "lt9" && lr.getAs[String]("ls") == "ls9")
    assert(lr.getAs[String]("st") == "w3c=1")
    assert(lr.getAs[String]("rel") == "follows")
    assert(lr.getAs[String]("own") == "t1")

    val lOut = Ottl.deleteAtPath(
      Ottl.setPath(links, "link.trace_state", lit("")),
      "link.attributes", "rel").head()
    assert(lOut.getAs[String]("linked_trace_state") == "")
    assert(!lOut.getAs[Map[String, String]]("attributes").contains("rel"))
  }

  test("timeFromUnixNano lands every input in the RIGHT microsecond (exact integer division)") {
    // the double-division formulation spaced ~256 ns apart at
    // current-epoch magnitudes — ~12% of inputs truncated into the
    // wrong µs. Sweep a dense grid of awkward nanos around now-ish
    // epochs plus pre-epoch values, and demand unix_micros equals the
    // driver's Math.floorDiv exactly.
    val base = 1754000000000000000L // ~2025-08, where doubles space 256 ns
    val vecs: Seq[Long] =
      (0 until 20000).map(i => base + i.toLong * 937L + (i % 1000)) ++
      (0 until 2000).map(i => -621355968000000000L + i.toLong * 777L) ++
      Seq(-1L, -999L, -1000L, -1001L, 0L, 999L, 1000L, 1754000001999999999L)
    val got = vecs.toDF("ns")
      .select(col("ns"), Ottl.unixMicro(Ottl.timeFromUnixNano(col("ns"))).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val bad = got.filter { case (ns, us) => us != Math.floorDiv(ns, 1000L) }
    assert(bad.isEmpty,
      s"${bad.length}/${got.length} in the wrong µs, e.g. ${bad.take(3).mkString(", ")}")
    // and ns→ts→ns round-trips exactly on µs-aligned inputs
    val rt = Seq(base, base + 123456000L).toDF("ns")
      .select(Ottl.unixNano(Ottl.timeFromUnixNano(col("ns"))).as("back"), col("ns"))
      .collect()
    rt.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("UnixNano family, duration accessors, and TruncateTime") {
    val r = df.select(
      Ottl.unixNano(Ottl.timeFromUnixNano(col("ts_ns"))).as("ns"),
      Ottl.unixMilli(Ottl.timeFromUnixNano(col("ts_ns"))).as("ms"),
      Ottl.unixSeconds(Ottl.timeFromUnixNano(col("ts_ns"))).as("s"),
      Ottl.hours(lit(5400000000000L)).as("h"),
      Ottl.minutes(lit(5400000000000L)).as("m"),
      Ottl.seconds(lit(1500000000L)).as("sec"),
      Ottl.truncateTime(col("ts_ns"), 3600000000000L).as("trunc")).head()
    // ns→timestamp→ns round-trips at µs resolution (the type's limit)
    assert(r.getAs[Long]("ns") == 1700000000123456000L)
    assert(r.getAs[Long]("ms") == 1700000000123L)
    assert(r.getAs[Long]("s") == 1700000000L)
    assert(r.getAs[Double]("h") == 1.5)
    assert(r.getAs[Double]("m") == 90.0)
    assert(r.getAs[Double]("sec") == 1.5)
    assert(r.getAs[Long]("trunc") % 3600000000000L == 0L)
    assert(r.getAs[Long]("trunc") <= 1700000000123456789L &&
      1700000000123456789L - r.getAs[Long]("trunc") < 3600000000000L)
  }
}
