package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Pipeline
import graft.pipeline.Pipeline._
import graft.sources.OtlpJsonSource
import graft.streaming.StreamingPipelines
import graft.operators.Processors

class StreamingPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("scrape receiver emits metric points on the rate schedule") {
    val points = graft.streaming.StreamingPipelines.scrapeStream(spark, 100, tick =>
      tick.select(
        lit("up").as("metric_name"), lit("gauge").as("metric_type"),
        col("timestamp"), (col("value") % 2).cast("double").as("value")))
    val q = points.writeStream.outputMode("append")
      .format("memory").queryName("scrape_out").start()
    try {
      Thread.sleep(1500)
      q.processAllAvailable()
      val n = spark.sql("SELECT count(*) FROM scrape_out").head().getLong(0)
      assert(n > 0)
      assert(spark.sql("SELECT DISTINCT metric_name FROM scrape_out").head().getString(0) == "up")
    } finally q.stop()
  }

  test("streaming tumbling agg matches the batch twin") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val batch = Tables(spark, sf, "events")
      .select(col("ts"), col("event_type"), col("value"))
    val rows = batch.as[(java.sql.Timestamp, String, Double)].collect()

    val ms = MemoryStream[(java.sql.Timestamp, String, Double)]
    ms.addData(rows.toSeq)
    val streamed = ms.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingPipelines.tumblingAgg(streamed, "event_type", "1 hour", "10 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT count(*) FROM tumbling_out").head().getLong(0)
      val want = batch.groupBy(window(col("ts"), "1 hour"), col("event_type")).count().count()
      assert(got == want)
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped AND observable in progress metrics") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // obsreport parity: the collector counts refused/dropped points;
    // Spark surfaces watermark drops per batch in StreamingQueryProgress
    val ms = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = StreamingPipelines.tumblingAgg(
      ms.toDF().toDF("ts", "event_type", "value"), "event_type", "1 hour", "10 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    def t(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    try {
      ms.addData(Seq((t(1), "a", 1.0), (t(5), "a", 1.0)))
      q.processAllAvailable()
      ms.addData(Seq((t(1), "a", 99.0))) // hours behind the watermark
      q.processAllAvailable()
      val dropped = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsDroppedByWatermark)).sum
      assert(dropped >= 1, s"late row must be counted as dropped, got $dropped")
      // and it must not have contaminated the 01:00 window's aggregate
      // (count first — an absent window row would make forall vacuous)
      val v = spark.sql(
        "SELECT total_value FROM late_out WHERE window.start = timestamp '2024-01-01 01:00:00'")
        .collect()
      assert(v.length == 1, s"01:00 window must have been emitted, got ${v.length} rows")
      assert(v.head.getDouble(0) == 1.0)
    } finally q.stop()
  }

  test("streaming dedup emits one record per key across micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    val out = StreamingPipelines.streamingDedup[String](spark, ms.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      ms.addData(Seq("a" -> "doc-a", "b" -> "doc-b", "a" -> "doc-a-dup"))
      q.processAllAvailable()
      ms.addData(Seq("a" -> "doc-a-again", "c" -> "doc-c"))
      q.processAllAvailable()
      val got = spark.sql("SELECT value FROM dedup_out").collect().map(_.getString(0)).sorted
      assert(got.toSeq == Seq("doc-a", "doc-b", "doc-c"))
    } finally q.stop()
  }

  test("stateful dedup runs on the RocksDB state store (bounded-memory state)") {
    // the HDFS-backed default keeps all state on the JVM heap; at
    // 100 TB streaming-dedup state must live in RocksDB (off-heap +
    // disk, incremental checkpoints) — same query, one provider conf
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[(String, String)]
      val out = StreamingPipelines.streamingDedup[String](spark, ms.toDS())
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName("dedup_rocks_out").start()
      try {
        ms.addData(Seq("x" -> "doc-x", "y" -> "doc-y", "x" -> "dup"))
        q.processAllAvailable()
        ms.addData(Seq("x" -> "dup2", "z" -> "doc-z"))
        q.processAllAvailable()
        val got = spark.sql("SELECT value FROM dedup_rocks_out")
          .collect().map(_.getString(0)).sorted
        assert(got.toSeq == Seq("doc-x", "doc-y", "doc-z"))
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("stateful exp-histogram accumulation merges mixed scales across batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(String, Int, Long, Long)]
    val out = StreamingPipelines.runningExpHistogram(spark, ms.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("exphist_out").start()
    try {
      // batch 1 at scale 1: buckets 2→3, 3→1
      ms.addData(Seq(("s", 1, 2L, 3L), ("s", 1, 3L, 1L)))
      q.processAllAvailable()
      val b1 = spark.sql("SELECT _2, _3, _4 FROM exphist_out")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      assert(b1 == Set((1, 2L, 3L), (1, 3L, 1L)))
      // batch 2 arrives COARSER (scale 0): state downscales — scale-1
      // indexes 2,3 both floor-div to index 1 (counts 3+1) — then the
      // incoming bucket 1→2 merges on top: cumulative (0, 1, 6)
      ms.addData(Seq(("s", 0, 1L, 2L)))
      q.processAllAvailable()
      val all = spark.sql("SELECT _2, _3, _4 FROM exphist_out")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      assert(all.contains((0, 1L, 6L)), all.mkString(","))
      // negative indexes keep floor semantics through the live merge
      ms.addData(Seq(("t", 2, -5L, 1L)))
      q.processAllAvailable()
      ms.addData(Seq(("t", 0, -2L, 1L)))
      q.processAllAvailable()
      val t = spark.sql("SELECT _2, _3, _4 FROM exphist_out WHERE _1 = 't'")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      assert(t.contains((0, -2L, 2L)), t.mkString(",")) // floorDiv(-5,4) = -2
    } finally q.stop()
  }

  test("stateful running counter accumulates across micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(String, Double)]
    val out = StreamingPipelines.runningCounter(spark, ms.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("counter_out").start()
    try {
      ms.addData(Seq("k" -> 1.0, "k" -> 2.0))
      q.processAllAvailable()
      ms.addData(Seq("k" -> 4.0))
      q.processAllAvailable()
      val cums = spark.sql("SELECT _3 FROM counter_out ORDER BY _3").collect().map(_.getDouble(0))
      assert(cums.toSeq == Seq(3.0, 7.0))
    } finally q.stop()
  }

  test("streaming near-dup pairs a new doc with one seen in an earlier batch") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    // 8-lane signatures, 4 bands × 2 rows: docs 1/2/4 share 7 of 8
    // lanes (near-dups, several identical bands), doc 3 is disjoint
    val sigA  = Seq(11L, 12L, 21L, 22L, 31L, 32L, 41L, 42L)
    val sigA2 = Seq(11L, 12L, 21L, 22L, 31L, 32L, 41L, 99L) // last lane differs
    val sigB  = Seq(91L, 92L, 93L, 94L, 95L, 96L, 97L, 98L)
    val ms = MemoryStream[(Long, Seq[Long])]
    val out = StreamingPipelines.streamingNearDup(spark, ms.toDS(),
      bands = 4, rowsPerBand = 2, threshold = 0.8)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("neardup_out").start()
    try {
      ms.addData(Seq((1L, sigA), (2L, sigA2), (3L, sigB)))
      q.processAllAvailable()
      val b1 = spark.sql("SELECT DISTINCT _1, _2 FROM neardup_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(b1 == Set((1L, 2L))) // 7/8 lanes = 0.875 ≥ 0.8; doc 3 pairs with nothing
      // batch 2: doc 4 (identical to doc 1) pairs with BOTH earlier
      // docs through the bucket state — the cross-batch point
      ms.addData(Seq((4L, sigA)))
      q.processAllAvailable()
      val all = spark.sql("SELECT DISTINCT _1, _2 FROM neardup_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(all == Set((1L, 2L), (1L, 4L), (2L, 4L)), all)
      // similarity estimate rides along: identical docs agree on 8/8
      val sim14 = spark.sql("SELECT max(_3) FROM neardup_out WHERE _1 = 1 AND _2 = 4")
        .head().getDouble(0)
      assert(sim14 == 1.0)
    } finally q.stop()
  }

  test("streaming near-dup bucket cap bounds state (degenerate bucket stops absorbing)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, Seq[Long])]
    // every doc identical → all land in the same buckets
    val sig = Seq(7L, 7L, 7L, 7L)
    val out = StreamingPipelines.streamingNearDup(spark, ms.toDS(),
      bands = 2, rowsPerBand = 2, threshold = 0.5, maxBucket = 2)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("neardup_cap_out").start()
    try {
      ms.addData((1L to 10L).map(i => (i, sig)))
      q.processAllAvailable()
      val pairs = spark.sql("SELECT DISTINCT _1, _2 FROM neardup_cap_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // only the 2 capped members generate comparisons: every later
      // doc compares against AT MOST those two — the pair set is the
      // 9+8 pairs against members 1 and 2, never the quadratic 45
      assert(pairs == (2L to 10L).map(i => (1L, i)).toSet ++
        (3L to 10L).map(i => (2L, i)).toSet, pairs)
    } finally q.stop()
  }

  test("stateful cumulative→delta handles a mid-stream counter reset across batch boundaries") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(String, Long, Double)]
    val out = StreamingPipelines.cumulativeToDeltaStream(spark, ms.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("c2d_out").start()
    try {
      // batch 1: first point passes through (batch-operator
      // convention), then in-batch deltas; an independent series too
      ms.addData(Seq(("a", 1L, 10.0), ("a", 2L, 15.0), ("b", 1L, 100.0)))
      q.processAllAvailable()
      // batch 2: the baseline survives the batch boundary (18-15=3),
      // then the counter RESETS (4 < 18): its own value is the delta,
      // and the rebased baseline carries forward (9-4=5)
      ms.addData(Seq(("a", 3L, 18.0), ("a", 4L, 4.0), ("a", 5L, 9.0)))
      q.processAllAvailable()
      // batch 3: series b also survives across batches (101-100=1)
      ms.addData(Seq(("b", 2L, 101.0)))
      q.processAllAvailable()
      val got = spark.sql("SELECT _1, _2, _4 FROM c2d_out ORDER BY _1, _2")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == Seq(
        ("a", 1L, 10.0), ("a", 2L, 5.0), ("a", 3L, 3.0),
        ("a", 4L, 4.0), ("a", 5L, 5.0),
        ("b", 1L, 100.0), ("b", 2L, 1.0)))
    } finally q.stop()
  }

  test("cumulative→delta TTL evicts an idle series' baseline (re-enters as first point)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(String, Long, Double)]
    // a ProcessingTimeTimeout query schedules continuous batches to
    // fire timeouts, so processAllAvailable never quiesces (the trade
    // the streamingDedup scaladoc documents) — drive this test by
    // POLLING the sink with a deadline instead
    val out = StreamingPipelines.cumulativeToDeltaStream(spark, ms.toDS(),
      ttlMs = Some(200L))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("c2d_ttl_out").start()
    def awaitRows(n: Int): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("c2d_ttl_out").count() < n &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(spark.table("c2d_ttl_out").count() >= n, s"sink never reached $n rows")
    }
    try {
      ms.addData(Seq(("a", 1L, 50.0)))
      awaitRows(1)
      // idle past the TTL: the continuous empty batches fire the
      // timeout and evict series a's baseline
      Thread.sleep(800)
      ms.addData(Seq(("a", 2L, 60.0)))
      awaitRows(2)
      val got = spark.sql("SELECT _2, _4 FROM c2d_ttl_out ORDER BY _2")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      // after eviction the 60.0 point re-enters as first-point-passes-
      // through (60.0), NOT as a delta vs the dead baseline (10.0)
      assert(got == Seq((1L, 50.0), (2L, 60.0)), got)
    } finally q.stop()
  }

  test("exemplar reservoir is bounded, deterministic, and arrival-order independent") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val pts = (1L to 20L).map(i => ("cpu", 1000L + i, i * 1.5))
    def finalReservoir(batches: Seq[Seq[(String, Long, Double)]],
                       name: String): Set[(Long, Double)] = {
      val ms = MemoryStream[(String, Long, Double)]
      val out = StreamingPipelines.exemplarReservoir(spark, ms.toDS(), k = 4)
      val q = out.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        var lastCount = 0L
        var last: Set[(Long, Double)] = Set.empty
        batches.foreach { b =>
          ms.addData(b)
          q.processAllAvailable()
          // the emission after the final batch IS the reservoir; track
          // the rows added by this batch
          val all = spark.table(name).collect()
            .map(r => (r.getLong(1), r.getDouble(2)))
          last = all.drop(lastCount.toInt).toSet
          lastCount = all.length.toLong
        }
        last
      } finally q.stop()
    }
    // same 20 points, three different batchings/orders → identical
    // bottom-k reservoir (replay/arrival-order stability — the reason
    // priorities are hashes, not an RNG)
    val a = finalReservoir(Seq(pts.take(10), pts.drop(10)), "ex_a")
    val b = finalReservoir(Seq(pts.reverse), "ex_b")
    val c = finalReservoir(Seq(pts.drop(10), pts.take(10).reverse), "ex_c")
    assert(a.size == 4, a)
    assert(a == b && b == c, s"$a vs $b vs $c")
  }

  test("streaming servicegraph pairs client/server halves across micro-batches") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(String, String, String)]
    val out = StreamingPipelines.serviceGraphStream(spark, ms.toDS(), ttlMs = None)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("svcgraph_out").start()
    try {
      // batch 1: client half of edge A, server half of edge B — no
      // edge is complete yet, both wait in state
      ms.addData(Seq(("edgeA", "client", "frontend"), ("edgeB", "server", "db")))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM svcgraph_out").head().getLong(0) == 0)
      // batch 2: the matching halves arrive — both edges emit
      ms.addData(Seq(("edgeA", "server", "api"), ("edgeB", "client", "api")))
      q.processAllAvailable()
      val edges = spark.sql("SELECT _1, _2 FROM svcgraph_out")
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(edges == Set("frontend" -> "api", "api" -> "db"))
      // a completed edge's state is gone: re-sending one half alone
      // does not re-emit
      ms.addData(Seq(("edgeA", "client", "frontend")))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM svcgraph_out").head().getLong(0) == 2)
    } finally q.stop()
  }

  test("service graph: fanout pipelines over one receiver") {
    val errors = new CollectingExporter
    val totals = new CollectingExporter
    val svc = Service(Map(
      "logs/errors" -> PipelineDef(
        TableReceiver(sf, "events"),
        Seq(df => Processors.filter(df, col("event_type") === "error"),
          df => Processors.attributes(df, Seq(
            Processors.Upsert("severity", lit("ERROR")),
            Processors.Delete("props")))),
        Seq(errors)),
      "metrics/totals" -> PipelineDef(
        TableReceiver(sf, "events"),
        Seq(df => df.groupBy(col("event_type")).count()),
        Seq(totals))))
    svc.run(spark)
    assert(errors.result.nonEmpty)
    assert(errors.result.forall(_.getAs[String]("severity") == "ERROR"))
    assert(totals.result.map(_.getAs[String]("event_type")).toSet.contains("error"))
  }

  test("OTLP-JSON log parsing flattens the resource/scope/record tree") {
    import spark.implicits._
    val json =
      """{"resourceLogs":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"api"}}]},
        |"scopeLogs":[{"scope":{"name":"graft"},"logRecords":[
        |{"timeUnixNano":"1700000000000000001","severityNumber":17,"severityText":"ERROR",
        |"body":{"stringValue":"boom"},"attributes":[{"key":"http.status","value":{"intValue":"500"}}],
        |"traceId":"abc","spanId":"def"},
        |{"timeUnixNano":"1700000000000000002","severityNumber":9,"severityText":"INFO",
        |"body":{"stringValue":"ok"},"attributes":[],"traceId":"abc","spanId":"0ef"}]}]}]}"""
        .stripMargin.replaceAll("\n", "")
    val parsed = OtlpJsonSource.parseLogs(Seq(json).toDF("json"))
    val rows = parsed.collect()
    assert(rows.length == 2)
    val err = rows.find(_.getAs[String]("severity_text") == "ERROR").get
    assert(err.getAs[String]("body") == "boom")
    assert(err.getAs[Long]("time_unix_nano") == 1700000000000000001L)
    assert(err.getAs[Map[String, String]]("resource_attributes")("service.name") == "api")
    assert(err.getAs[Map[String, String]]("attributes")("http.status") == "500")
    assert(parsed.schema.fieldNames.contains("scope_name"))
  }

  test("runObserved reports obsreport-style received/sent/dropped") {
    val sink = new CollectingExporter
    val stats = PipelineDef(
      TableReceiver(sf, "events"),
      Seq(df => Processors.filter(df, col("event_type") === "error")),
      Seq(sink)).runObserved(spark)
    assert(stats.received == 1000)
    assert(stats.sent == sink.result.length.toLong)
    assert(stats.dropped == stats.received - stats.sent && stats.dropped > 0)
  }

  test("runObservedStages: per-stage accepted/refused + DLQ counters on a failing exporter") {
    val sink = new CollectingExporter
    val obs = new Pipeline.QueueObs
    val failing = new Exporter {
      def export(df: org.apache.spark.sql.DataFrame): Unit =
        throw new Pipeline.PermanentExportException("sink rejects schema")
    }
    val dlqDir = java.nio.file.Files.createTempDirectory("obs_dlq").toString
    val run = PipelineDef(
      TableReceiver(sf, "events"),
      Seq(
        df => Processors.filter(df, col("value") >= 0),            // keeps all
        df => Processors.filter(df, col("event_type") === "error"), // drops most
        df => df.withColumn("flag", lit(1))),                       // 1:1 map
      Seq(sink,
        Pipeline.QueuedExporter(failing, dlqDir, maxRetries = 1,
          backoffMs = 1, obs = Some(obs)))).runObservedStages(spark)
    // stage boundaries: receiver 1000 → stage_0 1000 → stage_1 errs → stage_2 errs
    val byName = run.stages.map(s => s.stage -> s).toMap
    assert(run.received == 1000)
    assert(byName("stage_0").in == 1000 && byName("stage_0").dropped == 0)
    assert(byName("stage_1").dropped > 0, byName.toString)
    assert(byName("stage_1").out == sink.result.length.toLong)
    assert(byName("stage_2").dropped == 0)
    assert(byName("stage_2").out == run.sent)
    assert(run.dropped == 1000 - sink.result.length)
    // exporter split: the collecting sink delivered, the permanent
    // failure dead-lettered the whole batch (rows counted)
    val exp = run.exports.map(e => e.exporter -> e).toMap
    assert(exp.exists(_._1.startsWith("CollectingExporter")))
    val q = run.exports.find(_.exporter.startsWith("QueuedExporter")).get
    assert(q.delivered == 0 && q.deadLetteredBatches == 1 &&
      q.deadLetteredRows == sink.result.length.toLong, q.toString)
    assert(run.wallNs > 0 && run.exports.forall(_.wallNs > 0))
    // a LIMITED first exporter (show's CollectLimit) must not latch
    // partial counts: the stage observations ride a dedicated full
    // counting pass, not whatever the first exporter happens to scan
    val limited = PipelineDef(
      TableReceiver(sf, "events"), Nil, Seq(LoggingExporter(1)))
      .runObservedStages(spark)
    assert(limited.received == 1000, limited.stages.toString)
  }

  test("RetryingExporter retries transient failures then succeeds") {
    var calls = 0
    val flaky = new Exporter {
      def export(df: org.apache.spark.sql.DataFrame): Unit = {
        calls += 1
        if (calls < 3) throw new RuntimeException("transient")
        df.collect()
      }
    }
    RetryingExporter(flaky, maxRetries = 5, backoffMs = 1)
      .export(Tables(spark, sf, "events").limit(5))
    assert(calls == 3)
  }

  test("OTLP-JSON spans parsing flattens resourceSpans") {
    import spark.implicits._
    val json =
      """{"resourceSpans":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"api"}}]},
        |"scopeSpans":[{"scope":{"name":"graft"},"spans":[
        |{"traceId":"t1","spanId":"s1","parentSpanId":"","name":"GET /x","kind":2,
        |"startTimeUnixNano":"100","endTimeUnixNano":"250","status":{"code":2},
        |"attributes":[{"key":"http.route","value":{"stringValue":"/x"}}]}]}]}]}"""
        .stripMargin.replaceAll("\n", "")
    val rows = OtlpJsonSource.parseSpans(Seq(json).toDF("json")).collect()
    assert(rows.length == 1)
    val sp = rows.head
    assert(sp.getAs[String]("name") == "GET /x")
    assert(sp.getAs[Long]("end_time_unix_nano") == 250L)
    assert(sp.getAs[Int]("status_code") == 2)
    assert(sp.getAs[Map[String, String]]("resource_attributes")("service.name") == "api")
  }

  test("OTLP-JSON metrics parsing yields gauge and sum datapoints") {
    import spark.implicits._
    val json =
      """{"resourceMetrics":[{"resource":{"attributes":[]},
        |"scopeMetrics":[{"scope":{"name":"graft"},"metrics":[
        |{"name":"cpu.util","gauge":{"dataPoints":[{"timeUnixNano":"100","asDouble":0.5,"attributes":[]}]}},
        |{"name":"requests","sum":{"aggregationTemporality":2,"isMonotonic":true,
        |"dataPoints":[{"timeUnixNano":"200","asInt":"42","attributes":[]}]}}]}]}]}"""
        .stripMargin.replaceAll("\n", "")
    val rows = OtlpJsonSource.parseMetricPoints(Seq(json).toDF("json")).collect()
    assert(rows.length == 2)
    val gauge = rows.find(_.getAs[String]("metric_type") == "gauge").get
    assert(gauge.getAs[Double]("value") == 0.5)
    val sum = rows.find(_.getAs[String]("metric_type") == "sum").get
    assert(sum.getAs[Double]("value") == 42.0)
    assert(sum.getAs[String]("aggregation_temporality") == "cumulative")
    assert(sum.getAs[Boolean]("is_monotonic"))
  }

  test("OTLP-JSON span events and histogram datapoints parse") {
    import spark.implicits._
    val spanJson =
      """{"resourceSpans":[{"resource":{"attributes":[]},
        |"scopeSpans":[{"scope":{"name":"g"},"spans":[
        |{"traceId":"t1","spanId":"s1","name":"op","kind":1,
        |"startTimeUnixNano":"100","endTimeUnixNano":"300","status":{"code":0},
        |"attributes":[],
        |"events":[{"timeUnixNano":"150","name":"exception","attributes":[{"key":"msg","value":{"stringValue":"nope"}}]},
        |          {"timeUnixNano":"200","name":"retry","attributes":[]}],
        |"links":[{"traceId":"t0","spanId":"s0"}]}]}]}]}"""
        .stripMargin.replaceAll("\n", "")
    val spans = OtlpJsonSource.parseSpans(Seq(spanJson).toDF("json")).head()
    assert(spans.getAs[Int]("n_events") == 2 && spans.getAs[Int]("n_links") == 1)
    val evs = OtlpJsonSource.parseSpanEvents(Seq(spanJson).toDF("json")).collect()
    assert(evs.length == 2)
    assert(evs.find(_.getAs[String]("name") == "exception").get
      .getAs[Map[String, String]]("attributes")("msg") == "nope")

    val histJson =
      """{"resourceMetrics":[{"resource":{"attributes":[]},
        |"scopeMetrics":[{"scope":{"name":"g"},"metrics":[
        |{"name":"latency","histogram":{"aggregationTemporality":2,"dataPoints":[
        |{"timeUnixNano":"500","count":"6","sum":12.5,
        | "bucketCounts":["1","2","3"],"explicitBounds":[0.1,1.0],"attributes":[]}]}}]}]}]}"""
        .stripMargin.replaceAll("\n", "")
    val buckets = OtlpJsonSource.parseHistogramBuckets(Seq(histJson).toDF("json")).collect()
    assert(buckets.length == 3)
    assert(buckets.map(_.getAs[Long]("bucket_count")).sum == 6)
    assert(buckets.head.getAs[Double]("total_sum") == 12.5)
  }

  test("OTLP-JSON summary and exponential-histogram datapoints parse") {
    import spark.implicits._
    val json =
      """{"resourceMetrics":[{"resource":{"attributes":[]},
        |"scopeMetrics":[{"scope":{"name":"g"},"metrics":[
        |{"name":"lat.summary","summary":{"dataPoints":[
        |{"timeUnixNano":"900","count":"10","sum":55.0,
        | "quantileValues":[{"quantile":0.5,"value":5.0},{"quantile":0.99,"value":9.9}]}]}},
        |{"name":"lat.exp","exponentialHistogram":{"aggregationTemporality":1,"dataPoints":[
        |{"timeUnixNano":"901","count":"4","sum":8.0,"scale":0,"zeroCount":"1",
        | "positive":{"offset":2,"bucketCounts":["1","3"]}}]}}]}]}]}"""
        .stripMargin.replaceAll("\n", "")
    val sq = OtlpJsonSource.parseSummaryQuantiles(Seq(json).toDF("json")).collect()
    assert(sq.length == 2)
    assert(sq.find(_.getAs[Double]("quantile") == 0.99).get.getAs[Double]("value") == 9.9)
    val eh = OtlpJsonSource.parseExpHistogramBuckets(Seq(json).toDF("json")).collect()
    assert(eh.length == 2)
    assert(eh.map(_.getAs[Long]("bucket_count")).sum == 4)
    // scale 0, offset 2: first bucket lower bound = 2^2
    assert(eh.find(_.getAs[Int]("bucket_idx") == 0).get.getAs[Double]("lower_bound") == 4.0)
  }

  test("OTLP-JSON logs round-trip: write then parse preserves records") {
    val logs = OtlpJsonSource.eventsAsLogs(spark, sf).limit(200)
    val written = OtlpJsonSource.writeLogsJson(logs)
    val reparsed = OtlpJsonSource.parseLogs(written.select(org.apache.spark.sql.functions.col("json")))
    assert(reparsed.count() == 200)
    val a = logs.select("span_id", "body", "severity_number").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val b = reparsed.select("span_id", "body", "severity_number").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(a == b)
  }

  test("checkpointed export survives a mid-batch kill: unacked batch redelivers idempotently") {
    import java.nio.file.{Files, Paths}
    val inDir = Files.createTempDirectory("ck_in").toString
    val outDir = Files.createTempDirectory("ck_out").toString + "/sink"
    val ck = Files.createTempDirectory("ck_ck").toString
    Files.write(Paths.get(inDir, "f1.txt"),
      (1 to 10).map(i => s"rec-$i").mkString("\n").getBytes("UTF-8"))

    // exporterhelper's persistent queue survives process death; the
    // Spark analog is the streaming checkpoint: a batch that dies
    // before commit is REPLAYED on restart with the same batchId, and
    // the per-batchId overwrite contract makes redelivery idempotent.
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val exporter = new Exporter {
      def export(df: org.apache.spark.sql.DataFrame): Unit = ()
      override def exportBatch(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
        val dst = s"$outDir/batch_id=$batchId"
        if (attempts.incrementAndGet() == 1) {
          // partial write, then die mid-batch (pre-commit kill)
          df.limit(3).write.mode("overwrite").parquet(dst)
          throw new RuntimeException("killed mid-batch")
        }
        df.write.mode("overwrite").parquet(dst)
      }
    }
    def src = spark.readStream.text(inDir)
    val q1 = StreamingPipelines.exportStream(src, exporter, ck)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    // batch 0 died unacked: partial output on disk, commit log empty
    assert(spark.read.parquet(s"$outDir/batch_id=0").count() == 3)

    val q2 = StreamingPipelines.exportStream(src, exporter, ck)
    try q2.processAllAvailable() finally q2.stop()
    assert(attempts.get() == 2, "restart must replay exactly the one unacked batch")
    val rows = spark.read.parquet(s"$outDir/batch_id=0")
      .collect().map(_.getString(0)).sorted
    assert(rows.toSeq == (1 to 10).map(i => s"rec-$i").sorted.toSeq,
      "replayed batch must replace the partial output, not append to it")
  }

  test("poison batch dead-letters exactly once and stays acked across restart") {
    import java.nio.file.{Files, Paths}
    val inDir = Files.createTempDirectory("dlq_in").toString
    val outDir = Files.createTempDirectory("dlq_out").toString + "/sink"
    val dlqDir = Files.createTempDirectory("dlq_dlq").toString + "/dlq"
    val ck = Files.createTempDirectory("dlq_ck").toString
    Files.write(Paths.get(inDir, "f1.txt"), "good-1\ngood-2".getBytes("UTF-8"))

    val poisonAttempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val delegate = new Exporter {
      def export(df: org.apache.spark.sql.DataFrame): Unit = ()
      override def exportBatch(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
        val rows = df.collect()
        if (rows.exists(_.getString(0).contains("poison"))) {
          poisonAttempts.incrementAndGet()
          throw new PermanentExportException("schema rejection")
        }
        df.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
    }
    val queued = QueuedExporter(delegate, dlqDir, maxRetries = 1, backoffMs = 1)
    def src = spark.readStream.option("maxFilesPerTrigger", 1).text(inDir)
    val q1 = StreamingPipelines.exportStream(src, queued, ck)
    try {
      q1.processAllAvailable()
      Files.write(Paths.get(inDir, "f2.txt"), "poison-1".getBytes("UTF-8"))
      q1.processAllAvailable()
    } finally q1.stop()
    // permanent error: delivered to the DLQ once, query kept running
    assert(poisonAttempts.get() == 1)
    val dlqRows = spark.read.parquet(dlqDir).collect()
    assert(dlqRows.length == 1 && dlqRows.head.getString(0) == "poison-1")
    assert(dlqRows.head.getAs[String]("dlq_error").contains("schema rejection"))

    // restart from the same checkpoint: the poison batch was ACKED
    // (DLQ counts as delivery) — it must NOT redeliver or re-DLQ
    val q2 = StreamingPipelines.exportStream(src, queued, ck)
    try q2.processAllAvailable() finally q2.stop()
    assert(poisonAttempts.get() == 1, "acked poison batch redelivered after restart")
    assert(spark.read.parquet(dlqDir).count() == 1)
  }

  test("socket-fed OTLP receiver: pb frames over a live network stream parse") {
    // the receiver-as-server shape (otlpreceiver gRPC/HTTP push):
    // binary requests arrive over a socket, base64-framed per line
    val json =
      """{"resourceLogs":[{"resource":{"attributes":[{"key":"service.name","value":{"stringValue":"api"}}]},
        |"scopeLogs":[{"scope":{"name":"graft"},"logRecords":[
        |{"timeUnixNano":"1700000000000000001","severityNumber":17,"body":{"stringValue":"boom"},"attributes":[]},
        |{"timeUnixNano":"1700000000000000002","severityNumber":9,"body":{"stringValue":"ok"},"attributes":[]}]}]}]}"""
        .stripMargin.replaceAll("\n", "")
    val pb = graft.sources.OtlpProtobuf.logsJsonToRequest(
      org.apache.spark.unsafe.types.UTF8String.fromString(json))
    val line = java.util.Base64.getEncoder.encodeToString(pb)

    val server = new java.net.ServerSocket(0)
    val sent = new java.util.concurrent.CountDownLatch(1)
    val writer = new Thread(() => {
      val sock = server.accept() // ONE consumer = one connection
      val out = new java.io.PrintWriter(sock.getOutputStream, true)
      (1 to 3).foreach(_ => out.println(line)) // 3 requests × 2 records
      out.println("ab!cde")                    // not base64 — must dead-letter
      out.println(java.util.Base64.getEncoder.encodeToString(
        Array[Byte](0x0a, 0x7f, 0x01)))        // base64 but truncated pb
      out.flush()
      sent.countDown()
      // keep the connection open until the query is done reading
      Thread.sleep(30000)
      sock.close()
    })
    writer.setDaemon(true)
    writer.start()

    val ck = java.nio.file.Files.createTempDirectory("socket_ck").toString
    val goodRows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String)]()
    val dlqRows = new java.util.concurrent.ConcurrentLinkedQueue[Array[Byte]]()
    val q = OtlpJsonSource.socketLogsPbRouted(spark, "localhost", server.getLocalPort, ck,
      goodSink = (df, _) => df.select("severity_number", "body").collect()
        .foreach(r => goodRows.add(r.getInt(0) -> r.getString(1))),
      dlqSink = (df, _) => df.select("raw").collect()
        .foreach(r => dlqRows.add(r.getAs[Array[Byte]](0))))
    try {
      assert(sent.await(20, java.util.concurrent.TimeUnit.SECONDS))
      val deadline = System.currentTimeMillis() + 30000
      while ((goodRows.size < 6 || dlqRows.size < 2) &&
          System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        Thread.sleep(200)
      }
      assert(goodRows.size == 6)
      assert(dlqRows.size == 2, "garbage base64 AND malformed pb both dead-letter")
      val sev = goodRows.toArray(Array.empty[(Int, String)])
        .groupBy(_._1).map { case (k, v) => k -> v.length }
      assert(sev == Map(17 -> 3, 9 -> 3))
      // the valid-base64-but-bad-pb row's DLQ bytes are the DECODED
      // wire bytes (re-inspectable as pb, like the file DLQs)
      assert(dlqRows.toArray(Array.empty[Array[Byte]])
        .exists(_.sameElements(Array[Byte](0x0a, 0x7f, 0x01))))
    } finally {
      q.stop()
      server.close()
    }
  }

  test("socket-fed span and metric receivers complete the push matrix") {
    import org.apache.spark.unsafe.types.UTF8String
    def serve(lines: Seq[String]): java.net.ServerSocket = {
      val server = new java.net.ServerSocket(0)
      val writer = new Thread(() => {
        val sock = server.accept()
        val out = new java.io.PrintWriter(sock.getOutputStream, true)
        lines.foreach(out.println)
        out.flush()
        Thread.sleep(30000)
        sock.close()
      })
      writer.setDaemon(true); writer.start()
      server
    }
    val spanJson =
      """{"resourceSpans":[{"resource":{"attributes":[]},"scopeSpans":[{"scope":{"name":"graft"},""" +
        """"spans":[{"traceId":"000102030405060708090a0b0c0d0e0f","spanId":"0001020304050607",""" +
        """"name":"op","kind":2,"startTimeUnixNano":"100","endTimeUnixNano":"250","status":{"code":2},"attributes":[]}]}]}]}"""
    val spanLine = java.util.Base64.getEncoder.encodeToString(
      graft.sources.OtlpProtobuf.spansJsonToRequest(UTF8String.fromString(spanJson)))
    val s1 = serve(Seq(spanLine, spanLine))
    val q1 = OtlpJsonSource.socketSpansPb(spark, "localhost", s1.getLocalPort)
      .writeStream.format("memory").queryName("socket_spans_out").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.sql("SELECT count(*) FROM socket_spans_out").head().getLong(0) < 2 &&
          System.currentTimeMillis() < deadline) { q1.processAllAvailable(); Thread.sleep(100) }
      val r = spark.sql("SELECT name, kind, status_code FROM socket_spans_out").collect()
      assert(r.length == 2 && r.forall(x =>
        x.getString(0) == "op" && x.getInt(1) == 2 && x.getInt(2) == 2))
    } finally { q1.stop(); s1.close() }

    val metricJson =
      """{"resourceMetrics":[{"resource":{"attributes":[]},"scopeMetrics":[{"scope":{"name":"graft"},""" +
        """"metrics":[{"name":"cpu","gauge":{"dataPoints":[{"timeUnixNano":"100","asDouble":0.5,"attributes":[]}]}}]}]}]}"""
    val metricLine = java.util.Base64.getEncoder.encodeToString(
      graft.sources.OtlpProtobuf.metricsJsonToRequest(UTF8String.fromString(metricJson)))
    val s2 = serve(Seq(metricLine, metricLine, metricLine))
    val q2 = OtlpJsonSource.socketMetricsPb(spark, "localhost", s2.getLocalPort)
      .writeStream.format("memory").queryName("socket_metrics_out").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.sql("SELECT count(*) FROM socket_metrics_out").head().getLong(0) < 3 &&
          System.currentTimeMillis() < deadline) { q2.processAllAvailable(); Thread.sleep(100) }
      val m = spark.sql("SELECT metric_name, metric_type, value FROM socket_metrics_out").collect()
      assert(m.length == 3 && m.forall(x =>
        x.getString(0) == "cpu" && x.getString(1) == "gauge" && x.getDouble(2) == 0.5))
    } finally { q2.stop(); s2.close() }
  }

  test("socket-fed OTLP/JSON receivers: the reference's second push encoding") {
    def serve(lines: Seq[String]): java.net.ServerSocket = {
      val server = new java.net.ServerSocket(0)
      val writer = new Thread(() => {
        val sock = server.accept()
        val out = new java.io.PrintWriter(sock.getOutputStream, true)
        lines.foreach(out.println)
        out.flush()
        Thread.sleep(30000)
        sock.close()
      })
      writer.setDaemon(true); writer.start()
      server
    }
    // JSON rides the socket DIRECTLY (one request document per line —
    // no base64: that's the pb framing); identical parse path to the
    // json-lines file receiver
    val logJson =
      """{"resourceLogs":[{"resource":{"attributes":[]},"scopeLogs":[{"scope":{"name":"graft"},""" +
        """"logRecords":[{"timeUnixNano":"100","severityNumber":9,"severityText":"INFO",""" +
        """"body":{"stringValue":"hello"},"attributes":[]}]}]}]}"""
    val s = serve(Seq(logJson, logJson))
    val q = OtlpJsonSource.socketLogsJson(spark, "localhost", s.getLocalPort)
      .writeStream.format("memory").queryName("socket_json_logs_out").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.sql("SELECT count(*) FROM socket_json_logs_out").head().getLong(0) < 2 &&
          System.currentTimeMillis() < deadline) { q.processAllAvailable(); Thread.sleep(100) }
      val r = spark.sql(
        "SELECT severity_text, body FROM socket_json_logs_out").collect()
      assert(r.length == 2 && r.forall(x =>
        x.getString(0) == "INFO" && x.getString(1) == "hello"))
    } finally { q.stop(); s.close() }
  }

  test("arrow IPC socket push receiver: pool-exporter payloads over a live socket, all three signals") {
    import graft.sources.ArrowIpc
    import spark.implicits._
    def serveFiles(payloads: Seq[Array[Byte]]): java.net.ServerSocket = {
      val server = new java.net.ServerSocket(0)
      val writer = new Thread(() => {
        val sock = server.accept()
        val out = new java.io.PrintWriter(sock.getOutputStream, true)
        payloads.foreach(p =>
          out.println(java.util.Base64.getEncoder.encodeToString(p)))
        out.flush()
        Thread.sleep(30000)
        sock.close()
      })
      writer.setDaemon(true); writer.start()
      server
    }
    def arrowPayloads(dir: String): Seq[Array[Byte]] = {
      val b = Seq.newBuilder[Array[Byte]]
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).forEach { p =>
        if (p.toString.endsWith(".arrow"))
          b += java.nio.file.Files.readAllBytes(p)
      }
      b.result()
    }

    // logs ride the REAL pool exporter (dict+zstd — the namesake
    // transport shape), then its spooled stream payloads are served
    // over a live socket instead of re-read from the filesystem
    val logs = OtlpJsonSource.eventsAsLogs(spark, "/root/testdata/sf0.001")
      .withColumn("trace_id", substring(col("trace_id"), 1, 32))
      .withColumn("span_id", substring(col("span_id"), 1, 16))
      .limit(40)
    val poolDir = java.nio.file.Files.createTempDirectory("arrow_sock").toString
    val pool = new Pipeline.ArrowStreamPoolExporter(poolDir, numStreams = 2,
      dictCap = 32, codec = "zstd")
    pool.export(logs)
    assert(pool.arrowBatches.get() == 1 && !pool.isDowngraded)
    val s1 = serveFiles(arrowPayloads(s"$poolDir/arrow"))
    val q1 = ArrowIpc.socketLogsArrow(spark, "localhost", s1.getLocalPort)
      .writeStream.format("memory").queryName("arrow_sock_logs").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.sql("SELECT count(*) FROM arrow_sock_logs").head().getLong(0) < 40 &&
          System.currentTimeMillis() < deadline) { q1.processAllAvailable(); Thread.sleep(100) }
      // rows identical to the pb transport of the SAME frame
      val cols = Seq("time_unix_nano", "severity_number", "severity_text",
        "body", "trace_id", "span_id")
      val viaSocket = spark.sql("SELECT * FROM arrow_sock_logs")
        .select(cols.map(col): _*).collect().map(_.toString).sorted
      val viaPb = OtlpJsonSource.parseLogsPb(OtlpJsonSource.writeLogsPb(logs))
        .select(cols.map(col): _*).collect().map(_.toString).sorted
      assert(viaSocket.length == 40)
      assert(viaSocket.sameElements(viaPb), "socket-arrow rows != pb-path rows")
    } finally { q1.stop(); s1.close() }

    // spans + metrics complete the push matrix over the same seam
    val spanReq =
      """{"resourceSpans":[{"resource":{"attributes":[]},"scopeSpans":[{"scope":{"name":"graft"},""" +
        """"spans":[{"traceId":"t1","spanId":"s1","name":"op","kind":2,"startTimeUnixNano":"100",""" +
        """"endTimeUnixNano":"250","status":{"code":2},"attributes":[]}]}]}]}"""
    val spans = OtlpJsonSource.parseSpans(Seq(spanReq).toDF("json"))
    val spanDir = java.nio.file.Files.createTempDirectory("arrow_sock_sp").toString
    ArrowIpc.spool(spans, spanDir, dictCap = 8)
    val s2 = serveFiles(arrowPayloads(spanDir))
    val q2 = ArrowIpc.socketSpansArrow(spark, "localhost", s2.getLocalPort)
      .writeStream.format("memory").queryName("arrow_sock_spans").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.sql("SELECT count(*) FROM arrow_sock_spans").head().getLong(0) < 1 &&
          System.currentTimeMillis() < deadline) { q2.processAllAvailable(); Thread.sleep(100) }
      val r = spark.sql("SELECT name, kind, status_code FROM arrow_sock_spans").head()
      assert(r.getString(0) == "op" && r.getInt(1) == 2 && r.getInt(2) == 2)
    } finally { q2.stop(); s2.close() }

    val metricReq =
      """{"resourceMetrics":[{"resource":{"attributes":[]},"scopeMetrics":[{"scope":{"name":"graft"},""" +
        """"metrics":[{"name":"cpu","gauge":{"dataPoints":[{"timeUnixNano":"100","asDouble":0.5,"attributes":[]}]}}]}]}]}"""
    val points = OtlpJsonSource.parseMetricPoints(Seq(metricReq).toDF("json"))
    val metricDir = java.nio.file.Files.createTempDirectory("arrow_sock_mx").toString
    ArrowIpc.spool(points, metricDir)
    val s3 = serveFiles(arrowPayloads(metricDir))
    val q3 = ArrowIpc.socketMetricsArrow(spark, "localhost", s3.getLocalPort)
      .writeStream.format("memory").queryName("arrow_sock_metrics").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.sql("SELECT count(*) FROM arrow_sock_metrics").head().getLong(0) < 1 &&
          System.currentTimeMillis() < deadline) { q3.processAllAvailable(); Thread.sleep(100) }
      val m = spark.sql("SELECT metric_name, metric_type, value FROM arrow_sock_metrics").head()
      assert(m.getString(0) == "cpu" && m.getString(1) == "gauge" && m.getDouble(2) == 0.5)
    } finally { q3.stop(); s3.close() }
  }

  test("streaming incremental BM25 and bigram-LM converge to the batch twins on a replayed corpus") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val corpus = Seq(
      (1L, "spark streaming corpus stats converge on replay"),
      (2L, "bm25 scores spark documents against query terms"),
      (3L, "query terms filter map side spark spark"),
      (4L, "unrelated text with no relevant words at all"),
      (5L, "streaming stats update then score each trigger"),
      (6L, "spark query terms spark query terms"))
    val queryTerms = Seq("spark", "query", "terms", "streaming")
    def toks(t: String): Seq[String] = t.split("\\s+").toSeq

    // --- BM25: feed the corpus as stat updates in two triggers, then
    // replay it flagged update=false — the re-scored pass must equal
    // the batch operator on the same corpus, bit for bit
    val ms = MemoryStream[(Long, String, Boolean)]
    val obs = new StreamingPipelines.CorpusStatsObs
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double, Boolean)]()
    val q = StreamingPipelines.streamingBm25(spark,
      ms.toDF().toDF("id", "text", "upd"), "id", "text", "upd", queryTerms,
      stateDir = java.nio.file.Files.createTempDirectory("sbm25_state").toString,
      obs = Some(obs)) { (df, _) =>
      df.collect().foreach(r =>
        out.add((r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))))
    }
    try {
      ms.addData(corpus.take(3).map { case (i, t) => (i, t, true) })
      q.processAllAvailable()
      ms.addData(corpus.drop(3).map { case (i, t) => (i, t, true) })
      q.processAllAvailable()
      ms.addData(corpus.map { case (i, t) => (i, t, false) }) // re-score pass
      q.processAllAvailable()
      val got = out.toArray(Array.empty[(Long, Long, Double, Boolean)])
        .filter(r => !r._4 && r._2 > 0)
        .map(r => r._1 -> (r._2, r._3)).toMap
      val want = graft.operators.TextOps.bm25(
          corpus.toDF("id", "text"), "id", "text", queryTerms)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got == want, s"streaming $got vs batch $want")
      // r7 verdict #3, the two-stage contract made checkable: the
      // stateful merge consumed PARTIAL rows (per-trigger distinct
      // query-term df deltas + one scalar row), never per-doc rows
      val expectedPartials =
        Seq(corpus.take(3), corpus.drop(3)).map { trig =>
          trig.flatMap(d => toks(d._2).filter(queryTerms.contains)).distinct.size + 1
        }.sum + 1 // re-score trigger: no updates, scalar row only
      assert(obs.partialRowsIn.get == expectedPartials,
        s"stateful merge saw ${obs.partialRowsIn.get} rows, expected $expectedPartials partials")
      assert(obs.docsIn.get == 12 && obs.partialRowsIn.get < obs.docsIn.get,
        s"partials ${obs.partialRowsIn.get} should undercut docs ${obs.docsIn.get}")
    } finally q.stop()

    // --- bigram LM: same two-phase replay contract
    val ms2 = MemoryStream[(Long, String, Boolean)]
    val obs2 = new StreamingPipelines.CorpusStatsObs
    val out2 = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double, Boolean)]()
    val q2 = StreamingPipelines.streamingLmBigram(spark,
      ms2.toDF().toDF("id", "text", "upd"), "id", "text", "upd",
      stateDir = java.nio.file.Files.createTempDirectory("slm_state").toString,
      obs = Some(obs2)) { (df, _) =>
      df.collect().foreach(r =>
        out2.add((r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))))
    }
    try {
      ms2.addData(corpus.take(4).map { case (i, t) => (i, t, true) })
      q2.processAllAvailable()
      ms2.addData(corpus.drop(4).map { case (i, t) => (i, t, true) })
      q2.processAllAvailable()
      ms2.addData(corpus.map { case (i, t) => (i, t, false) })
      q2.processAllAvailable()
      val got = out2.toArray(Array.empty[(Long, Long, Double, Boolean)])
        .filter(!_._4).map(r => r._1 -> (r._2, r._3)).toMap
      val want = graft.operators.TextOps.lmBigramScore(
          corpus.toDF("id", "text"), "id", "text")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(got == want, s"streaming $got vs batch $want")
      // merge input = distinct bigram deltas + distinct tokens per
      // update trigger (re-score trigger contributes nothing)
      val expectedPartials2 =
        Seq(corpus.take(4), corpus.drop(4)).map { trig =>
          val bigrams = trig.flatMap(d => toks(d._2).sliding(2).map(_.mkString("\u0000")))
          val tokens = trig.flatMap(d => toks(d._2))
          bigrams.distinct.size + tokens.distinct.size
        }.sum
      assert(obs2.partialRowsIn.get == expectedPartials2,
        s"stateful merge saw ${obs2.partialRowsIn.get} rows, expected $expectedPartials2 partials")
    } finally q2.stop()
  }

  test("reactive admission: a burst is refused down to bounded batches and respooled") {
    import java.nio.file.{Files, Paths}
    val inDir = Files.createTempDirectory("adm_in").toString
    val ck = Files.createTempDirectory("adm_ck").toString
    // burst: one file with 1000 records arriving at once
    Files.write(Paths.get(inDir, "burst.txt"),
      (1 to 1000).map(i => f"rec-$i%04d").mkString("\n").getBytes("UTF-8"))

    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val delivered = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val exporter = new Exporter {
      def export(df: org.apache.spark.sql.DataFrame): Unit = ()
      override def exportBatch(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
        val rows = df.collect().map(_.getString(0))
        if (rows.nonEmpty) { batchSizes.add(rows.length.toLong); rows.foreach(delivered.add) }
      }
    }
    // refuse = respool the overflow into the source dir: upstream
    // backpressure — later triggers re-admit it in bounded chunks.
    // Idempotent per batchId: the respool file name derives from the
    // batchId and is REPLACED on replay, never appended — a mid-batch
    // failure after refuse() must not duplicate the overflow.
    val refuse: (org.apache.spark.sql.DataFrame, Long) => Unit = (df, batchId) => {
      val lines = df.collect().map(_.getString(0))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(inDir, f"refused-$batchId%06d.txt"),
        lines.mkString("\n").getBytes("UTF-8"))
    }

    val q = StreamingPipelines.exportStreamAdmitted(
      spark.readStream.text(inDir), exporter, ck,
      maxRowsPerBatch = 300, order = Seq(col("value")), refuse)
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (delivered.size() < 1000 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        Thread.sleep(100)
      }
    } finally q.stop()
    assert(delivered.size() == 1000, s"all burst rows eventually admitted: ${delivered.size()}")
    val sizes = batchSizes.toArray(Array.empty[java.lang.Long]).map(_.toLong)
    assert(sizes.forall(_ <= 300), s"every trigger bounded: ${sizes.mkString(",")}")
    assert(sizes.length >= 4, s"burst spread over multiple triggers: ${sizes.mkString(",")}")
  }

  test("bytes-budget memory limiter: soft slice refused and drained, hard overflow dropped with counters") {
    import java.nio.file.{Files, Paths}
    val inDir = Files.createTempDirectory("mlim_in").toString
    val ck = Files.createTempDirectory("mlim_ck").toString
    // burst: 1000 records × 8 bytes = 8000 observed bytes against a
    // soft budget of 800 (admit ≤100 rows/trigger) and a hard budget
    // of 4000 (anything past row 500 in the first trigger is shed)
    Files.write(Paths.get(inDir, "burst.txt"),
      (1 to 1000).map(i => f"rec-$i%04d").mkString("\n").getBytes("UTF-8"))

    val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val delivered = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val exporter = new Exporter {
      def export(df: org.apache.spark.sql.DataFrame): Unit = ()
      override def exportBatch(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
        val rows = df.collect().map(_.getString(0))
        if (rows.nonEmpty) { batchSizes.add(rows.length.toLong); rows.foreach(delivered.add) }
      }
    }
    val refuse: (org.apache.spark.sql.DataFrame, Long) => Unit = (df, batchId) => {
      val lines = df.collect().map(_.getString(0))
      Files.write(Paths.get(inDir, f"refused-$batchId%06d.txt"),
        lines.mkString("\n").getBytes("UTF-8"))
    }
    val obs = new StreamingPipelines.LimiterObs
    val q = StreamingPipelines.exportStreamBytesBudget(
      spark.readStream.text(inDir), exporter, ck,
      softBytes = 800, hardBytes = 4000,
      orderCol = substring(col("value"), 5, 4).cast("int"),
      sizeOf = length(col("value")), refuse, obs)
    try {
      val deadline = System.currentTimeMillis() + 60000
      while (delivered.size() < 500 && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
        Thread.sleep(100)
      }
      q.processAllAvailable()
    } finally q.stop()
    // refuse-then-drain: the soft slice (rows 101-500 of trigger 1)
    // respooled and re-admitted in ≤100-row budget chunks
    assert(delivered.size() == 500, s"soft slice fully drained: ${delivered.size()}")
    assert((1 to 500).forall(i => delivered.contains(f"rec-$i%04d")),
      "admitted set is exactly the in-budget prefix")
    val sizes = batchSizes.toArray(Array.empty[java.lang.Long]).map(_.toLong)
    assert(sizes.forall(_ <= 100), s"every trigger within the soft budget: ${sizes.mkString(",")}")
    assert(sizes.length >= 5, s"burst spread over multiple triggers: ${sizes.mkString(",")}")
    // the hard-limit shed is counted, not silent
    assert(obs.droppedRows.get() == 500, s"dropped ${obs.droppedRows.get()}")
    assert(obs.droppedBytes.get() == 4000, s"dropped bytes ${obs.droppedBytes.get()}")
    assert(obs.admittedRows.get() == 500)
    assert(obs.refusedRows.get() == 400 + 300 + 200 + 100,
      s"refused ${obs.refusedRows.get()}") // each trigger respools the remainder
  }

  test("events-as-logs receiver produces the canonical log schema") {
    val logs = OtlpJsonSource.eventsAsLogs(spark, sf)
    assert(logs.count() == Tables(spark, sf, "events").count())
    assert(logs.schema.fieldNames.toSet ==
      graft.model.OtelModel.logSchema.fieldNames.toSet)
  }

  test("streaming line dedup: first owner keeps across batches, replay idempotent") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, Int, String)]
    val out = graft.streaming.StreamingPipelines.streamingLineDedup(spark, ms.toDS())
    val q = out.toDF("doc_id", "pos", "seg", "keep").writeStream
      .outputMode("append").format("memory").queryName("sld_out").start()
    try {
      // batch 1: doc 0 owns both segments; doc 2's copy drops in-batch
      ms.addData((0L, 0, "a b c d"), (0L, 1, "e f g h"), (2L, 0, "a b c d"))
      q.processAllAvailable()
      // batch 2: doc 1 re-sends a seen segment (drops ACROSS batches),
      // adds a unique one (keeps); the owner instance replays → keeps
      ms.addData((1L, 0, "a b c d"), (1L, 1, "p q r s"), (0L, 0, "a b c d"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, pos, keep FROM sld_out").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
      val verdict = rows.groupBy(t => (t._1, t._2))
        .view.mapValues(_.map(_._3).toSet).toMap
      assert(verdict((0L, 0)) == Set(true))  // owner, incl. its replay
      assert(verdict((0L, 1)) == Set(true))
      assert(verdict((2L, 0)) == Set(false))
      assert(verdict((1L, 0)) == Set(false)) // seen in an earlier batch
      assert(verdict((1L, 1)) == Set(true))
      // converges to the batch twin replayed in doc order
      val batchDocs = Seq((0L, "a b c d e f g h"), (1L, "a b c d p q r s"),
        (2L, "a b c d e f g h")).toDF("doc_id", "text")
      val twinKept = graft.operators.DedupOps
        .lineDedup(batchDocs, "doc_id", "text", window = 4)
        .agg(org.apache.spark.sql.functions.sum("n_kept")).head().getLong(0)
      assert(verdict.count(_._2 == Set(true)).toLong == twinKept)
    } finally q.stop()
  }
  test("streaming url refetch dedup: first fetch owns the canonical url across triggers; converges to the batch url_canon composition") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sql = spark.sqlContext
    // batch truth: the q_url_canon synthesis + keyed-min keep at
    // sf0.001 — the composition the monitor is the live twin of
    val batch = SparkEntry.queries("q_url_canon")(spark, "/root/testdata/sf0.001")
      .select("doc_id", "url_raw", "url_canon", "keep").collect()
    val fetches = batch.map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val batchKept = batch.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    val batchCanon = batch.map(r => r.getLong(0) -> r.getString(2)).toMap
    val ms = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamingPipelines.streamingUrlDedup(
      spark, ms.toDS().toDF("doc_id", "url_raw"))
    val q = out.toDF("doc_id", "url_raw", "url_canon", "keep").writeStream
      .outputMode("append").format("memory").queryName("sud_out").start()
    try {
      // doc-id-ordered slices: the convergence precondition (the
      // streamingLineDedup trade — arbitrary arrival order converges
      // to SOME consistent first-owner set, id order to the batch one)
      val slices = fetches.grouped(math.max(1, fetches.length / 3)).toSeq
      slices.foreach { s => ms.addData(s.toSeq); q.processAllAvailable() }
      // replay the first slice verbatim: verdicts must not change
      ms.addData(slices.head.toSeq); q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, url_canon, keep FROM sud_out")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
      val verdict = rows.groupBy(_._1).view
        .mapValues(_.map(_._3).toSet).toMap
      // replay-idempotent: every doc saw exactly ONE verdict value
      assert(verdict.values.forall(_.size == 1),
        s"flapping verdicts: ${verdict.filter(_._2.size > 1).keys.take(5)}")
      // the canonical stamp matches the batch kernel byte-for-byte
      rows.foreach { case (d, canon, _) => assert(canon == batchCanon(d)) }
      // convergence: streaming keep set == the batch composition's
      val streamKept = verdict.collect { case (d, s) if s == Set(true) => d }.toSet
      assert(streamKept == batchKept,
        s"missing=${(batchKept -- streamKept).take(5)} extra=${(streamKept -- batchKept).take(5)}")
    } finally q.stop()
  }

  test("streaming caption dedup: first owner keeps the (image, caption) pair across triggers; converges to the batch gate; null keys cluster alone") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // batch truth: the §2 gate over the mirror-planted corpus —
    // keep = min doc_id per (img_id, cap_hash)
    val batch = SparkEntry.queries("q_caption_dedup")(spark, dir).collect()
    val batchKept = batch.filter(_.getAs[Boolean]("keep"))
      .map(_.getAs[Long]("doc_id")).toSet
    assert(batch.length > batchKept.size, "mirror dups must exist")
    // the stream input rebuilds the SAME planted corpus: docs plus
    // their d%50==0 mirror copies, (doc_id, img_id, text)
    val d = Tables(spark, dir, "documents")
    val mirrored = d.unionByName(
        d.filter(pmod(col("doc_id"), lit(50)) === 0)
          .withColumn("doc_id", col("doc_id") + lit(100000000L)))
      .select(col("doc_id"), pmod(col("doc_id"), lit(50)).as("img_id"),
        col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .sortBy(_._1)
    val ms = MemoryStream[(Long, Long, String)]
    val out = graft.streaming.StreamingPipelines.streamingCaptionDedup(
      spark, ms.toDF().toDF("doc_id", "img_id", "text"))
    val q = out.toDF("doc_id", "img_id", "cap_hash", "keep").writeStream
      .outputMode("append").format("memory").queryName("scd_out").start()
    try {
      // doc-id-ordered slices (the convergence precondition), then a
      // verbatim replay of the first slice: verdicts must not change
      val slices = mirrored.grouped(math.max(1, mirrored.length / 3)).toSeq
      slices.foreach { s => ms.addData(s.toSeq); q.processAllAvailable() }
      ms.addData(slices.head.toSeq); q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, keep FROM scd_out").collect()
        .map(r => (r.getLong(0), r.getBoolean(1)))
      val verdict = rows.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      assert(verdict.values.forall(_.size == 1),
        s"flapping verdicts: ${verdict.filter(_._2.size > 1).keys.take(5)}")
      val streamKept = verdict.collect { case (d0, s) if s == Set(true) => d0 }.toSet
      assert(streamKept == batchKept,
        s"missing=${(batchKept -- streamKept).take(5)} extra=${(streamKept -- batchKept).take(5)}")
    } finally q.stop()
  }

  test("streaming caption dedup: null caption and null image identities form their own clusters, never merging with data") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Option[Long], Option[Long], Option[String])]
    val out = graft.streaming.StreamingPipelines.streamingCaptionDedup(
      spark, ms.toDF().toDF("doc_id", "img_id", "text"))
    val q = out.toDF("doc_id", "img_id", "cap_hash", "keep").writeStream
      .outputMode("append").format("memory").queryName("scd_null_out").start()
    try {
      // (img 7, null caption) twice → one cluster, first keeps;
      // (null img, caption "c") twice → one cluster, first keeps;
      // (img 7, caption "c") is a DIFFERENT cluster from both;
      // a malformed NULL-doc_id row is excluded, never kills the
      // query (the tuple encoder would throw on null→Long — review
      // wave; the streamingUrlDedup null-guard discipline)
      ms.addData((Some(1L), Some(7L), None), (Some(2L), Some(7L), None),
        (Some(3L), None, Some("c")), (Some(4L), None, Some("c")),
        (Some(5L), Some(7L), Some("c")), (None, Some(7L), Some("c")))
      q.processAllAvailable()
      val keep = spark.sql("SELECT doc_id, keep FROM scd_null_out").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(keep == Map(1L -> true, 2L -> false, 3L -> true,
        4L -> false, 5L -> true), keep)
    } finally q.stop()
  }

  test("live multimodal arc: streamingCaptionDedup gates the spam-planted pair stream, then streamingPairAlign rebuilds the CLEAN batch census") {
    // the streaming mirror of the batch capstone pin (caption_dedup →
    // pair_align_report filing exactly the clean flagship census over
    // a spam-planted pair table): the gate keeps exactly the clean
    // base, and the monitor's final state over the gated sims
    // rebuilds q_pair_align row-for-row via suffix sums.
    val spark2 = spark
    import spark2.implicits._
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val base = DataPipelineQueries.pairAlignPairs(spark, dir)
      .select(col("pid").as("doc_id"),
        pmod(col("pid"), lit(50)).as("img_id"),
        concat(lit("cap-"), col("pid")).as("caption"),
        col("source"),
        graft.operators.AnnOps.cosine(col("te"), col("ie")).as("sim"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3), r.getDouble(4)))
    // planted spam: byte-identical (image, caption) refetches of the
    // d%50==0 pairs at +1,000,000 — same construction as the batch arc
    val spam = base.filter(_._1 % 50 == 0)
      .map { case (d0, i, c, s, v) => (d0 + 1000000L, i, c, s, v) }
    assert(spam.nonEmpty)
    val polluted = (base ++ spam).sortBy(_._1)
    // stage 1: the gate over (doc_id, img_id, caption)
    val ms1 = MemoryStream[(Long, Long, String)]
    val gate = graft.streaming.StreamingPipelines.streamingCaptionDedup(
      spark, ms1.toDF().toDF("doc_id", "img_id", "text"))
    val q1 = gate.toDF("doc_id", "img_id", "cap_hash", "keep").writeStream
      .outputMode("append").format("memory").queryName("arc_gate_out").start()
    try {
      polluted.grouped(math.max(1, polluted.length / 3)).foreach { s =>
        ms1.addData(s.map(t => (t._1, t._2, t._3)).toSeq)
        q1.processAllAvailable()
      }
      val kept = spark.sql("SELECT doc_id FROM arc_gate_out WHERE keep")
        .collect().map(_.getLong(0)).toSet
      // the gate keeps EXACTLY the clean base (id order: originals
      // arrive before their +1M spam copies)
      assert(kept == base.map(_._1).toSet,
        s"gate kept ${kept.size} vs base ${base.length}")
      // stage 2: the alignment monitor over the GATED pairs' sims
      val gatedSims = polluted.filter(t => kept.contains(t._1))
        .map(t => (t._4, t._5))
      val ms2 = MemoryStream[(String, Double)]
      val mon = graft.streaming.StreamingPipelines.streamingPairAlign(
        ms2.toDF().toDF("source", "sim"))
      val q2 = mon.writeStream.outputMode("update")
        .format("memory").queryName("arc_mon_out").start()
      try {
        gatedSims.grouped(math.max(1, gatedSims.length / 3)).foreach { s =>
          ms2.addData(s.toSeq); q2.processAllAvailable()
        }
        val cells = spark.sql(
            """SELECT source, bucket, MAX(n_pairs) AS n FROM arc_mon_out
              |GROUP BY source, bucket""".stripMargin).collect()
          .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
        // the arc's final state == the CLEAN flagship census,
        // every (source, threshold) row
        val expect = SparkEntry.queries("q_pair_align")(spark, dir).collect()
        assert(expect.nonEmpty)
        expect.foreach { r =>
          val (src, t) = (r.getAs[String]("source"), r.getAs[Long]("t_pct"))
          val mine = cells.collect {
            case ((s, b), n) if s == src && b >= t => n
          }.sum
          assert(mine == r.getAs[Long]("n_keep"),
            s"($src, $t): arc $mine vs clean batch ${r.getAs[Long]("n_keep")}")
          val total = cells.collect { case ((s, _), n) if s == src => n }.sum
          assert(total == r.getAs[Long]("n_pairs"))
        }
      } finally q2.stop()
    } finally q1.stop()
  }

  test("streaming text-fix monitor: per-source repair state converges to the q_text_fix census on an identically doctored stream") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // rebuild the census's doctoring INDEPENDENTLY (drift fails the
    // pin loudly): doc_id ≡ 0 mod 7 gains every mojibake class
    val suffix = " caf\u00C3\u00A9 \u00C3\u00A8\u00C3\u00BC\u00C3\u00B1\u00C3\u00A7" +
      " \u00E2\u20AC\u2122\u00E2\u20AC\u0153\u00E2\u20AC\u201D fin"
    val doctored = Tables(spark, dir, "documents")
      .select(col("source"),
        when(pmod(col("doc_id"), lit(7)) === 0,
          concat(col("text"), lit(suffix))).otherwise(col("text")).as("m"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val ms = MemoryStream[(String, String)]
    val out = graft.streaming.StreamingPipelines.streamingTextFix(
      ms.toDF().toDF("source", "text"))
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("stf_out").start()
    try {
      doctored.grouped(math.max(1, doctored.length / 3)).foreach { s =>
        ms.addData(s.toSeq); q.processAllAvailable()
      }
      // update mode re-emits growing cells — latest per source wins
      val cells = spark.sql(
          """SELECT source, MAX(n_docs), MAX(n_mojibake_docs),
            |  MAX(chars_recovered) FROM stf_out GROUP BY source""".stripMargin)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      val census = SparkEntry.queries("q_text_fix")(spark, dir).collect()
        .map(r => r.getAs[String]("source") ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_mojibake_docs"),
            r.getAs[Long]("chars_recovered")))).toMap
      assert(cells == census, s"monitor≠census: " +
        s"only-monitor=${(cells.toSet -- census.toSet).take(3)} " +
        s"only-census=${(census.toSet -- cells.toSet).take(3)}")
      assert(census.values.map(_._2).sum > 0, "doctoring planted nothing")
    } finally q.stop()
  }

  test("streaming text-normalize monitor: per-source folding state converges to the q_text_normalize census rolled up per source") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // rebuild the census's doctoring INDEPENDENTLY (doc_id mod 4
    // classes: smart punctuation / zero-widths / NBSP / clean)
    val suffix = when(pmod(col("doc_id"), lit(4)) === 0,
        lit(" don\u2019t \u201Cquote\u201D \u2014 dash"))
      .when(pmod(col("doc_id"), lit(4)) === 1,
        lit(" zero\u200Bwidth\uFEFFjoined"))
      .when(pmod(col("doc_id"), lit(4)) === 2,
        lit(" non\u00A0breaking\u00A0space"))
      .otherwise(lit(""))
    val doctored = Tables(spark, dir, "documents")
      .select(col("source"), concat(col("text"), suffix).as("m"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val ms = MemoryStream[(String, String)]
    val out = graft.streaming.StreamingPipelines.streamingTextNormalize(
      ms.toDF().toDF("source", "text"))
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("stn_out").start()
    try {
      doctored.grouped(math.max(1, doctored.length / 3)).foreach { s =>
        ms.addData(s.toSeq); q.processAllAvailable()
      }
      val cells = spark.sql(
          """SELECT source, MAX(n_docs), MAX(n_normalized_docs),
            |  MAX(chars_stripped) FROM stn_out GROUP BY source""".stripMargin)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      // the batch side: the \u00A72 census (per-doc changed/n_stripped on
      // the SAME mod-4 doctoring) rolled up per source \u2014 a DIFFERENT
      // aggregation path over the same kernel, so monitor and census
      // cannot drift apart silently
      val perDoc = SparkEntry.queries("q_text_normalize")(spark, dir)
      val census = perDoc
        .join(Tables(spark, dir, "documents").select(col("doc_id"),
          col("source")), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("changed"), 1L).otherwise(0L)).as("nc"),
          sum(col("n_stripped")).cast("long").as("cs"))
        .collect().map(r => r.getAs[String]("source") ->
          ((r.getAs[Long]("n"), r.getAs[Long]("nc"), r.getAs[Long]("cs"))))
        .toMap
      assert(cells == census, s"monitor\u2260census: " +
        s"only-monitor=${(cells.toSet -- census.toSet).take(3)} " +
        s"only-census=${(census.toSet -- cells.toSet).take(3)}")
      // the mod-4 classes planted real work: folds fired (changed
      // docs) AND strips fired (chars_stripped > 0 \u2014 class 1 is the
      // only length-changing class, planted on ~1/4 of docs)
      assert(census.values.map(_._2).sum > 0, "no doc folded")
      assert(census.values.map(_._3).sum > 0, "no char stripped")
    } finally q.stop()
  }

  test("live decode arc: textFix \u2192 textNormalize \u2192 piiScrub as ONE streaming chain matches the batch composition; the stage order is load-bearing") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sql = spark.sqlContext
    import graft.operators.TextOps
    val dir = "/root/testdata/sf0.001"
    // per-stage planted evidence, all three classes interacting:
    //  - every doc carries a ZERO-WIDTH-corrupted email \u2014 only after
    //    the normalize stage strips U+200B does the email mask whole
    //    (scrub-first would leave 'us\u200B' in clear and mask a shorter
    //    tail) \u2014 the order evidence;
    //  - mod-7 docs carry a mojibake suffix (stage 1 work);
    //  - mod-4 docs carry smart punctuation (stage 2 work).
    val doctored = Tables(spark, dir, "documents")
      .select(col("source"), concat(col("text"),
        when(pmod(col("doc_id"), lit(7)) === 0,
          lit(" caf\u00C3\u00A9 \u00E2\u20AC\u2122end")).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(4)) === 0,
          lit(" \u201Csmart\u201D \u2014 punct")).otherwise(lit("")),
        lit(" mail us\u200Ber"), col("doc_id"), lit("@ex.com")).as("m"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    // the LIVE chain: both repair kernels as stateless projections
    // feeding the ONE stateful scrub monitor \u2014 a single streaming
    // query, exactly how a deployment wires the decode layer
    val ms = MemoryStream[(String, String)]
    val cleaned = ms.toDF().toDF("source", "text")
      .withColumn("text", TextOps.normalizeConfusables(
        TextOps.fixMojibake(col("text"))))
    val out = graft.streaming.StreamingPipelines.streamingPiiScrub(cleaned)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("arc_decode_out").start()
    try {
      doctored.grouped(math.max(1, doctored.length / 3)).foreach { s =>
        ms.addData(s.toSeq); q.processAllAvailable()
      }
      val cells = spark.sql(
          """SELECT source, MAX(n_docs), MAX(n_email_docs),
            |  MAX(chars_removed) FROM arc_decode_out GROUP BY source""".stripMargin)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      // batch composition of the SAME kernels in the SAME order
      // (streamingPiiScrub is plain DataFrame ops \u2014 it IS the batch
      // aggregate when fed a batch frame)
      def batchScrub(repair: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
          : Map[String, (Long, Long, Long)] =
        graft.streaming.StreamingPipelines.streamingPiiScrub(
            doctored.toSeq.toDF("source", "text")
              .withColumn("text", repair(col("text"))))
          .collect().map(r => r.getAs[String]("source") ->
            ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_email_docs"),
              r.getAs[Long]("chars_removed")))).toMap
      val batch = batchScrub(t =>
        TextOps.normalizeConfusables(TextOps.fixMojibake(t)))
      assert(cells == batch, s"arc\u2260batch: " +
        s"only-arc=${(cells.toSet -- batch.toSet).take(3)} " +
        s"only-batch=${(batch.toSet -- cells.toSet).take(3)}")
      // every doc's zero-width email masked whole: n_email_docs ==
      // n_docs in every source
      assert(batch.values.forall(v => v._2 == v._1), batch.toString)
      // ORDER evidence: skipping the normalize stage leaves the
      // zero-width in clear and masks a shorter email tail \u2014 the
      // removed-chars audit must differ (by exactly the planted
      // 'us\u200B' prefix class, but the sign of life is the inequality)
      val noNormalize = batchScrub(t => TextOps.fixMojibake(t))
      assert(noNormalize.values.map(_._3).sum !=
        batch.values.map(_._3).sum,
        "normalize stage did no observable work before the scrub")
    } finally q.stop()
  }

  test("streaming pii-scrub monitor: per-source audit state converges to q_pii_redact on the identically synthesized stream") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // rebuild the census's planted-contact synthesis independently
    val synth = Tables(spark, dir, "documents")
      .select(col("source"), concat(col("text"), lit(" contact user"),
        col("doc_id"), lit("@"), col("source"), lit(".com ref "),
        pmod(col("doc_id") * 7919, lit(10000)),
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit(" ip "), pmod(col("doc_id"), lit(256)), lit("."),
            pmod(col("doc_id") * 7, lit(256)), lit("."),
            pmod(col("doc_id") * 13, lit(256)), lit("."),
            pmod(col("doc_id") * 29, lit(256)))).otherwise(lit("")),
        when(pmod(col("doc_id"), lit(3)) === 0,
          concat(lit(" call +"),
            lit(10000000L) + pmod(col("doc_id") * 31, lit(90000000L))))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(5)) === 4, lit(" node 999.1.2.3"))
          .otherwise(lit("")),
        when(pmod(col("doc_id"), lit(7)) === 5,
          concat(lit(" mail First.Last+tag"), col("doc_id"),
            lit("@Sub.Example.co.uk"))).otherwise(lit(""))).as("synth"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val ms = MemoryStream[(String, String)]
    val out = graft.streaming.StreamingPipelines.streamingPiiScrub(
      ms.toDF().toDF("source", "text"))
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("sps_out").start()
    try {
      synth.grouped(math.max(1, synth.length / 3)).foreach { s =>
        ms.addData(s.toSeq); q.processAllAvailable()
      }
      // chars_removed is a SIGNED cumulative (short digit runs grow
      // under <NUM>) — MAX would pick a stale emission; the latest
      // state per source is the row with its strictly-growing n_docs
      val cells = spark.table("sps_out").collect()
        .map(r => (r.getAs[String]("source"), (r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_email_docs"), r.getAs[Long]("n_ip_docs"),
          r.getAs[Long]("n_phone_docs"), r.getAs[Long]("chars_removed"))))
        .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._1)).toMap
      val census = SparkEntry.queries("q_pii_redact")(spark, dir).collect()
        .map(r => r.getAs[String]("source") ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_email_docs"),
            r.getAs[Long]("n_ip_docs"), r.getAs[Long]("n_phone_docs"),
            r.getAs[Long]("chars_removed")))).toMap
      assert(cells == census, s"monitor≠census: " +
        s"only-monitor=${(cells.toSet -- census.toSet).take(3)} " +
        s"only-census=${(census.toSet -- cells.toSet).take(3)}")
      // every mask class fired somewhere at this SF
      assert(census.values.map(_._2).sum > 0)
      assert(census.values.map(_._3).sum > 0)
      assert(census.values.map(_._4).sum > 0)
    } finally q.stop()
  }

  test("streaming mime-sniff monitor: the live blob-type census converges to q_mime_sniff on identically planted blobs") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // rebuild the census's planted magic bytes independently (the
    // synthesis discipline: drift fails the pin loudly)
    val blobs = Tables(spark, dir, "documents")
      .select(concat(
        when(pmod(col("doc_id"), lit(4)) === 0,
          unhex(lit("89504E470D0A1A0A")))
          .when(pmod(col("doc_id"), lit(4)) === 1, unhex(lit("FFD8FFE0")))
          .when(pmod(col("doc_id"), lit(4)) === 2, unhex(lit("474946383961")))
          .otherwise(lit(Array.empty[Byte])),
        col("text").cast("binary")).as("blob"))
      .collect().map(r => r.getAs[Array[Byte]](0))
    val ms = MemoryStream[Array[Byte]]
    val out = graft.streaming.StreamingPipelines.streamingMimeSniff(
      ms.toDF().toDF("blob"))
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("sms_out").start()
    try {
      blobs.grouped(math.max(1, blobs.length / 3)).foreach { s =>
        ms.addData(s.toSeq); q.processAllAvailable()
      }
      // n_blobs and total_bytes both grow monotonically per mime
      val cells = spark.sql(
          "SELECT mime, MAX(n_blobs), MAX(total_bytes) FROM sms_out GROUP BY 1")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      val census = SparkEntry.queries("q_mime_sniff")(spark, dir).collect()
        .map(r => r.getAs[String]("mime") ->
          ((r.getAs[Long]("n_blobs"), r.getAs[Long]("total_bytes")))).toMap
      assert(cells == census, s"monitor≠census: " +
        s"only-monitor=${(cells.toSet -- census.toSet).take(3)} " +
        s"only-census=${(census.toSet -- cells.toSet).take(3)}")
      assert(census.size >= 4, s"planted types missing: ${census.keys}")
      // r17 advice: an ALL-NULL trigger slice (every blob null —
      // sniffed octet-stream, zero bytes) must not null the
      // total_bytes cell: sum(length) over only-null rows is NULL
      // without the coalesce guard. n_blobs grows by the slice,
      // total_bytes holds its value.
      val octBefore = cells("application/octet-stream")
      ms.addData(Seq[Array[Byte]](null, null))
      q.processAllAvailable()
      val oct = spark.sql(
          "SELECT MAX(n_blobs), MAX(total_bytes), COUNT(CASE WHEN total_bytes IS NULL THEN 1 END) " +
          "FROM sms_out WHERE mime = 'application/octet-stream'")
        .collect().head
      assert(oct.getLong(2) == 0L, "a NULL total_bytes cell reached the sink")
      assert(oct.getLong(0) == octBefore._1 + 2L && oct.getLong(1) == octBefore._2,
        s"got (${oct.getLong(0)}, ${oct.getLong(1)}), want (${octBefore._1 + 2}, ${octBefore._2})")
    } finally q.stop()
  }

  test("streaming lang-id monitor: the live confusion matrix converges to q_lang_id row-for-row") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val rows = Tables(spark, dir, "documents")
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val ms = MemoryStream[(String, String)]
    val out = graft.streaming.StreamingPipelines.streamingLangId(
      ms.toDF().toDF("lang", "text"))
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("sli_out").start()
    try {
      rows.grouped(math.max(1, rows.length / 3)).foreach { s =>
        ms.addData(s.toSeq); q.processAllAvailable()
      }
      val cells = spark.sql(
          "SELECT lang, predicted, MAX(n) FROM sli_out GROUP BY 1, 2")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val census = SparkEntry.queries("q_lang_id")(spark, dir).collect()
        .map(r => (r.getAs[String]("lang"), r.getAs[String]("predicted")) ->
          r.getAs[Long]("n")).toMap
      assert(cells == census, s"monitor≠census: " +
        s"only-monitor=${(cells.toSet -- census.toSet).take(3)} " +
        s"only-census=${(census.toSet -- cells.toSet).take(3)}")
    } finally q.stop()
  }

  test("streaming trigram lang-id monitor: the per-row scorer equals the batch window/join pipeline, and the live state converges under slicing") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val docsDf = Tables(spark, dir, "documents")
    val profile = DataPipelineQueries.trigramLangProfile(docsDf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long](2))).toSeq
    assert(profile.nonEmpty && profile.map(_._1).distinct.size >= 2)
    // PARITY: the per-row scorer (uncapped, the same math as the
    // batch window/join pipeline: rank key (count desc, tri asc),
    // out-of-place distance with absent = R, argmin tie on lang asc)
    // must reproduce q_lang_trigram's held-out confusion EXACTLY —
    // prediction-for-prediction, aggregated
    val held = docsDf.filter(length(col("text")) >= 3 &&
        pmod(col("doc_id"), lit(5)) === 0)
      .select(col("lang"), col("text"))
    val perRow = graft.streaming.StreamingPipelines.streamingLangIdTrigram(
        held, profile, maxChars = 0)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val census = SparkEntry.queries("q_lang_trigram")(spark, dir).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("predicted")) ->
        r.getAs[Long]("n_docs")).toMap
    assert(perRow == census, s"per-row≠batch: " +
      s"only-perrow=${(perRow.toSet -- census.toSet).take(3)} " +
      s"only-batch=${(census.toSet -- perRow.toSet).take(3)}")
    // depth-r truncation contract (review-wave finding): running a
    // DEEP profile at a shallower r must equal pre-truncating the
    // profile to rank <= r — never score a rank-150 match against an
    // absent penalty of 100
    val shallow = graft.operators.TextOps.withTrigramLangId(
        held, "text", "predicted", profile, maxChars = 0, r = 100)
      .groupBy(col("lang"), col("predicted")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val pretrunc = graft.operators.TextOps.withTrigramLangId(
        held, "text", "predicted", profile.filter(_._3 <= 100),
        maxChars = 0, r = 100)
      .groupBy(col("lang"), col("predicted")).count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(shallow == pretrunc)
    // CONVERGENCE under trigger slicing at the production prefix cap
    // (maxChars=400 bounds per-row work — language ID reads a
    // sample, not the document): final state == the same monitor on
    // the batch frame, counts associative
    val rows = docsDf.select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val ms = MemoryStream[(String, String)]
    val out = graft.streaming.StreamingPipelines.streamingLangIdTrigram(
      ms.toDF().toDF("lang", "text"), profile)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("slt_out").start()
    try {
      rows.grouped(math.max(1, rows.length / 3)).foreach { s =>
        ms.addData(s.toSeq); q.processAllAvailable()
      }
      val cells = spark.sql(
          "SELECT lang, predicted, MAX(n) FROM slt_out GROUP BY 1, 2")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val batch = graft.streaming.StreamingPipelines.streamingLangIdTrigram(
          rows.toSeq.toDF("lang", "text"), profile)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(cells == batch, s"monitor≠batch: " +
        s"only-monitor=${(cells.toSet -- batch.toSet).take(3)} " +
        s"only-batch=${(batch.toSet -- cells.toSet).take(3)}")
    } finally q.stop()
  }

  test("streaming gopher-rules monitor: the live violation census converges to q_gopher_rules and a quality collapse surfaces in its rule column") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val rows = Tables(spark, dir, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val ms = MemoryStream[(String, String)]
    val out = graft.streaming.StreamingPipelines.streamingGopherRules(
      ms.toDF().toDF("source", "text"))
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("sgr_out").start()
    def latest() = spark.table("sgr_out").collect()
      .map(r => (r.getAs[String]("source"), (r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_pass"), r.getAs[Long]("v_word_count"),
        r.getAs[Long]("v_mean_len"), r.getAs[Long]("v_symbol"),
        r.getAs[Long]("v_alpha"), r.getAs[Long]("v_stop"))))
      // latest state per source = the row with the strictly-growing
      // n_docs (every emission for a key follows an arrival)
      .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._1)).toMap
    try {
      rows.grouped(math.max(1, rows.length / 3)).foreach { s =>
        ms.addData(s.toSeq); q.processAllAvailable()
      }
      val census = SparkEntry.queries("q_gopher_rules")(spark, dir)
        .collect().map(r => (r.getAs[String]("source"), (r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_pass"), r.getAs[Long]("v_word_count"),
          r.getAs[Long]("v_mean_len"), r.getAs[Long]("v_symbol"),
          r.getAs[Long]("v_alpha"), r.getAs[Long]("v_stop")))).toMap
      val cells = latest()
      assert(cells == census, s"monitor≠census: " +
        s"only-monitor=${(cells.toSet -- census.toSet).take(2)} " +
        s"only-census=${(census.toSet -- cells.toSet).take(2)}")
      // a mid-crawl quality collapse surfaces live AND names its
      // rule: a symbol-flooded stub page fails r_sym (###… mass) and
      // r_wc (under the 50-word floor) by construction
      val src = rows.head._1
      ms.addData((src, "### " * 10))
      q.processAllAvailable()
      val after = latest()
      val (b, a) = (census(src), after(src))
      assert(a._1 == b._1 + 1 && a._2 == b._2, s"$b -> $a")
      assert(a._5 == b._5 + 1 && a._3 == b._3 + 1, s"$b -> $a")
      assert(after.filter(_._1 != src) == census.filter(_._1 != src))
    } finally q.stop()
  }

  test("streaming decontamination monitor: per-source verdicts converge to q_decontaminate's pair frame; a spiked benchmark doc alerts live") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val docsDf = Tables(spark, dir, "documents")
    val postings = DataPipelineQueries.decontamPostings(docsDf)
    assert(postings.nonEmpty)
    // batch truth: the census's own pair frame, reduced to the
    // per-doc verdict (any eval pair at the cutoff), per source
    val contaminated = SparkEntry.queries("q_decontaminate")(spark, dir)
      .select("train_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(contaminated.nonEmpty, "vacuous pin: no contaminated docs")
    val train = docsDf.filter(col("doc_id") >= 25)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = train.groupBy(_._2).view.mapValues { rs =>
      (rs.length.toLong, rs.count(r => contaminated(r._1)).toLong)
    }.toMap
    val ms = MemoryStream[(String, String)]
    val out = graft.streaming.StreamingPipelines.streamingDecontam(
      ms.toDF().toDF("source", "text"), postings)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("sdc_out").start()
    def latest() = spark.table("sdc_out").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._1)).toMap
    try {
      val rows = train.map(r => (r._2, r._3))
      rows.grouped(math.max(1, rows.length / 3)).foreach { s =>
        ms.addData(s.toSeq); q.processAllAvailable()
      }
      val cells = latest()
      assert(cells == expected, s"monitor≠batch: " +
        s"only-monitor=${(cells.toSet -- expected.toSet).take(3)} " +
        s"only-batch=${(expected.toSet -- cells.toSet).take(3)}")
      // a feed that starts swallowing benchmark text alerts live: an
      // eval doc's verbatim text shares >= its own shingle count with
      // itself (>= 3 once the doc has 7+ words — asserted, not assumed)
      val evalText = docsDf.filter(col("doc_id") < 25)
        .orderBy(length(col("text")).desc, col("doc_id"))
        .select(col("text")).head().getString(0)
      assert(evalText.trim.split("\\s+").length >= 7)
      ms.addData(("spiked", evalText))
      q.processAllAvailable()
      val after = latest()
      assert(after("spiked") == ((1L, 1L)), after.get("spiked").toString)
      assert(after.filter(_._1 != "spiked") == expected)
    } finally q.stop()
  }

  test("streaming embed-norm QA: the live ingest census converges to q_embed_norm_qa and counts a planted zero vector") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val base = Tables(spark, dir, "embeddings")
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray))
    val ms = MemoryStream[(Int, Array[Float])]
    val out = graft.streaming.StreamingPipelines.streamingEmbedNormQa(
      ms.toDF().toDF("label", "embedding"))
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("seq_out").start()
    try {
      base.grouped(math.max(1, base.length / 3)).foreach { s =>
        ms.addData(s.toSeq); q.processAllAvailable()
      }
      // latest state per label = the row with its strictly-growing
      // n_vecs (min/max columns are monotone but norm2 is a double —
      // the pii-scrub latest-state discipline)
      def latest(table: String) = spark.table(table).collect()
        .map(r => (r.getAs[Int]("label"), (r.getAs[Long]("n_vecs"),
          r.getAs[Long]("min_dim"), r.getAs[Long]("max_dim"),
          r.getAs[Double]("min_norm2"), r.getAs[Double]("max_norm2"),
          r.getAs[Long]("n_zero"))))
        .groupBy(_._1).view.mapValues(_.map(_._2).maxBy(_._1)).toMap
      val cells = latest("seq_out")
      val census = SparkEntry.queries("q_embed_norm_qa")(spark, dir)
        .collect().map(r => (r.getAs[Int]("label"), (r.getAs[Long]("n_vecs"),
          r.getAs[Long]("min_dim"), r.getAs[Long]("max_dim"),
          r.getAs[Double]("min_norm2"), r.getAs[Double]("max_norm2"),
          r.getAs[Long]("n_zero")))).toMap
      assert(cells == census, s"monitor≠census: " +
        s"only-monitor=${(cells.toSet -- census.toSet).take(2)} " +
        s"only-census=${(census.toSet -- cells.toSet).take(2)}")
      // a poison ingest surfaces live: one planted zero vector bumps
      // exactly its label's n_zero and floors min_norm2 at 0
      val lbl = base.head._1
      ms.addData((lbl, Array.fill(base.head._2.length)(0f)))
      q.processAllAvailable()
      val after = latest("seq_out")
      assert(after(lbl)._6 == census(lbl)._6 + 1, after(lbl).toString)
      assert(after(lbl)._4 == 0.0)
      assert(after.filter(_._1 != lbl) == census.filter(_._1 != lbl))
    } finally q.stop()
  }

  test("streaming pair-align monitor: bucket state converges under slicing and rebuilds the batch keep curve row-for-row") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sql = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    // the ONE shared kernel's static output, sliced into triggers
    val sims = DataPipelineQueries.pairAlignSims(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val ms = MemoryStream[(String, Double)]
    val out = graft.streaming.StreamingPipelines.streamingPairAlign(
      ms.toDF().toDF("source", "sim"))
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("pa_out").start()
    try {
      sims.grouped(math.max(1, sims.length / 3)).foreach { s =>
        ms.addData(s.toSeq); q.processAllAvailable()
      }
      // update mode re-emits a growing cell — latest = max
      val cells = spark.sql(
          """SELECT source, bucket, MAX(n_pairs) AS n FROM pa_out
            |GROUP BY source, bucket""".stripMargin).collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(cells.values.sum == sims.length.toLong)
      // the §2 keep curve rebuilds as suffix sums over the buckets:
      // bucket >= t ⟺ sim*100 >= t for every grid threshold t
      // (5-aligned buckets) — compare EVERY q_pair_align row
      val expect = SparkEntry.queries("q_pair_align")(spark, dir).collect()
      assert(expect.nonEmpty)
      expect.foreach { r =>
        val (src, t) = (r.getAs[String]("source"), r.getAs[Long]("t_pct"))
        val mine = cells.collect {
          case ((s, b), n) if s == src && b >= t => n
        }.sum
        assert(mine == r.getAs[Long]("n_keep"),
          s"($src, $t): monitor $mine vs batch ${r.getAs[Long]("n_keep")}")
        val total = cells.collect { case ((s, _), n) if s == src => n }.sum
        assert(total == r.getAs[Long]("n_pairs"))
      }
    } finally q.stop()
  }

  test("streaming pair-align monitor: poison sims (NaN/null) land in the -105 sentinel, distinct from a real -1.0 cosine") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    val out = graft.streaming.StreamingPipelines.streamingPairAlign(
      ms.toDF().toDF("source", "sim_s")
        .select(col("source"), col("sim_s").cast("double").as("sim")))
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("pa_nan_out").start()
    try {
      ms.addData(("s", "NaN"), ("s", null), ("s", "-1.0"), ("s", "1.0"))
      q.processAllAvailable()
      val cells = spark.sql(
          "SELECT bucket, MAX(n_pairs) FROM pa_nan_out GROUP BY bucket")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // poison pairs share the sentinel; the anti-aligned REAL pair
      // keeps its own -100 bucket (sentinel must not merge them —
      // review wave); no NULL bucket key anywhere
      assert(cells == Map(-105L -> 2L, -100L -> 1L, 100L -> 1L), cells)
    } finally q.stop()
  }

  test("streaming gap monitor: gaps across batch boundaries measure exactly, converging to the batch operator") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(String, Long)]
    val out = StreamingPipelines.streamingGapMonitor(spark, ms.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("gap_out").start()
    try {
      // series a: points in TWO batches — the 3→7 gap spans the
      // boundary and must measure 4, exactly as if in one batch
      ms.addData(Seq(("a", 1L), ("a", 3L), ("b", 10L)))
      q.processAllAvailable()
      ms.addData(Seq(("a", 7L), ("b", 25L)))
      q.processAllAvailable()
      val got = spark.sql("SELECT _1, _2, _3, _4 FROM gap_out ORDER BY _1, _2")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
      assert(got == Seq(
        ("a", 1L, -1L, true), ("a", 3L, 2L, false), ("a", 7L, 4L, false),
        ("b", 10L, -1L, true), ("b", 25L, 15L, false)), got)
      // convergence to the batch operator's aggregates: max/sum of
      // the emitted non-first gaps per series == one-shot LAG over
      // the full data (the q_metric_gaps semantics)
      val gaps = got.filterNot(_._4).groupBy(_._1)
        .map { case (k, rs) => k -> (rs.map(_._3).max, rs.map(_._3).sum) }
      assert(gaps == Map("a" -> ((4L, 6L)), "b" -> ((15L, 15L))))
    } finally q.stop()
  }

  test("streaming boilerplate: a segment crossing the bar across triggers flags once; flagged set converges to the batch census") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(Long, String, String)]
    val out = StreamingPipelines.streamingBoilerplate(spark, ms.toDS(),
      window = 4, minDocs = 2)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("bp_out").start()
    try {
      val header = "h1 h2 h3 h4"
      // batch 1: one doc of source a carries the header — not flagged
      ms.addData(Seq((1L, "a", s"$header u1 u2 u3 u4"),
        (3L, "b", s"$header w1 w2 w3 w4")))
      q.processAllAvailable()
      assert(spark.table("bp_out").count() == 0L)
      // batch 2: a SECOND source-a doc arrives → the header crosses
      // the bar ACROSS the trigger boundary and flags exactly once;
      // source b still has one carrier — quiet (per-source contract);
      // a replay of doc 1 must not double-flag
      ms.addData(Seq((2L, "a", s"$header v1 v2 v3 v4"), (1L, "a", s"$header u1 u2 u3 u4")))
      q.processAllAvailable()
      val got = spark.sql("SELECT _1, _2, _3 FROM bp_out").collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      assert(got.length == 1 && got.head._1 == "a" && got.head._3 == 2, got.toSeq)
      // a SPACEY source name survives the composite key round-trip
      // (the hash carries no spaces — last-space split), and the
      // [""]-tokenizing empty-doc edge flags exactly like the batch
      // census keeps it
      ms.addData(Seq((10L, "common crawl", "c1 c2 c3 c4"),
        (11L, "common crawl", "c1 c2 c3 c4"),
        (12L, "e", ""), (13L, "e", "   ")))
      q.processAllAvailable()
      val got2 = spark.sql("SELECT _1, _2, _3 FROM bp_out").collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
      assert(got2.exists(r => r._1 == "common crawl" && r._3 == 2), got2)
      // both empty-ish docs tokenize to [""] → same md5("") segment
      assert(got2.exists(r => r._1 == "e" && r._3 == 2), got2)
      // convergence: the flagged (source, hash) set equals the batch
      // census over the union
      val batchDocs = Seq((1L, "a", s"$header u1 u2 u3 u4"),
        (2L, "a", s"$header v1 v2 v3 v4"),
        (3L, "b", s"$header w1 w2 w3 w4")).toDF("doc_id", "source", "text")
      val census = graft.operators.DedupOps
        .boilerplate(batchDocs, "doc_id", "source", "text", window = 4, minDocs = 2)
        .collect().map(r => r.getString(0) -> r.getAs[Long]("n_boiler_segments")).toMap
      assert(census == Map("a" -> 1L))
    } finally q.stop()
  }

  test("streaming heavy hitters: running estimates equal the batch count-min sketch exactly; exact top terms surface") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val toks = Tables(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.explode(
        graft.operators.TextOps.tokens(col("text"))).as("term"))
      .collect().map(r => ("corpus", r.getString(0)))
    val ms = MemoryStream[(String, String)]
    val out = StreamingPipelines.streamingHeavyHitters(spark, ms.toDS(), k = 20)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("hh_out").start()
    try {
      val (b1, b2) = toks.splitAt(toks.length / 2)
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
      // each key's LATEST snapshot — max trig PER KEY, the documented
      // consumer pattern (a global max would drop keys idle in the
      // final trigger)
      val got = spark.sql(
        """SELECT term, est FROM (
          |  SELECT _1 AS k, _2 AS t, _3 AS term, _4 AS est,
          |    MAX(_2) OVER (PARTITION BY _1) AS mt FROM hh_out)
          |WHERE t = mt""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.nonEmpty)
      // kernel parity: every batch-query top-20 term the tracker
      // surfaced carries EXACTLY the batch sketch's estimate (same
      // md5 lane/bucket scheme over the union of both triggers)
      val batch = SparkEntry.queries("q_heavy_hitters")(spark, sf)
        .collect().map(r => r.getAs[String]("term") ->
          r.getAs[Long]("cm_est")).toMap
      val surfaced = batch.keySet.intersect(got.keySet)
      assert(surfaced.size >= 15,
        s"only ${surfaced.size}/20 exact top terms surfaced: $got")
      surfaced.foreach { t =>
        assert(got(t) == batch(t), s"term $t: streaming ${got(t)} vs batch ${batch(t)}")
      }
    } finally q.stop()
  }

  test("streaming decontamination: a rolling ingest probed against a frozen eval store converges to the batch operator") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val all = Tables(spark, sf, "documents").select("doc_id", "text")
    val evalDocs = all.filter(col("doc_id") < 25)
      .select(col("doc_id").as("eval_id"), col("text"))
    val train = all.filter(col("doc_id") >= 25)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val ms = MemoryStream[(Long, String)]
    val out = StreamingPipelines.streamingDecontaminate(spark,
      ms.toDS().toDF("doc_id", "text"), evalDocs)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("decon_out").start()
    try {
      // the ingest arrives in TWO batches — update-mode counts must
      // accumulate to the same totals as one batch pass
      val (b1, b2) = train.splitAt(train.length / 2)
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
      // update sink keeps every revision — latest count per pair wins
      val got = spark.sql(
        """SELECT train_id, eval_id, MAX(n_shared) AS n_shared
          |FROM decon_out GROUP BY train_id, eval_id""".stripMargin)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val batch = SparkEntry.queries("q_decontaminate")(spark, sf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      // the registered query filters n_shared >= 3; apply the same
      // bar to the streaming accumulation — and pin non-vacuity (a
      // regenerated corpus with no cross-split overlap would satisfy
      // empty == empty while verifying nothing)
      assert(batch.nonEmpty, "corpus carries no contaminated pairs")
      val flagged = got.filter(_._2 >= 3L)
      assert(flagged == batch, s"streaming ${flagged.size} vs batch ${batch.size}")
    } finally q.stop()
  }

  test("streaming counter resets: a restart across the trigger boundary detects exactly; converges to the batch kernel") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(String, Long, Double)]
    val out = StreamingPipelines.streamingCounterResets(spark, ms.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("resets_out").start()
    try {
      // series a restarts ACROSS the boundary (12 → 3); series b
      // restarts INSIDE batch 2 (9 → 2) — both must flag identically
      ms.addData(Seq(("a", 1L, 5.0), ("a", 2L, 12.0), ("b", 1L, 9.0)))
      q.processAllAvailable()
      ms.addData(Seq(("a", 3L, 3.0), ("b", 2L, 2.0), ("b", 3L, 6.0)))
      q.processAllAvailable()
      val got = spark.sql("SELECT _1, _2, _3, _4, _5 FROM resets_out ORDER BY _1, _2")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getBoolean(3), r.getDouble(4))).toSeq
      assert(got == Seq(
        ("a", 1L, 5.0, false, 5.0), ("a", 2L, 12.0, false, 7.0),
        ("a", 3L, 3.0, true, 3.0),
        ("b", 1L, 9.0, false, 9.0), ("b", 2L, 2.0, true, 2.0),
        ("b", 3L, 6.0, false, 4.0)), got)
      // row-for-row convergence to the batch kernel over the union
      val batch = graft.operators.MetricsOps.cumulativeToDeltaWithResets(
        Seq(("a", 1L, 5.0), ("a", 2L, 12.0), ("a", 3L, 3.0),
          ("b", 1L, 9.0), ("b", 2L, 2.0), ("b", 3L, 6.0))
          .toDF("series", "ord", "cum"),
        Seq("series"), "ord", "cum")
        .select("series", "ord", "cum", "is_reset", "delta_value")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getBoolean(3), r.getDouble(4))).toSeq.sorted
      assert(batch == got.sorted)
    } finally q.stop()
  }

  test("streaming gap monitor TTL: an evicted idle series re-enters as a FIRST point, never a giant stale gap") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(String, Long)]
    // poll the sink with a deadline — ProcessingTimeTimeout queries
    // never quiesce under processAllAvailable (the documented trade)
    val out = StreamingPipelines.streamingGapMonitor(spark, ms.toDS(),
      ttlMs = Some(200L))
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("gap_ttl_out").start()
    def awaitRows(n: Int): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (spark.table("gap_ttl_out").count() < n &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(spark.table("gap_ttl_out").count() >= n, s"sink never reached $n rows")
    }
    try {
      ms.addData(Seq(("a", 100L)))
      awaitRows(1)
      Thread.sleep(800) // idle past the TTL — the tracker evicts a
      ms.addData(Seq(("a", 900L)))
      awaitRows(2)
      val got = spark.sql("SELECT _2, _3, _4 FROM gap_ttl_out ORDER BY _2")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
      // re-entry is a first point (-1/true) — reporting 800 as a gap
      // would conflate eviction with a measured inter-arrival time
      assert(got == Seq((100L, -1L, true), (900L, -1L, true)), got)
    } finally q.stop()
  }

  test("streaming HLL cardinality state after N batches is bit-identical to the batch sketch of the union") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, max => smax}
    implicit val sql = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    val out = StreamingPipelines.streamingLabelCardinality(spark, ms.toDS())
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("hll_out").start()
    try {
      val batch1 = (0 until 400).map(i => ("svc_a:user", s"u$i")) ++
        (0 until 30).map(i => ("svc_b:code", s"c${i % 7}"))
      val batch2 = (200 until 700).map(i => ("svc_a:user", s"u$i")) ++
        Seq(("svc_b:code", "c9"))
      ms.addData(batch1); q.processAllAvailable()
      ms.addData(batch2); q.processAllAvailable()
      // latest emission per key = the running state after both
      // batches; bucket maxima only grow, so the denominator is
      // nonincreasing and min() IS the latest state
      val got = spark.sql("SELECT _1, min(_2) FROM hll_out GROUP BY _1")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // batch twin: SketchOps over the UNION of both batches — the
      // streaming state must match to the bit (same md5 kernel)
      val union = (batch1 ++ batch2).toDF("key", "v")
      val batchDenom = graft.operators.SketchOps.hllDenom(
          graft.operators.SketchOps.hllBucketMax(union, Seq("key"), col("v")),
          Seq("key"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == batchDenom,
        s"streaming state diverged from batch sketch: $got vs $batchDenom")
      // sanity on the estimate itself: svc_a:user saw 700 distinct
      val est = spark.sql("SELECT _1, _4 FROM hll_out").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(math.abs(est("svc_a:user") - 700.0) / 700.0 < 0.26, est)
    } finally q.stop()
  }

  test("streaming content-type monitor converges to the batch census over the union") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, String)]
    val out = StreamingPipelines.streamingContentType(
      ms.toDF().toDF("source", "text"), "source", "text")
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("ctype_out").start()
    try {
      val code = "def f(x) { return x * 3; } if (x < y) { z[i] = 3; }"
      val table = "row 12 | 34 | 56"
      val prose = "the quick brown fox jumps over the lazy dog"
      val b1 = Seq(("a", code), ("a", prose), ("b", table))
      val b2 = Seq(("a", code), ("b", prose), ("b", prose))
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      val got = spark.sql("SELECT source, content_type, n_docs FROM ctype_out")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      // batch twin over the union — the SAME shared detector
      // expression, so any rule change moves both sides at once
      val batch = (b1 ++ b2).toDF("source", "text")
        .select(col("source"),
          graft.operators.TextOps.contentType(col("text")).as("content_type"))
        .groupBy("source", "content_type").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got == batch, s"streaming $got vs batch $batch")
      assert(got(("a", "code")) == 2L && got(("b", "table")) == 1L &&
        got(("b", "prose")) == 2L)
    } finally q.stop()
  }

  test("streaming novelty monitor converges to the batch first-carrier census in arrival order") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val rows = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    // arrival respects doc_id order (the premise the batch report
    // encodes as min(doc_id)): two triggers, ids split at the median
    val mid = rows(rows.length / 2)._1
    val (b1, b2) = rows.partition(_._1 < mid)
    val ms = MemoryStream[(Long, String, String)]
    val out = StreamingPipelines.streamingNovelty(spark,
      ms.toDF().toDF("doc_id", "source", "text"), "doc_id", "source", "text")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("novelty_out").start()
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
      // per-doc novelty from the streamed per-segment verdicts, then
      // the same census as the batch query
      val census = spark.sql(
          """SELECT _2 AS source, n_novel * 10 DIV n_segs AS bucket,
            | COUNT(*) AS n_docs, CAST(SUM(n_segs) AS BIGINT) AS segs,
            | CAST(SUM(n_novel) AS BIGINT) AS novel_segs
            |FROM (SELECT _1, _2, COUNT(*) AS n_segs,
            |  CAST(SUM(CASE WHEN _4 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
            | FROM novelty_out GROUP BY _1, _2)
            |GROUP BY source, bucket""".stripMargin)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val batch = SparkEntry.queries("q_novelty")(spark, sfDir)
        .collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("bucket")) ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("segs"),
            r.getAs[Long]("novel_segs")))).toMap
      assert(census == batch,
        s"streaming census diverged: ${census.size} cells vs ${batch.size}")
      // and the monitor has real cross-trigger teeth at this SF: at
      // least one segment first carried in trigger 1 re-arrives in
      // trigger 2 as NOT novel
      val t2NotNovel = spark.sql(
        s"SELECT COUNT(*) FROM novelty_out WHERE _1 >= $mid AND NOT _4")
        .collect().head.getLong(0)
      assert(t2NotNovel > 0, "no cross-trigger re-serving exercised")
    } finally q.stop()
  }

  test("streaming vocab growth converges to the batch vocab and hapax scalars") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val (b1, b2) = rows.partition(_._1 % 2 == 0)
    val ms = MemoryStream[String]
    val out = StreamingPipelines.streamingVocabGrowth(spark,
      ms.toDF().toDF("text"), "text")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("vocab_out").start()
    try {
      ms.addData(b1.map(_._2).toSeq); q.processAllAvailable()
      ms.addData(b2.map(_._2).toSeq); q.processAllAvailable()
      val ev = spark.sql("SELECT _1, _2 FROM vocab_out").collect()
        .map(r => (r.getString(0), r.getString(1)))
      val newTerms = ev.count(_._2 == "new")
      val repeats = ev.count(_._2 == "repeat")
      // batch twin over the union: q_vocab_stats' scalars
      val vs = SparkEntry.queries("q_vocab_stats")(
        spark, "/root/testdata/sf0.001").collect().head
      assert(newTerms.toLong == vs.getAs[Long]("vocab_size"),
        s"running vocab $newTerms != batch ${vs.getAs[Long]("vocab_size")}")
      assert((newTerms - repeats).toLong == vs.getAs[Long]("hapax_terms"),
        s"running hapax ${newTerms - repeats}")
      // transition discipline: at most one `new` and one `repeat`
      // per term, and a `repeat` always has its `new`
      val byTerm = ev.groupBy(_._1)
      assert(byTerm.values.forall(es =>
        es.count(_._2 == "new") == 1 && es.count(_._2 == "repeat") <= 1))
      // cross-trigger transition teeth: a planted term goes hapax in
      // one trigger and leaves hapax in the NEXT
      ms.addData(Seq("zzqplanted")); q.processAllAvailable()
      ms.addData(Seq("zzqplanted")); q.processAllAvailable()
      val planted = spark.sql(
          "SELECT _2 FROM vocab_out WHERE _1 = 'zzqplanted'")
        .collect().map(_.getString(0)).sorted.toSeq
      assert(planted == Seq("new", "repeat"), planted)
    } finally q.stop()
  }

  test("streaming survival monitor converges to the batch curve over the trigger union") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val sfDir = "/root/testdata/sf0.001"
    val rows = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect()
    // arbitrary trigger slicing — counts/sums are associative, so
    // the final state must not depend on it
    val (b1, b2) = rows.partition(_._1 % 3 == 0)
    val ms = MemoryStream[(Long, String, String)]
    val out = StreamingPipelines.streamingQualitySurvival(spark,
      ms.toDF().toDF("doc_id", "source", "text"), "source", "text")
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("survival_out").start()
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
      // update mode re-emits a cell on every change and the running
      // counts only GROW — latest per (source, bucket) = max
      val streamed = spark.sql(
          """SELECT source, bucket, MAX(n_docs) AS n_docs,
            | MAX(toks) AS toks
            |FROM survival_out GROUP BY source, bucket""".stripMargin)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3)))).toMap
      // batch twin over the union: the SAME shared kernel on the
      // static frame (one scorer — the monitor cannot drift)
      val batch = graft.operators.TextOps.survivalBuckets(
          Tables(spark, sfDir, "documents")
            .select(col("doc_id"), col("source"), col("text")), "text")
        .groupBy(col("source"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("toks"))
        .collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("bucket")) ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("toks")))).toMap
      assert(streamed == batch,
        s"monitor diverged: ${streamed.size} cells vs ${batch.size}")
      assert(streamed.nonEmpty)
      // and the streamed cells REBUILD the §2 curve exactly: fold
      // sources, threshold-join over the 11 buckets, compare every
      // row of q_quality_survival — ties the monitor to the surface
      // a deployment actually reads
      val perB = streamed.toSeq.groupBy(_._1._2).map { case (b, cs) =>
        b -> ((cs.map(_._2._1).sum, cs.map(_._2._2).sum))
      }
      val totD = perB.values.map(_._1).sum
      val totT = perB.values.map(_._2).sum
      val expect = SparkEntry.queries("q_quality_survival")(spark, sfDir)
        .collect().map(r => r.getAs[Long]("cutoff") ->
          ((r.getAs[Long]("n_docs_kept"), r.getAs[Long]("toks_kept"),
            r.getAs[Double]("frac_docs"), r.getAs[Double]("frac_toks")))).toMap
      // (the batch curve's threshold join is inner: a cutoff below
      // every populated bucket has no row — compare what exists)
      assert(expect.nonEmpty)
      (0L to 10L).foreach { t =>
        val kept = perB.filter(_._1 <= t).values
        val (kd, kt) = (kept.map(_._1).sum, kept.map(_._2).sum)
        expect.get(t * 20).foreach { e =>
          assert((kd, kt) == ((e._1, e._2)), s"cutoff ${t * 20}")
          assert(kd.toDouble / totD.toDouble == e._3 &&
            kt.toDouble / totT.toDouble == e._4, s"fracs at ${t * 20}")
        }
      }
    } finally q.stop()
  }

  test("streaming split-leakage guard flags exactly the batch census's segment pairs") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the q_split_leakage synthesis: 80/10/10 by the seeded portable
    // hash — the SAME split assignment, so the guard and the census
    // see the same corpus
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
      .withColumn("slot",
        graft.operators.ScaleOps.shardIdPortable(col("doc_id"), 10, "split1"))
      .withColumn("split", when(col("slot") < 8, "train")
        .when(col("slot") === 8, "val").otherwise("test"))
      .select(col("doc_id"), col("split"), col("text"))
    val rows = d.as[(Long, String, String)].collect()
    // adversarial arrival order: interleave by id parity so many
    // segments meet their second split across trigger boundaries
    val (b1, b2) = rows.partition(_._1 % 2 == 0)
    val ms = MemoryStream[(Long, String, String)]
    val out = StreamingPipelines.streamingSplitLeakage(spark,
      ms.toDF().toDF("doc_id", "split", "text"), "doc_id", "split", "text")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("leak_out").start()
    try {
      ms.addData(b1.toSeq); q.processAllAvailable()
      ms.addData(b2.toSeq); q.processAllAvailable()
      val got = spark.sql("SELECT _2, _3, _4 FROM leak_out").collect()
        .map { r =>
          val (a, b) = (r.getString(0), r.getString(1))
          (r.getString(2), if (a < b) (a, b) else (b, a))
        }.toSet
      // batch twin: distinct (segment hash, unordered split pair)
      // over the SAME segmentation kernel
      val hs = d.withColumn("__ws", graft.operators.TextOps.tokens(col("text")))
        .filter(size(col("__ws")) >= 1)
        .select(col("split"),
          explode(graft.operators.TextOps.segments8(col("__ws"))).as("seg"))
        .select(md5(col("seg")).as("h"), col("split")).distinct()
      val expected = hs.as("a").join(hs.as("b"),
          col("a.h") === col("b.h") && col("a.split") < col("b.split"))
        .select(col("a.h"), col("a.split"), col("b.split")).collect()
        .map(r => (r.getString(0), (r.getString(1), r.getString(2)))).toSet
      assert(expected.nonEmpty, "synthesis produced no cross-split segments")
      assert(got == expected,
        s"guard flagged ${got.size} (h, pair)s vs batch ${expected.size}")
      // per-doc quarantine teeth: a LATER doc from an already-owning
      // split still flags against the foreign owner — the guard is
      // per-arrival, not first-of-split-only
      val seg = "zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8"
      ms.addData(Seq((900001L, "train", seg))); q.processAllAvailable()
      ms.addData(Seq((900002L, "val", seg))); q.processAllAvailable()
      ms.addData(Seq((900003L, "val", seg))); q.processAllAvailable()
      val planted = spark.sql(
          "SELECT _1, _2, _3 FROM leak_out WHERE _1 >= 900001")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(planted == Set(
        (900002L, "val", "train"),
        (900003L, "val", "train")), planted)
    } finally q.stop()
  }

  test("streaming corpus churn converges to the batch diff on arrival-observable classes") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
    // the q_corpus_churn synthesis: yesterday drops id%10==9, today
    // drops id%10==0 and edits id%7==3 — oracle-identical views
    val yesterday = d.filter(pmod(col("doc_id"), lit(10)) =!= 9)
      .select(col("doc_id"), md5(col("text")).as("h"),
        graft.operators.TextOps.tokenCount(col("text")).cast("long").as("tk"))
      .as[(Long, String, Long)]
    val todayDf = d.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      .withColumn("t", when(pmod(col("doc_id"), lit(7)) === 3,
        concat(col("text"), lit(" churned edit"))).otherwise(col("text")))
      .select(col("doc_id"), col("source"), md5(col("t")).as("h"),
        graft.operators.TextOps.tokenCount(col("t")).cast("long").as("tk"))
    val todayRows = todayDf.as[(Long, String, String, Long)].collect().toSeq
    val (b1, b2) = todayRows.partition(_._1 % 2 == 0)
    val ms = MemoryStream[(Long, String, String, Long)]
    val out = StreamingPipelines.streamingCorpusChurn(spark, ms.toDS(), yesterday)
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("churn_out").start()
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
      val got = spark.sql("SELECT _1, _2, _3, _4 FROM churn_out")
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3))))
        .toMap
      // batch twin: the q_corpus_churn full-outer diff restricted to
      // the today side (= everything but `removed`, the class an
      // arrival stream cannot observe)
      val expected = todayDf
        .join(yesterday.toDF("doc_id", "ha", "tka"), Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("source"),
          when(col("ha").isNull, "added")
            .when(col("ha") =!= col("h"), "modified")
            .otherwise("unchanged").as("change"),
          when(col("ha").isNull, col("tk"))
            .when(col("ha") =!= col("h"), col("tk") - col("tka"))
            .otherwise(lit(0L)).as("delta"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getLong(3))))
        .toMap
      assert(got.size == todayRows.size && got == expected,
        s"streaming diverged from the batch diff (got ${got.size} of ${expected.size})")
      // all three observable classes actually exercised at this SF
      val classes = got.values.map(_._2).toSet
      assert(classes == Set("added", "modified", "unchanged"), classes)
      // fixed-baseline semantics: a re-crawl later in the day
      // re-verdicts against YESTERDAY, not its own earlier arrival —
      // the un-edited refetch of an edited doc flips to `unchanged`
      val edited = todayRows.find(t =>
        t._1 % 7 == 3 && t._1 % 10 != 9 && t._1 % 10 != 0).get
      val unedited = d.filter(col("doc_id") === edited._1)
        .select(col("doc_id"), col("source"), md5(col("text")).as("h"),
          graft.operators.TextOps.tokenCount(col("text")).cast("long").as("tk"))
        .as[(Long, String, String, Long)].collect().head
      ms.addData(Seq(unedited)); q.processAllAvailable()
      val verdicts = spark.sql(
          s"SELECT _3, _4 FROM churn_out WHERE _1 = ${edited._1}")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      // yesterday holds the UN-edited text, so the first verdict's
      // delta is (edited − unedited) and the refetch must read
      // (unchanged, 0) — not (unchanged vs the edited arrival)
      assert(verdicts.contains(("modified", edited._4 - unedited._4)),
        s"first verdict lost: $verdicts")
      assert(verdicts.contains(("unchanged", 0L)),
        s"refetch did not re-verdict against the fixed baseline: $verdicts")
      assert(verdicts.size == 2, s"expected two emissions, got $verdicts")
    } finally q.stop()
  }

  test("streaming ExactSubstr: map-side anchor HOF is bit-identical to the window selection on the sf corpus") {
    import org.apache.spark.sql.functions._
    val d = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val toks = graft.DataPipelineQueries.spanTokens(d)
    val win = graft.DataPipelineQueries.winnowAnchorSel(toks)
      .select("doc_id", "h_sel", "pos_sel")
    val hof = toks.select(col("doc_id"), explode(
        graft.DataPipelineQueries.winnowAnchorsExpr(col("__ws"))).as("a"))
      .select(col("doc_id"), col("a.h_sel"), col("a.pos_sel"))
    assert(win.count() > 0)
    assert(win.exceptAll(hof).isEmpty && hof.exceptAll(win).isEmpty,
      "HOF anchor selection drifted from the window formulation")
  }

  test("streaming ExactSubstr anchor store: per-trigger pairs converge to the incremental operator; df cap saturates the fingerprint") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sql = spark.sqlContext
    // a 30-token passage planted across both triggers; remainders
    // fully distinct so ONLY the passage makes spans
    val passage = (0 until 30).map(i => s"dupw$i").mkString(" ")
    def filler(tag: String, n: Int) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val t1 = Seq(
      (1L, s"$passage ${filler("xa", 40)}"),
      (2L, s"${filler("xb", 40)} $passage"),
      (3L, filler("xc", 60)))
    val t2 = Seq(
      (10L, s"${filler("xd", 20)} $passage ${filler("xe", 20)}"),
      (11L, filler("xf", 60)),
      // doc 12 shares ONLY the passage with everyone (distinct
      // fillers): at dfCap=3 below, the passage saturating must
      // leave NOTHING to pair — a shared filler would legitimately
      // pair (10,12) under the cap and muddy the pin
      (12L, s"${filler("xg", 20)} $passage ${filler("xh", 20)}"))
    val ms = MemoryStream[(Long, String)]
    val out = StreamingPipelines.streamingExactSubstrAnchors(
      spark, ms.toDS(), dfCap = 50)
    val q = out.toDF("doc_a", "doc_b", "pa", "pb").writeStream
      .outputMode("append").format("memory").queryName("xs_anchors").start()
    try {
      ms.addData(t1)
      q.processAllAvailable()
      val pairs1 = spark.table("xs_anchors").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      ms.addData(t2)
      q.processAllAvailable()
      val all = spark.table("xs_anchors").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val pairs2 = all.filterNot(pairs1.toSet)

      def spansOf(ps: Seq[(Long, Long, Long, Long)],
                  corpus: Seq[(Long, String)]): Set[(Long, Long, Long, Long, Long)] =
        if (ps.isEmpty) Set.empty
        else graft.DataPipelineQueries.extendCandidateAnchorPairs(
            ps.toDF("doc_a", "doc_b", "pa", "pb"),
            corpus.toDF("doc_id", "text"), minLen = 15)
          .select("doc_a", "doc_b", "start_a", "start_b", "span_len")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSet
      def rowsOf(df: org.apache.spark.sql.DataFrame) =
        df.select("doc_a", "doc_b", "start_a", "start_b", "span_len")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSet

      // trigger 1 == the batch operator over trigger 1's corpus
      val batch1 = rowsOf(graft.DataPipelineQueries.exactDupSpansFrom(
        t1.toDF("doc_id", "text"), 15, 50))
      assert(batch1.nonEmpty, "trigger-1 corpus must contain a dup pair")
      assert(spansOf(pairs1, t1) == batch1)
      // trigger 2 == the INCREMENTAL operator (store=T1, batch=T2):
      // the store text is only consulted for the bounded candidates
      val incr = rowsOf(graft.DataPipelineQueries.exactDupSpansIncrementalFrom(
        t1.toDF("doc_id", "text"), t2.toDF("doc_id", "text"), 15, 50))
      assert(incr.nonEmpty)
      assert(spansOf(pairs2, t1 ++ t2) == incr)
      // the new spans touch a batch doc — never a store-store pair
      assert(spansOf(pairs2, t1 ++ t2).forall { case (a, b, _, _, _) =>
        a >= 10L || b >= 10L })
    } finally q.stop()

    // df cap: the passage lives in 4 docs; at dfCap=3 the union count
    // saturates the fingerprint on trigger 2 — the streaming store and
    // the incremental operator agree (both emit NOTHING new)
    val ms2 = MemoryStream[(Long, String)]
    val out2 = StreamingPipelines.streamingExactSubstrAnchors(
      spark, ms2.toDS(), dfCap = 3)
    val q2 = out2.toDF("doc_a", "doc_b", "pa", "pb").writeStream
      .outputMode("append").format("memory").queryName("xs_cap").start()
    try {
      ms2.addData(t1); q2.processAllAvailable()
      val n1 = spark.table("xs_cap").count()
      assert(n1 > 0, "under the cap at trigger 1 (2 docs) — pairs emit")
      ms2.addData(t2); q2.processAllAvailable()
      assert(spark.table("xs_cap").count() == n1,
        "4 docs > dfCap=3: trigger 2 must emit nothing for the hash")
      val incrCapped = graft.DataPipelineQueries.exactDupSpansIncrementalFrom(
        t1.toDF("doc_id", "text"), t2.toDF("doc_id", "text"), 15, 3)
      assert(incrCapped.isEmpty, "incremental twin agrees: cap bites")
    } finally q2.stop()
  }

  test("streaming ExactSubstr TTL: an idle fingerprint evicts; later copies pair only among themselves") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sql = spark.sqlContext
    val passage = (0 until 30).map(i => s"ttlw$i").mkString(" ")
    def doc(id: Long, tag: String) =
      (id, s"$passage ${(0 until 20).map(i => s"$tag$i").mkString(" ")}")
    val ms = MemoryStream[(Long, String)]
    // ProcessingTimeTimeout: NEVER processAllAvailable (the query
    // schedules continuous empty batches to fire timeouts and the
    // call never quiesces) — poll the sink with a deadline
    val out = StreamingPipelines.streamingExactSubstrAnchors(
      spark, ms.toDS(), dfCap = 50, ttlMs = Some(200L))
    val q = out.toDF("doc_a", "doc_b", "pa", "pb").writeStream
      .outputMode("append").format("memory").queryName("xs_ttl").start()
    // the passage yields SEVERAL anchor fingerprints → several rows
    // per doc pair: await a predicate, not a row count
    def await(what: String)(p: => Boolean): Unit = {
      val deadline = System.currentTimeMillis() + 60000
      while (!p && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(p, s"sink never showed $what")
    }
    try {
      ms.addData(Seq(doc(1L, "fa")))
      ms.addData(Seq(doc(2L, "fb"))) // within TTL: pairs with doc 1
      await("the (1,2) pair")(
        spark.table("xs_ttl").filter(col("doc_b") === 2L).count() > 0)
      Thread.sleep(800) // idle past the TTL — the store forgets
      ms.addData(Seq(doc(3L, "fc"))) // post-eviction: pairs with NOBODY
      ms.addData(Seq(doc(4L, "fd"))) // pairs with doc 3 only
      await("a post-eviction pair")(
        spark.table("xs_ttl").filter(col("doc_b") === 4L).count() > 0)
      val pairs = spark.table("xs_ttl").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      // (3,4) present proves the post-eviction triggers processed;
      // no pair bridges the eviction gap
      assert(pairs.contains((3L, 4L)), pairs)
      assert(pairs.forall { case (a, b) =>
        (a <= 2 && b <= 2) || (a >= 3 && b >= 3) },
        s"a pair bridged the TTL eviction: $pairs")
    } finally q.stop()
  }
}
