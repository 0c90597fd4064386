package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Pipeline._

/** Crash-durability contract of [[PersistentQueueExporter]] (reference:
  * exporter/exporterhelper/internal/persistent_queue.go +
  * persistent_storage.go): a batch accepted while the downstream is
  * unreachable survives a collector "crash" (a fresh exporter instance
  * over the same queue dir) and is redelivered exactly once on
  * recovery — the checkpoint-survival discipline extended to batch
  * mode.
  */
class PersistentQueueSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  /** endpoint stand-in: unreachable until `up`, records per-batchId
    * delivery counts and last-delivered contents (keyed by batchId —
    * the idempotent-replay contract a real sink implements) */
  private final class GatedExporter extends Exporter {
    @volatile var up = false
    val deliveries = new java.util.concurrent.ConcurrentHashMap[Long, Integer]()
    val contents = new java.util.concurrent.ConcurrentHashMap[Long, Array[Long]]()
    def export(df: DataFrame): Unit = exportBatch(df, -1L)
    override def exportBatch(df: DataFrame, batchId: Long): Unit = {
      if (!up) throw new RuntimeException("endpoint down")
      deliveries.merge(batchId, 1, (a, b) => a + b)
      contents.put(batchId, df.select("id").collect().map(_.getLong(0)).sorted)
    }
  }

  private def batch(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(col("id"), (col("id") * 2).as("v"))

  test("num_consumers: recovery drains independent batches in parallel, each delivered exactly once") {
    val dir = Files.createTempDirectory("pq_consumers").toString
    val active = new java.util.concurrent.atomic.AtomicInteger
    val peak = new java.util.concurrent.atomic.AtomicInteger
    final class SlowGate extends Exporter {
      @volatile var up = false
      val deliveries = new java.util.concurrent.ConcurrentHashMap[Long, Integer]()
      def export(df: DataFrame): Unit = exportBatch(df, -1L)
      override def exportBatch(df: DataFrame, batchId: Long): Unit = {
        if (!up) throw new RuntimeException("endpoint down")
        val now = active.incrementAndGet()
        peak.getAndAccumulate(now, math.max)
        try { Thread.sleep(150); df.count(); deliveries.merge(batchId, 1, (a, b) => a + b); () }
        finally { active.decrementAndGet(); () }
      }
    }
    val gate = new SlowGate
    val q1 = PersistentQueueExporter(gate, dir, retriesPerRun = 0,
      backoffMs = 1, numConsumers = 4)
    (0 until 6).foreach(i => q1.export(batch(i * 3, i * 3 + 3)))
    assert(gate.deliveries.isEmpty) // endpoint down: all spooled

    gate.up = true
    val q2 = PersistentQueueExporter(gate, dir, retriesPerRun = 0,
      backoffMs = 1, numConsumers = 4)
    val stats = q2.recover(spark)
    assert(stats == RecoveryStats(redelivered = 6, stillPending = 0,
      deadLettered = 0))
    // exactly-once per batch, and genuinely concurrent consumers
    assert(gate.deliveries.size() == 6)
    gate.deliveries.forEach((_, n) => assert(n == 1))
    assert(peak.get > 1, s"drain never overlapped (peak=${peak.get})")
  }

  test("batches accepted while the endpoint is down survive a crash and redeliver exactly once") {
    val dir = Files.createTempDirectory("pq_crash").toString
    val gate = new GatedExporter
    val obs = new QueueObs
    val q1 = PersistentQueueExporter(gate, dir, maxAttemptsPerBatch = 10,
      retriesPerRun = 1, backoffMs = 1, obs = Some(obs))

    // accept 3 batches against the dead endpoint: no throw (accept is
    // the durable spool, not the delivery), all three stay pending
    q1.export(batch(0, 5))
    q1.export(batch(5, 9))
    q1.export(batch(9, 10))
    assert(gate.deliveries.isEmpty)
    val pend = new java.io.File(s"$dir/pending")
    assert(pend.listFiles().count(_.isDirectory) == 3)

    // "crash": a brand-new exporter instance over the same queue dir
    // (no shared in-memory state), endpoint back up
    gate.up = true
    val q2 = PersistentQueueExporter(gate, dir, maxAttemptsPerBatch = 10,
      retriesPerRun = 1, backoffMs = 1, obs = Some(obs))
    val stats = q2.recover(spark)
    assert(stats == RecoveryStats(redelivered = 3, stillPending = 0, deadLettered = 0))
    assert(pend.listFiles().count(_.isDirectory) == 0)
    // every batch delivered exactly once, contents intact
    assert(gate.deliveries.size == 3)
    gate.deliveries.forEach((_, n) => assert(n == 1))
    assert(gate.contents.values().stream().mapToInt(_.length).sum() == 10)

    // a second recovery pass finds nothing — no double delivery
    assert(q2.recover(spark) == RecoveryStats(0, 0, 0))
    assert(gate.deliveries.size == 3)
  }

  test("healthy delivery dequeues immediately and queue ids never reuse across restarts") {
    val dir = Files.createTempDirectory("pq_ok").toString
    val gate = new GatedExporter
    gate.up = true
    val q1 = PersistentQueueExporter(gate, dir, backoffMs = 1)
    q1.export(batch(0, 4))
    assert(!new java.io.File(s"$dir/pending").exists() ||
      new java.io.File(s"$dir/pending").listFiles().count(_.isDirectory) == 0)
    // restart: the persistent seq continues, so the next batch cannot
    // overwrite the delivered one's downstream output
    val q2 = PersistentQueueExporter(gate, dir, backoffMs = 1)
    q2.export(batch(4, 6))
    assert(gate.deliveries.size == 2)
    assert(gate.deliveries.keySet().stream().distinct().count() == 2)
  }

  test("partial success re-enqueues ONLY the rejected slice; everything lands exactly once across a restart") {
    // sink with OTLP partial-success semantics: while `rejecting`, ids
    // >= 6 are refused (deterministic subset) and the rest durably
    // accepted; acceptance is keyed per id so a duplicate delivery
    // would show as a count > 1
    val dir = Files.createTempDirectory("pq_partial").toString
    val acceptCounts = new java.util.concurrent.ConcurrentHashMap[Long, Integer]()
    @volatile var rejecting = true
    val sink = new Exporter {
      def export(df: DataFrame): Unit = exportBatch(df, -1L)
      override def exportBatch(df: DataFrame, batchId: Long): Unit = {
        val rows = df.select("id").collect().map(_.getLong(0))
        val (rej, acc) = rows.partition(id => rejecting && id >= 6)
        acc.foreach(id => acceptCounts.merge(id, 1, (a, b) => a + b))
        if (rej.nonEmpty) throw new PartialSuccessException(
          col("id") >= 6, s"${rej.length} records rejected")
      }
    }
    // retriesPerRun = 0: the rejected slice must survive AS THE SPOOL
    // into the next instance, not drain in-run
    val pObs = new QueueObs
    val q1 = PersistentQueueExporter(sink, dir, maxAttemptsPerBatch = 10,
      retriesPerRun = 0, backoffMs = 1, obs = Some(pObs))
    q1.export(batch(0, 10))
    // accepted prefix landed once; spool holds ONLY the rejected
    // slice; the partial success is counted, not silent
    assert((0L until 6L).forall(acceptCounts.get(_) == 1))
    assert(pObs.partialSuccesses.get() == 1)
    val pend = new java.io.File(s"$dir/pending")
    assert(pend.listFiles().count(_.isDirectory) == 1)
    val spooled = spark.read.parquet(s"$dir/pending/batch_id=0")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(spooled.sameElements(6L until 10L),
      s"spool should hold only the rejected slice: ${spooled.mkString(",")}")

    // "crash" → new instance; the endpoint stops rejecting
    rejecting = false
    val q2 = PersistentQueueExporter(sink, dir, maxAttemptsPerBatch = 10,
      retriesPerRun = 0, backoffMs = 1)
    assert(q2.recover(spark) == RecoveryStats(1, 0, 0))
    // exactly once: every row accepted exactly once, nothing pending
    assert(acceptCounts.size() == 10)
    acceptCounts.forEach((id, n) => assert(n == 1, s"row $id delivered $n times"))
    assert(pend.listFiles().count(_.isDirectory) == 0)

    // and with an in-run retry budget the remainder drains without a
    // restart: one export call, two sink deliveries, zero duplicates
    rejecting = true
    val acceptCounts2 = new java.util.concurrent.ConcurrentHashMap[Long, Integer]()
    val sink2 = new Exporter {
      def export(df: DataFrame): Unit = exportBatch(df, -1L)
      override def exportBatch(df: DataFrame, batchId: Long): Unit = {
        val rows = df.select("id").collect().map(_.getLong(0))
        val (rej, acc) = rows.partition(id => rejecting && id >= 16)
        acc.foreach(id => acceptCounts2.merge(id, 1, (a, b) => a + b))
        if (rej.nonEmpty) { rejecting = false; throw new PartialSuccessException(
          col("id") >= 16, s"${rej.length} rejected") }
      }
    }
    val dir2 = Files.createTempDirectory("pq_partial2").toString
    val q3 = PersistentQueueExporter(sink2, dir2, maxAttemptsPerBatch = 10,
      retriesPerRun = 1, backoffMs = 1)
    q3.export(batch(10, 20))
    assert(acceptCounts2.size() == 10)
    acceptCounts2.forEach((id, n) => assert(n == 1, s"row $id delivered $n times"))
    assert(!new java.io.File(s"$dir2/pending").exists() ||
      new java.io.File(s"$dir2/pending").listFiles().count(_.isDirectory) == 0)
  }

  test("two live instances over one queue dir never hand out the same batch id") {
    // a service rebuilt from config can race a still-live old
    // instance on the same queueDir; id allocation must be arbitrated
    // by the filesystem (atomic claim files), not each instance's JVM
    // lock — a duplicate id would overwrite another batch's pending
    // spool and its downstream batch_id-keyed output
    val dir = Files.createTempDirectory("pq_twin").toString
    val gate = new GatedExporter
    gate.up = true
    val qa = PersistentQueueExporter(gate, dir, backoffMs = 1)
    val qb = PersistentQueueExporter(gate, dir, backoffMs = 1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 4).map { t =>
      new Thread(() => {
        try {
          val q = if (t % 2 == 0) qa else qb
          for (i <- 0 until 4) q.export(batch(t * 10 + i, t * 10 + i + 2))
        } catch { case e: Throwable => errs.add(e) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, errs)
    // 16 exports → 16 DISTINCT ids, every one delivered
    assert(gate.deliveries.size == 16, s"ids collided: ${gate.deliveries.keySet()}")
    gate.deliveries.forEach((_, n) => assert(n == 1))
  }

  test("poison batch exhausts its persistent attempt budget across restarts and dead-letters") {
    val dir = Files.createTempDirectory("pq_poison").toString
    val gate = new GatedExporter // stays down: every attempt fails
    val obs = new QueueObs
    // budget 3 total attempts, one per run: enqueue burns #1, two
    // recover passes burn #2 and #3 (the counter PERSISTS across
    // instances), the third recover trips the budget → DLQ
    val q = PersistentQueueExporter(gate, dir, maxAttemptsPerBatch = 3,
      retriesPerRun = 0, backoffMs = 1, obs = Some(obs))
    q.export(batch(0, 7))
    assert(q.recover(spark) == RecoveryStats(0, 1, 0)) // attempt 2, still queued
    val q2 = PersistentQueueExporter(gate, dir, maxAttemptsPerBatch = 3,
      retriesPerRun = 0, backoffMs = 1, obs = Some(obs))
    assert(q2.recover(spark) == RecoveryStats(0, 1, 0)) // attempt 3, still queued
    assert(q2.recover(spark) == RecoveryStats(0, 0, 1)) // budget gone → DLQ
    val dlq = new java.io.File(s"$dir/dlq")
    assert(dlq.listFiles().count(_.isDirectory) == 1)
    assert(new java.io.File(s"$dir/pending").listFiles().count(_.isDirectory) == 0)
    assert(obs.deadLetteredBatches.get == 1 && obs.deadLetteredRows.get == 7)
    // the dead-lettered payload is intact for replay tooling
    assert(spark.read.parquet(dlq.listFiles().filter(_.isDirectory).head.toString)
      .count() == 7)
  }

  test("a permanent error skips the retry budget and dead-letters at once") {
    val dir = Files.createTempDirectory("pq_perm").toString
    val poison = new Exporter {
      def export(df: DataFrame): Unit =
        throw new PermanentExportException("schema rejected")
    }
    val q = PersistentQueueExporter(poison, dir, maxAttemptsPerBatch = 10,
      retriesPerRun = 5, backoffMs = 1)
    q.export(batch(0, 3))
    assert(new java.io.File(s"$dir/dlq").listFiles().count(_.isDirectory) == 1)
  }

  test("partial spool (crash mid-enqueue, no _SUCCESS) is discarded, not delivered") {
    val dir = Files.createTempDirectory("pq_partial").toString
    val gate = new GatedExporter
    gate.up = true
    // fake a torn write: a pending dir with data but no commit marker
    val torn = new java.io.File(s"$dir/pending/batch_id=99")
    torn.mkdirs()
    Files.write(torn.toPath.resolve("part-00000.parquet"), Array[Byte](1, 2, 3))
    val q = PersistentQueueExporter(gate, dir, backoffMs = 1)
    assert(q.recover(spark) == RecoveryStats(0, 0, 0))
    assert(!torn.exists())
    assert(gate.deliveries.isEmpty)
  }

  test("crash after delivery but before dequeue replays idempotently (keyed overwrite)") {
    val dir = Files.createTempDirectory("pq_replay").toString
    val out = Files.createTempDirectory("pq_replay_out").toString
    val q = PersistentQueueExporter(ParquetExporter(out), dir, backoffMs = 1)
    q.exportBatch(batch(0, 6), 7L)
    // resurrect the spool: as if the crash hit between delegate
    // success and dequeue — recovery MUST redeliver (it cannot know),
    // and the batchId-keyed sink absorbs the replay as an overwrite
    batch(0, 6).write.parquet(s"$dir/pending/batch_id=7")
    assert(q.recover(spark).redelivered == 1)
    val sink = spark.read.parquet(s"$out/batch_id=7")
    assert(sink.count() == 6) // overwritten, not doubled
  }

  test("service startup recovers every persistent queue in the sender chain") {
    val qdir = Files.createTempDirectory("pq_svc").toString
    val out = Files.createTempDirectory("pq_svc_out").toString
    // a crashed collector left one accepted-but-undelivered batch
    // (enqueue against a dead endpoint, then the process dies)
    val dead = new GatedExporter
    PersistentQueueExporter(dead, qdir, retriesPerRun = 0, backoffMs = 1)
      .export(batch(0, 4))
    // restart: a config-built service whose sender chain nests the
    // queue around a timeout-wrapped parquet sink
    val svc = Service(Map("logs/out" -> graft.pipeline.Pipeline.PipelineDef(
      receiver = ParquetReceiver("/root/testdata/sf0.001/events.parquet"),
      exporters = Seq(PersistentQueueExporter(
        TimeoutExporter(ParquetExporter(out), timeoutMs = 60000), qdir,
        backoffMs = 1)))))
    val stats = svc.recover(spark)
    assert(stats == Map("logs/out" -> RecoveryStats(1, 0, 0)), stats)
    assert(spark.read.parquet(s"$out/batch_id=0").count() == 4)
    assert(svc.recover(spark) == Map("logs/out" -> RecoveryStats(0, 0, 0)))
  }

  test("service status reports queue depths; drain flushes on graceful shutdown") {
    val qdir = Files.createTempDirectory("pq_health").toString
    val gate = new GatedExporter // down: batches pile up
    val q = PersistentQueueExporter(gate, qdir, retriesPerRun = 0, backoffMs = 1)
    val svc = Service(Map("logs/out" -> graft.pipeline.Pipeline.PipelineDef(
      receiver = ParquetReceiver("/root/testdata/sf0.001/events.parquet"),
      exporters = Seq(q))))
    q.export(batch(0, 4))
    q.export(batch(4, 7))
    // the health surface sees two pending batches with real bytes
    val s1 = svc.status(spark)
    assert(s1.map(s => (s.pipeline, s.pending, s.deadLettered)) ==
      Seq(("logs/out", 2L, 0L)), s1)
    assert(s1.head.pendingBytes > 0)
    // drain against a dead endpoint times out, queues intact
    assert(!svc.drain(spark, budgetMs = 300))
    assert(svc.status(spark).head.pending == 2)
    // endpoint back → drain flushes everything within budget
    gate.up = true
    assert(svc.drain(spark, budgetMs = 30000))
    assert(svc.status(spark).head.pending == 0)
    assert(gate.deliveries.size == 2)
    // zpages: the debug report names the pipeline, unwraps the sender
    // chain, and carries live queue + feature-gate state
    val z = svc.zpages(spark)
    assert(z.contains("pipeline logs/out"), z)
    assert(z.contains(s"persistent_queue($qdir)"), z)
    assert(z.contains("queue logs/out: pending=0"), z)
    assert(z.contains("graft.confmap.httpProvider [Beta] enabled=true"), z)
  }

  test("self-telemetry: healthFrame publishes queue/obs counters as metric points the §2 operators consume") {
    val qdir = Files.createTempDirectory("pq_self").toString
    val gate = new GatedExporter // down: batches pile up as pending
    val obs = new QueueObs
    val q = PersistentQueueExporter(gate, qdir, retriesPerRun = 0,
      backoffMs = 1, obs = Some(obs))
    val svc = Service(Map("logs/out" -> graft.pipeline.Pipeline.PipelineDef(
      receiver = ParquetReceiver("/root/testdata/sf0.001/events.parquet"),
      exporters = Seq(q))))
    q.export(batch(0, 4))
    q.export(batch(4, 7))

    // scrape #1: two pending batches, nothing delivered yet
    val t1 = 1700000000000000000L
    val f1 = svc.healthFrame(spark, t1, startTimeUnixNano = t1 - 1L,
      obs = Map("logs/out" -> obs))
    // the frame IS the standard metric-point shape — schema-identical
    assert(f1.schema == graft.model.OtelModel.metricPointSchema)
    def point(df: org.apache.spark.sql.DataFrame, name: String): org.apache.spark.sql.Row =
      df.filter(col("metric_name") === name).head()
    val qs1 = point(f1, "otelcol_exporter_queue_size")
    assert(qs1.getAs[Double]("value") == 2.0)
    assert(qs1.getAs[String]("metric_type") == "gauge")
    assert(qs1.getAs[Map[String, String]]("attributes")("pipeline") == "logs/out")
    assert(qs1.getAs[Map[String, String]]("resource_attributes")("service.name") ==
      "graft-collector")
    val sent1 = point(f1, "otelcol_exporter_sent_batches")
    assert(sent1.getAs[Double]("value") == 0.0)
    assert(sent1.getAs[String]("aggregation_temporality") == "cumulative" &&
      sent1.getAs[Boolean]("is_monotonic"))

    // deliver, then scrape #2
    gate.up = true
    assert(svc.drain(spark, budgetMs = 30000))
    val t2 = t1 + 60000000000L
    val f2 = svc.healthFrame(spark, t2, startTimeUnixNano = t1 - 1L,
      obs = Map("logs/out" -> obs))
    assert(point(f2, "otelcol_exporter_queue_size").getAs[Double]("value") == 0.0)
    assert(point(f2, "otelcol_exporter_sent_batches").getAs[Double]("value") == 2.0)

    // the dogfood loop: run the q_gauge_last OPERATOR over the
    // service's own scrapes — last queue depth per series must be the
    // post-drain value, not the backlog
    val scrapes = f1.unionAll(f2)
    val lastDepth = graft.operators.MetricsOps.gaugeLast(
      scrapes.filter(col("metric_type") === "gauge"),
      Seq(col("metric_name")), expr("time_unix_nano DIV 3600000000000"),
      col("value"), col("time_unix_nano"))
    val m = lastDepth.collect()
      .map(r => r.getString(0) -> r.getAs[Double]("last_value")).toMap
    assert(m("otelcol_exporter_queue_size") == 0.0, m)
    assert(m("otelcol_exporter_dlq_depth") == 0.0, m)
  }

  test("bytes sizer: a full-by-bytes queue refuses accepts and admits again after draining") {
    // the exporterhelper queue sizes by items AND bytes; graft's item
    // cap alone would let a few huge batches exhaust the spool disk
    val dir = Files.createTempDirectory("pq_bytes").toString
    val gate = new GatedExporter // down: everything stays pending
    val q = PersistentQueueExporter(gate, dir, maxAttemptsPerBatch = 10,
      retriesPerRun = 0, backoffMs = 1, capacity = 1000, capacityBytes = 1)
    // capacityBytes=1: the FIRST accept spools fine (queue empty),
    // the second sees pending bytes >= 1 and refuses
    q.export(batch(0, 5))
    val e = intercept[IllegalStateException] { q.export(batch(5, 9)) }
    assert(e.getMessage.contains("bytes"), e.getMessage)
    // the refused batch was NOT spooled
    assert(new java.io.File(s"$dir/pending").listFiles()
      .count(_.isDirectory) == 1)
    // drain: endpoint up, recover delivers; accepts flow again
    gate.up = true
    assert(q.recover(spark) == RecoveryStats(1, 0, 0))
    q.export(batch(5, 9))
    assert(gate.deliveries.size == 2)
  }

  test("queue-full refuses new data (backpressure), pending batches unharmed") {
    val dir = Files.createTempDirectory("pq_full").toString
    val gate = new GatedExporter // down
    val q = PersistentQueueExporter(gate, dir, capacity = 2,
      retriesPerRun = 0, backoffMs = 1)
    q.export(batch(0, 2))
    q.export(batch(2, 4))
    intercept[IllegalStateException] { q.export(batch(4, 6)) }
    assert(new java.io.File(s"$dir/pending").listFiles().count(_.isDirectory) == 2)
  }

  test("claim ledger compacts above the high-water mark; compacted ids never reissue") {
    // the never-deleted ids/ ledger would otherwise grow one file per
    // batch forever; compaction must keep the no-reuse guarantee even
    // for an instance whose seq hint is stale or gone
    val dir = Files.createTempDirectory("pq_ledger").toString
    val gate = new GatedExporter
    gate.up = true
    val q = PersistentQueueExporter(gate, dir, backoffMs = 1,
      ledgerCompactEvery = 4)
    for (i <- 0 until 10) q.export(batch(i, i + 1))
    assert(gate.deliveries.size == 10)
    gate.deliveries.forEach((_, n) => assert(n == 1))
    val claims = new java.io.File(s"$dir/ids").listFiles()
      .map(_.getName).filter(_.startsWith("id_"))
    assert(claims.length < 10, s"ledger never compacted: ${claims.length} claim files")
    val floors = new java.io.File(s"$dir/ids").listFiles()
      .map(_.getName).filter(_.startsWith("floor_"))
    assert(floors.length == 1, s"expected one floor marker, got ${floors.mkString(",")}")
    // stale-hint instance: seq gone, only the floor marker + surviving
    // claims arbitrate — it must allocate a FRESH id past the floor
    assert(new java.io.File(s"$dir/seq").delete())
    val q2 = PersistentQueueExporter(gate, dir, backoffMs = 1,
      ledgerCompactEvery = 4)
    q2.export(batch(100, 101))
    assert(gate.deliveries.size == 11, "a compacted id was reissued")
    gate.deliveries.forEach((_, n) => assert(n == 1))
  }

  test("a stale compactor's lower floor cannot regress the ledger (monotone markers)") {
    // r7 ADVICE (high): with a single overwritable floor file, a slow
    // compactor in a second instance could write a LOWER floor after a
    // faster peer had raised it and deleted the claim files above — a
    // stale-hint allocator then re-claims an already-delivered id and a
    // later batch silently overwrites it. Markers are exclusive-create
    // and the effective floor is their max, so the lower write is inert.
    val dir = Files.createTempDirectory("pq_floor").toString
    val gate = new GatedExporter
    gate.up = true
    val q = PersistentQueueExporter(gate, dir, backoffMs = 1,
      ledgerCompactEvery = 4)
    for (i <- 0 until 10) q.export(batch(i, i + 1))
    assert(gate.deliveries.size == 10)
    val ids = new java.io.File(s"$dir/ids")
    val hi = ids.listFiles().map(_.getName).filter(_.startsWith("floor_"))
      .map(_.stripPrefix("floor_").toLong).max
    // the stale compactor races in: a lower marker AND a lower legacy
    // floor file land after the high marker
    assert(new java.io.File(ids, "floor_2").createNewFile())
    java.nio.file.Files.write(new java.io.File(ids, "floor").toPath,
      "2".getBytes("UTF-8"))
    // stale hint too — worst case: allocation restarts from the floor
    assert(new java.io.File(s"$dir/seq").delete())
    val q2 = PersistentQueueExporter(gate, dir, backoffMs = 1,
      ledgerCompactEvery = 1024)
    q2.export(batch(100, 101))
    assert(gate.deliveries.size == 11,
      s"an id below the high floor $hi was reissued and overwrote a delivered batch")
    gate.deliveries.forEach((_, n) => assert(n == 1))
  }
}
