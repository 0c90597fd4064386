package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{AdmissionController, HeapLimiter}
import graft.streaming.StreamingPipelines

/** Process-heap memory limiter: the reference memorylimiter's
  * soft/hard semantics with forced-GC recheck, the admission-
  * controller trigger, real-JVM allocation pressure, and the
  * streaming refuse→recover drive.
  */
class HeapLimiterSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  test("soft/hard semantics with forced-GC recheck (deterministic injected heap)") {
    var heap = 0L
    var gcReclaims = 0L
    val hl = new HeapLimiter(limitBytes = 1000L, spikeBytes = 200L,
      minGcIntervalMs = 0L,
      readHeap = () => math.max(0L, heap - gcReclaims),
      forceGc = () => gcReclaims += 300L)
    // soft limit = 800
    assert(hl.softLimitBytes == 800L)

    heap = 500L; hl.checkMemLimits()
    assert(!hl.mustRefuse, "under soft: admit")

    // a collectable spike: 900 observed, GC reclaims 300 → 600 < soft
    // ⇒ the flip is AVERTED by the transition GC (reference behavior)
    heap = 900L; hl.checkMemLimits()
    assert(!hl.mustRefuse, "GC-recheck must avert the flip")
    assert(hl.gcForced.get == 1)

    // non-collectable pressure: hard-limit GC (1600→1300) and the
    // transition GC (1300→1000) both run, usage stays ≥ soft
    gcReclaims = 0L
    heap = 1600L; hl.checkMemLimits()
    assert(hl.mustRefuse, "persistent pressure refuses")
    assert(hl.refuseFlips.get == 1)

    // recovery: usage falls under soft → resume, no GC needed
    heap = 400L; gcReclaims = 0L; hl.checkMemLimits()
    assert(!hl.mustRefuse, "recovered")
  }

  test("hard limit forces a GC immediately") {
    var heap = 2000L
    var gcs = 0
    val hl = new HeapLimiter(limitBytes = 1000L, spikeBytes = 200L,
      minGcIntervalMs = 60000L,
      readHeap = () => heap,
      forceGc = () => { gcs += 1; heap = 100L })
    hl.checkMemLimits()
    assert(gcs == 1, "above hard ⇒ GC now")
    assert(!hl.mustRefuse, "GC brought usage under soft")
  }

  test("admission controller refuses retryably under heap pressure, recovers after") {
    var pressure = false
    val hl = new HeapLimiter(limitBytes = 1000L, minGcIntervalMs = 0L,
      readHeap = () => if (pressure) 990L else 10L, forceGc = () => ())
    val ctl = new AdmissionController(1 << 20).withHeapLimiter(hl)

    hl.checkMemLimits()
    assert(ctl.acquire(100L).isRight)
    ctl.release(100L)

    pressure = true; hl.checkMemLimits()
    assert(ctl.acquire(100L, waitMs = 10L) ==
      Left(AdmissionController.MemoryPressure),
      "budget has room but the PROCESS is under pressure")

    pressure = false; hl.checkMemLimits()
    assert(ctl.acquire(100L).isRight)
    ctl.release(100L)
  }

  test("real JVM allocation pressure flips the gate; release + GC recovers it") {
    // settle the baseline first: prior suites leave collectable
    // garbage, and an inflated used0 would put the soft limit above
    // the post-GC live set, letting the limiter's own GC "recover"
    // the pressured check
    HeapLimiter.jvmGc(); Thread.sleep(200)
    val used0 = HeapLimiter.jvmHeapUsed()
    // soft limit ~48 MiB above the settled live set, spike 16 MiB
    val hl = new HeapLimiter(limitBytes = used0 + (64L << 20),
      spikeBytes = 16L << 20, minGcIntervalMs = 0L)
    hl.checkMemLimits()
    assert(!hl.mustRefuse, "baseline under soft")

    // the ballast lives (and dies) inside this frame: an interpreted
    // test frame's stack slots pin anything referenced from the OUTER
    // frame, so allocate+check+release in a helper that returns
    def pressurize(): Unit = {
      val ballast = Array.tabulate(10)(_ => new Array[Byte](16 << 20))
      hl.checkMemLimits()
      assert(hl.mustRefuse,
        s"live ${ballast.length * 16} MiB must refuse")
    }
    pressurize()
    // recovery needs the collector to actually reclaim: the hard-limit
    // path GCs on the next check; allow a couple of ticks
    var tries = 0
    while (hl.mustRefuse && tries < 10) {
      hl.checkMemLimits(); tries += 1; Thread.sleep(50)
    }
    assert(!hl.mustRefuse, s"gate must clear after release (tries=$tries)")
  }

  test("streaming: pressured triggers respool everything, recovery drains") {
    import java.nio.file.{Files, Paths}
    val inDir = Files.createTempDirectory("heap_in").toString
    val ck = Files.createTempDirectory("heap_ck").toString
    Files.write(Paths.get(inDir, "burst.txt"),
      (1 to 200).map(i => f"rec-$i%04d").mkString("\n").getBytes("UTF-8"))

    @volatile var pressure = true
    val hl = new HeapLimiter(limitBytes = 1000L, minGcIntervalMs = 0L,
      readHeap = () => if (pressure) 990L else 10L, forceGc = () => ())
    hl.checkMemLimits()

    val delivered = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val pressuredDeliveries = new java.util.concurrent.atomic.AtomicLong
    val exporter = new graft.pipeline.Pipeline.Exporter {
      def export(df: org.apache.spark.sql.DataFrame): Unit = ()
      override def exportBatch(df: org.apache.spark.sql.DataFrame, batchId: Long): Unit = {
        val rows = df.collect().map(_.getString(0))
        if (rows.nonEmpty && pressure) pressuredDeliveries.incrementAndGet()
        rows.foreach(delivered.add)
      }
    }
    val refusedBatches = new java.util.concurrent.atomic.AtomicLong
    val refuse: (org.apache.spark.sql.DataFrame, Long) => Unit = (df, batchId) => {
      val lines = df.collect().map(_.getString(0))
      if (lines.nonEmpty) {
        refusedBatches.incrementAndGet()
        Files.write(Paths.get(inDir, f"refused-$batchId%06d.txt"),
          lines.mkString("\n").getBytes("UTF-8"))
      }
    }
    val q = StreamingPipelines.exportStreamAdmitted(
      spark.readStream.text(inDir), exporter, ck,
      maxRowsPerBatch = 100, order = Seq(col("value")), refuse, heap = Some(hl))
    try {
      // under pressure, refuse→respool→re-read cycles continuously
      // (each trigger respools to a new batchId-named file), so the
      // stream NEVER quiesces — poll counters, don't
      // processAllAvailable (it would block on the self-feeding loop)
      var deadline = System.currentTimeMillis() + 30000
      while (refusedBatches.get < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(refusedBatches.get >= 2, "pressured triggers keep respooling")
      assert(delivered.isEmpty, "pressured triggers must not deliver")
      // recovery: the last respooled slice drains in bounded batches
      pressure = false; hl.checkMemLimits()
      deadline = System.currentTimeMillis() + 60000
      while (delivered.size() < 200 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
    } finally q.stop()
    assert(delivered.size() == 200, s"all rows after recovery: ${delivered.size()}")
    assert(pressuredDeliveries.get == 0, "no delivery while pressured")
  }

  test("percentage limits: limit_percentage/spike_limit_percentage derive bytes from total memory; config validation pins the ranges") {
    import graft.pipeline.HeapLimiter
    // deterministic: a fake 1000-byte "total memory"
    var heap = 0L
    val lim = HeapLimiter.fromPercentages(80, 25, total = 1000L,
      readHeap = () => heap, forceGc = () => ())
    // soft = 80% − 25% of total = 550 bytes
    assert(lim.softLimitBytes == 550L)
    heap = 540L; lim.checkMemLimits()
    assert(!lim.mustRefuse)
    heap = 560L; lim.checkMemLimits()
    assert(lim.mustRefuse)

    // Validate semantics (memorylimiter config.go)
    intercept[IllegalArgumentException](
      HeapLimiter.fromPercentages(0, 0, total = 1000L))
    intercept[IllegalArgumentException](
      HeapLimiter.fromPercentages(101, 10, total = 1000L))
    intercept[IllegalArgumentException](
      HeapLimiter.fromPercentages(50, 50, total = 1000L))
    // the real total-memory base is positive and cgroup-aware (-Xmx)
    assert(HeapLimiter.totalMemory() > 0)
  }
}
