package graft.pipeline

import java.util.concurrent.atomic.AtomicLong

/** Process-heap memory limiter — the reference memory limiter's
  * RUNTIME trigger (processor/memorylimiterprocessor/
  * memorylimiter.go:119 readMemStats, :229 startMonitoring ticker,
  * :270 checkMemLimits — behavior, not code): a periodic check reads
  * live heap statistics and flips a `mustRefuse` flag that admission
  * paths consult. Semantics mirrored exactly:
  *
  *  - hard limit = `limitBytes` (memAllocLimit): usage at/above it
  *    forces a GC immediately and re-reads;
  *  - soft limit = hard − spike (`spikeBytes`, default 20% of the
  *    limit — the reference's unspecified-spike default): usage
  *    at/above soft ⇒ refuse new data (RETRYABLE — receivers back
  *    off, senders retry; nothing is dropped);
  *  - on the not-refusing → refusing transition, a GC is forced
  *    first (rate-limited by `minGcIntervalMs`, the reference's
  *    minGCIntervalWhenSoftLimited) and the verdict re-checked — a
  *    collectable spike should never flip the gate;
  *  - once usage falls back under soft, the flag clears (resume).
  *
  * This complements graft's data-driven limiters (byte budgets,
  * top-N, admission budgets): those bound what the pipeline ACCEPTS;
  * this one watches what the PROCESS actually holds — the "look at
  * the heap, refuse when the process is under pressure" trigger.
  * `readHeap`/`forceGc` are injectable so specs drive deterministic
  * pressure; defaults read the JVM runtime.
  */
final class HeapLimiter(
    limitBytes: Long,
    spikeBytes: Long = 0L,
    checkIntervalMs: Long = 1000L,
    minGcIntervalMs: Long = 10000L,
    readHeap: () => Long = HeapLimiter.jvmHeapUsed,
    forceGc: () => Unit = HeapLimiter.jvmGc) {
  require(limitBytes > 0, "limitBytes must be positive")
  private val spike = if (spikeBytes > 0L) spikeBytes else limitBytes / 5
  require(spike < limitBytes, "spike limit must be below the memory limit")
  /** refuse at/above this */
  val softLimitBytes: Long = limitBytes - spike

  val gcForced = new AtomicLong
  val refuseFlips = new AtomicLong
  @volatile private var refusing = false
  @volatile private var lastGcDone = 0L
  @volatile private var running = false

  /** the admission gate: true ⇒ refuse new data (retryable) */
  def mustRefuse: Boolean = refusing

  private def doGcAndRead(): Long = {
    forceGc()
    lastGcDone = System.nanoTime()
    gcForced.incrementAndGet()
    readHeap()
  }

  /** one check tick — callable directly (specs) or via [[start]] */
  def checkMemLimits(): Unit = synchronized {
    var used = readHeap()
    if (used >= limitBytes) used = doGcAndRead() // hard limit: GC now
    val wasRefusing = refusing
    var refuse = used >= softLimitBytes
    if (!wasRefusing && refuse) {
      // above soft: GC (if not done recently) and re-check before
      // flipping — a collectable spike must not gate the pipeline
      if ((System.nanoTime() - lastGcDone) / 1000000L > minGcIntervalMs) {
        used = doGcAndRead()
        refuse = used >= softLimitBytes
      }
      if (refuse) refuseFlips.incrementAndGet()
    }
    refusing = refuse
  }

  /** start the ticker (one daemon thread, reference startMonitoring) */
  def start(): this.type = {
    checkMemLimits()
    running = true
    val t = new Thread(() => {
      while (running) {
        try Thread.sleep(checkIntervalMs)
        catch { case _: InterruptedException => () }
        if (running) checkMemLimits()
      }
    }, "heap-limiter")
    t.setDaemon(true); t.start()
    this
  }
  def stop(): Unit = running = false
}

object HeapLimiter {
  /** in-use JVM heap — the runtime.MemStats.Alloc analog */
  def jvmHeapUsed(): Long = {
    val r = Runtime.getRuntime
    r.totalMemory() - r.freeMemory()
  }
  def jvmGc(): Unit = System.gc()

  /** total memory available to the process — the iruntime/cgroups
    * TotalMemory analog (memorylimiter config.go limit_percentage
    * base). `Runtime.maxMemory` is the JVM's -Xmx, which modern JVMs
    * derive cgroup-aware (UseContainerSupport), so a containerized
    * collector sees its actual ceiling, exactly the reference's
    * cgroup read. */
  def totalMemory(): Long = Runtime.getRuntime.maxMemory()

  /** percentage-based construction (memorylimiterprocessor config.go:
    * limit_percentage / spike_limit_percentage against total process
    * memory; Validate pins (0,100] and spike < limit) */
  def fromPercentages(limitPercentage: Int, spikeLimitPercentage: Int,
                      total: Long = totalMemory(),
                      checkIntervalMs: Long = 1000L,
                      minGcIntervalMs: Long = 10000L,
                      readHeap: () => Long = jvmHeapUsed,
                      forceGc: () => Unit = jvmGc): HeapLimiter = {
    require(limitPercentage > 0 && limitPercentage <= 100,
      s"limit_percentage must be in (0, 100]: $limitPercentage")
    require(spikeLimitPercentage >= 0 && spikeLimitPercentage < limitPercentage,
      s"spike_limit_percentage must be below limit_percentage: " +
        s"$spikeLimitPercentage >= $limitPercentage")
    new HeapLimiter(
      limitBytes = total / 100L * limitPercentage,
      spikeBytes = total / 100L * spikeLimitPercentage,
      checkIntervalMs = checkIntervalMs, minGcIntervalMs = minGcIntervalMs,
      readHeap = readHeap, forceGc = forceGc)
  }
}
