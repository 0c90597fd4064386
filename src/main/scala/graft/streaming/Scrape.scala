package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** scraperhelper controller analog (reference:
  * receiver/scraperhelper/scrapercontroller.go + receiver/
  * scrapererror/partialscrapeerror.go): a driver-side schedule that
  * pulls each registered scraper on an interval, merges what they
  * return, records per-scraper observability, and lands the result on
  * the spool layout every other graft receiver feeds — so scraped
  * metrics enter the identical streaming parse path as pushed ones.
  *
  * Reference semantics carried over (scrapercontroller.go):
  *  - `collection_interval` must be a positive duration — config
  *    validation, not a runtime surprise (line ~185).
  *  - the FIRST scrape fires at start (after `initial_delay`), not
  *    one full interval later (startScraping's comment: "ensure that
  *    scrapers start from when the component starts").
  *  - an injectable tick (WithTickerChannel) for deterministic tests:
  *    [[Controller.tick]] is that channel made a method.
  *  - a scraper that FAILS outright contributes nothing this tick and
  *    the controller moves on — one broken scraper never stalls the
  *    rest (scrapeMetricsAndReport's continue).
  *  - a PARTIAL scrape error (scrapererror.PartialScrapeError) still
  *    forwards the scraped subset; the failed point count is recorded
  *    (scrapeMetricsAndReport forwards md alongside the error).
  *  - a per-tick scrape `timeout` (withScrapeContext): a hung scraper
  *    is abandoned and counted, the tick completes without it.
  *
  * Scale shape: scraping is inherently a driver-side pull of a
  * bounded snapshot (a target's current state), so the per-tick
  * count()/write are bounded by the snapshot size, never by SF; the
  * DISTRIBUTED half is downstream — the spool feeds Structured
  * Streaming like any push receiver.
  */
object Scrape {

  /** PartialScrapeError made a value: the scraped subset plus how
    * many points failed. A full-scrape failure is a thrown exception
    * from [[Scraper.scrape]] instead. */
  final case class ScrapeResult(frame: DataFrame, failedPoints: Int = 0)

  trait Scraper {
    def id: String
    def scrape(spark: SparkSession): ScrapeResult
  }

  /** Concrete scraper with no external target: JVM runtime metrics
    * (the hostmetrics-receiver shape applied to the collector's own
    * process — heap gauges + cumulative GC sums from the platform MX
    * beans), emitted in the standard metric-point schema so every §2
    * metrics operator consumes them directly. */
  final class JvmScraper(override val id: String = "jvm") extends Scraper {
    private val startNanos = System.currentTimeMillis() * 1000000L
    def scrape(spark: SparkSession): ScrapeResult = {
      import org.apache.spark.sql.Row
      import scala.jdk.CollectionConverters._
      val now = System.currentTimeMillis() * 1000000L
      val res = Map(graft.model.SemConv.AttributeServiceName -> "graft-collector")
      val heap = java.lang.management.ManagementFactory
        .getMemoryMXBean.getHeapMemoryUsage
      def gauge(name: String, unit: String, v: Double,
                attrs: Map[String, String]): Row =
        Row(name, "gauge", null, unit, null, null, now, null, v, attrs, res)
      def sum(name: String, unit: String, v: Double,
              attrs: Map[String, String]): Row =
        Row(name, "sum", null, unit, "cumulative", true, now, startNanos,
          v, attrs, res)
      val gcRows = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala.toSeq.flatMap { gc =>
          val attrs = Map("gc" -> gc.getName)
          Seq(
            sum("jvm.gc.collections", "{collections}",
              math.max(gc.getCollectionCount, 0L).toDouble, attrs),
            sum("jvm.gc.duration_ms", "ms",
              math.max(gc.getCollectionTime, 0L).toDouble, attrs))
        }
      val rows = Seq(
        gauge("jvm.memory.heap.used", "By", heap.getUsed.toDouble, Map.empty),
        gauge("jvm.memory.heap.committed", "By",
          heap.getCommitted.toDouble, Map.empty)) ++ gcRows
      ScrapeResult(spark.createDataFrame(rows.asJava,
        graft.model.OtelModel.metricPointSchema))
    }
  }

  /** obsreport.Scraper analog: per-scraper scraped/errored tallies */
  final class ScraperObs {
    val ticks = new java.util.concurrent.atomic.AtomicLong
    val scrapedPoints = new java.util.concurrent.atomic.AtomicLong
    val erroredPoints = new java.util.concurrent.atomic.AtomicLong
    val failedScrapes = new java.util.concurrent.atomic.AtomicLong
    val timedOutScrapes = new java.util.concurrent.atomic.AtomicLong
    /** snapshot in the Service.healthFrame transports shape */
    def counters: Map[String, Long] = Map(
      "scraped_points" -> scrapedPoints.get,
      "errored_points" -> erroredPoints.get,
      "failed_scrapes" -> failedScrapes.get,
      "timed_out_scrapes" -> timedOutScrapes.get)
  }

  final class Controller(
      spark: SparkSession,
      scrapers: Seq[Scraper],
      spoolDir: String,
      collectionIntervalMs: Long,
      initialDelayMs: Long = 0L,
      timeoutMs: Long = 30000L) {
    require(collectionIntervalMs > 0,
      "collection_interval must be a positive duration")
    require(scrapers.nonEmpty, "no scrapers registered")
    require(scrapers.map(_.id).distinct.size == scrapers.size,
      "duplicate scraper ids")

    val obs: Map[String, ScraperObs] =
      scrapers.map(_.id -> new ScraperObs).toMap

    private val pool = java.util.concurrent.Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "scrape-worker"); t.setDaemon(true); t
    })
    @volatile private var running = false
    private var ticker: Thread = _

    /** One scrape-and-report pass over every scraper — the
      * WithTickerChannel injection point, callable directly from
      * tests or an external scheduler. Returns the number of rows
      * landed this tick. */
    def tick(): Long = {
      var landed = 0L
      for (s <- scrapers) {
        val o = obs(s.id)
        o.ticks.incrementAndGet()
        val fut = pool.submit(new java.util.concurrent.Callable[ScrapeResult] {
          def call(): ScrapeResult = s.scrape(spark)
        })
        try {
          val r = fut.get(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
          // the scrape snapshot is bounded by the TARGET's state (a
          // process's current gauges), never by SF — counting and
          // spooling it driver-side is the scraper contract
          val n = r.frame.count()
          if (n > 0) r.frame.write.mode("append").parquet(spoolDir)
          o.scrapedPoints.addAndGet(n)
          if (r.failedPoints > 0) o.erroredPoints.addAndGet(r.failedPoints.toLong)
          landed += n
        } catch {
          case _: java.util.concurrent.TimeoutException =>
            fut.cancel(true)
            o.timedOutScrapes.incrementAndGet()
            o.failedScrapes.incrementAndGet()
          case e: java.util.concurrent.ExecutionException =>
            o.failedScrapes.incrementAndGet()
            val _ = e // full-scrape failure: log-and-continue semantics
        }
      }
      landed
    }

    /** start the interval schedule: initial delay, then an IMMEDIATE
      * first scrape, then one per interval until [[stop]]. */
    def start(): Unit = synchronized {
      if (running) return
      running = true
      ticker = new Thread(() => {
        try {
          if (initialDelayMs > 0) Thread.sleep(initialDelayMs)
          tick() // scrape at start, not one interval later
          while (running) {
            Thread.sleep(collectionIntervalMs)
            if (running) tick()
          }
        } catch { case _: InterruptedException => () }
      }, "scrape-ticker")
      ticker.setDaemon(true)
      ticker.start()
    }

    /** stop the schedule and wait for the ticker to terminate (the
      * reference Shutdown's `<-sc.terminated` join). */
    def stop(): Unit = synchronized {
      running = false
      if (ticker != null) { ticker.interrupt(); ticker.join(5000) }
      pool.shutdownNow()
      ()
    }
  }
}
