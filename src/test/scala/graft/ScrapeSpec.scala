package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Scrape
import graft.streaming.Scrape.{Controller, Scraper, ScrapeResult}

/** scraperhelper controller semantics: interval validation, merged
  * multi-scraper ticks, full-failure isolation, partial-scrape
  * forwarding, scrape timeout, and the immediate-first-scrape
  * schedule. */
class ScrapeSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def points(s: SparkSession, n: Int, name: String): DataFrame = {
    import s.implicits._
    (0 until n).map(i => (name, i.toLong, 1.5 * i)).toDF("name", "idx", "value")
  }

  private def fixed(idStr: String, n: Int): Scraper = new Scraper {
    val id = idStr
    def scrape(s: SparkSession) = ScrapeResult(points(s, n, idStr))
  }

  test("config validation: non-positive interval and duplicate ids are rejected") {
    val s = fixed("a", 1)
    intercept[IllegalArgumentException] {
      new Controller(spark, Seq(s), tmpDir("sc"), collectionIntervalMs = 0)
    }
    intercept[IllegalArgumentException] {
      new Controller(spark, Seq(s, fixed("a", 2)), tmpDir("sc"),
        collectionIntervalMs = 100)
    }
    intercept[IllegalArgumentException] {
      new Controller(spark, Nil, tmpDir("sc"), collectionIntervalMs = 100)
    }
  }

  test("one failing scraper never stalls the rest; partial scrapes forward their subset") {
    val spool = tmpDir("scrape_spool")
    val flaky = new Scraper {
      val id = "flaky"
      private var calls = 0
      def scrape(s: SparkSession) = {
        calls += 1
        if (calls == 2) throw new RuntimeException("target unreachable")
        ScrapeResult(points(s, 4, id))
      }
    }
    val partial = new Scraper {
      val id = "partial"
      def scrape(s: SparkSession) =
        // scrapererror.PartialScrapeError: 3 points scraped, 2 failed
        ScrapeResult(points(s, 3, id), failedPoints = 2)
    }
    val ctl = new Controller(spark, Seq(fixed("healthy", 5), flaky, partial),
      spool, collectionIntervalMs = 60000)
    try {
      assert(ctl.tick() == 12) // 5 + 4 + 3
      assert(ctl.tick() == 8)  // 5 + 0 (flaky fails) + 3
      assert(ctl.obs("healthy").scrapedPoints.get == 10)
      assert(ctl.obs("flaky").scrapedPoints.get == 4)
      assert(ctl.obs("flaky").failedScrapes.get == 1)
      assert(ctl.obs("partial").scrapedPoints.get == 6)
      assert(ctl.obs("partial").erroredPoints.get == 4) // 2 per tick
      // everything that scraped landed on the shared spool layout
      val back = spark.read.parquet(spool)
      assert(back.count() == 20)
      assert(back.filter(org.apache.spark.sql.functions.col("name") === "flaky")
        .count() == 4)
    } finally ctl.stop()
  }

  test("a hung scraper is abandoned at the timeout; the tick completes without it") {
    val spool = tmpDir("scrape_timeout")
    val hung = new Scraper {
      val id = "hung"
      def scrape(s: SparkSession) = { Thread.sleep(60000); ScrapeResult(points(s, 1, id)) }
    }
    val ctl = new Controller(spark, Seq(hung, fixed("ok", 2)), spool,
      collectionIntervalMs = 60000, timeoutMs = 400)
    try {
      assert(ctl.tick() == 2) // only "ok" lands
      assert(ctl.obs("hung").timedOutScrapes.get == 1)
      assert(ctl.obs("ok").scrapedPoints.get == 2)
    } finally ctl.stop()
  }

  test("schedule scrapes IMMEDIATELY at start, not one interval later") {
    val spool = tmpDir("scrape_sched")
    val ctl = new Controller(spark, Seq(fixed("fast", 3)), spool,
      collectionIntervalMs = 600000) // would be 10 min until tick 2
    try {
      ctl.start()
      val deadline = System.currentTimeMillis() + 15000
      while (ctl.obs("fast").scrapedPoints.get < 3 &&
             System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(ctl.obs("fast").scrapedPoints.get == 3,
        "first scrape must fire at start, not after collection_interval")
    } finally ctl.stop()
  }

  test("config-declared scrape pipeline: scrape_jvm receiver streams self-metrics through processors to a sink") {
    val spool = java.nio.file.Files.createTempDirectory("scrape_spool").toString
    val sink = java.nio.file.Files.createTempDirectory("scrape_sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("scrape_ckpt").toString
    val svc = graft.pipeline.ConfigLoader.fromJson(
      s"""{"pipelines": {"metrics/self": {
         |  "receiver": {"type": "scrape_jvm", "spool": "$spool",
         |               "interval_ms": 500},
         |  "processors": [{"type": "filter",
         |                  "where": "metric_name LIKE 'jvm.%'"}],
         |  "exporters": [{"type": "parquet", "path": "$sink/out"}]}}}""".stripMargin)
    val spark2 = TestSession.spark
    val queries = svc.runStreaming(spark2, ckpt)
    try {
      // the controller's IMMEDIATE first scrape + the streaming read
      // must land rows at the sink without any external push
      val deadline = System.currentTimeMillis() + 30000
      def sinkRows(): Long =
        try spark2.read.parquet(s"$sink/out")
          .filter(org.apache.spark.sql.functions.col("metric_name") ===
            "jvm.memory.heap.used").count()
        catch { case _: Exception => 0L }
      while (sinkRows() == 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(sinkRows() > 0, "no scraped jvm metrics reached the sink")
      val row = spark2.read.parquet(s"$sink/out")
        .filter(org.apache.spark.sql.functions.col("metric_name") ===
          "jvm.memory.heap.used").head()
      assert(row.getAs[Double]("value") > 0.0)
      assert(row.getAs[Map[String, String]]("resource_attributes")(
        "service.name") == "graft-collector")
      // gc sums carry cumulative temporality — §2 operators consume
      // them directly (q_rate_per_minute / delta conversion shapes)
      assert(spark2.read.parquet(s"$sink/out")
        .filter(org.apache.spark.sql.functions.col("metric_name") ===
          "jvm.gc.collections")
        .head().getAs[String]("aggregation_temporality") == "cumulative")
    } finally {
      queries.values.flatten.foreach(_.stop())
      svc.stopReceivers()
    }
  }
}
