package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Processors
import graft.operators.Processors._
import graft.operators.TextOps

class ProcessorsSpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("Extract action pulls regex groups into attributes") {
    val d = Processors.attributes(Tables(spark, sf, "documents"), Seq(
      Extract("source", "src(\\d+)", Seq("src_num" -> 1)),
      Upsert("src_num_int", col("src_num").cast("int"))))
    val r = d.filter(col("source") === "src3").head()
    assert(r.getAs[String]("src_num") == "3")
    assert(r.getAs[Int]("src_num_int") == 3)
  }

  test("per-partition batch ids (scale path) cover all rows with bounded batches") {
    val b = Processors.assignBatches(Tables(spark, sf, "events"),
      col("event_id"), batchSize = 100, globalOrder = false)
    val stats = b.groupBy(col("batch_id")).count()
    assert(stats.agg(sum(col("count"))).head().getLong(0) == 1000)
    assert(stats.agg(max(col("count"))).head().getLong(0) <= 100)
  }

  test("native wordlistHits matches the HOF formulation") {
    val toks = TextOps.tokens(col("text"))
    val stop = TextOps.EnStop
    val d = Tables(spark, sf, "documents").select(
      TextOps.wordlistHits(toks, stop).as("native"),
      size(org.apache.spark.sql.functions.filter(toks,
        t => stop.map(w => t === lit(w)).reduce(_ || _))).as("hof"))
    assert(d.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("streaming session windows aggregate per key") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String, Double)]
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(minutes: Int) = new java.sql.Timestamp(base + minutes * 60000L)
    ms.addData(Seq(
      (ts(0), "u1", 1.0), (ts(5), "u1", 2.0),   // session 1 (gap<30m)
      (ts(60), "u1", 4.0),                      // session 2
      (ts(0), "u2", 8.0)))
    val agg = graft.streaming.StreamingPipelines.sessionAgg(
      ms.toDF().toDF("ts", "key", "value"), "key", "30 minutes", "0 seconds")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sess_out").start()
    try {
      q.processAllAvailable()
      val rows = spark.sql("SELECT key, n, total_value FROM sess_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(rows == Set(("u1", 2L, 3.0), ("u1", 1L, 4.0), ("u2", 1L, 8.0)))
    } finally q.stop()
  }

  test("OTTL pattern extraction yields NULL on malformed props — never an ANSI cast crash") {
    import spark.implicits._
    // regexp_extract returns '' on a no-match row; under ANSI mode a
    // plain CAST('' AS BIGINT) crashes the whole query, while the
    // DuckDB oracle's TRY_CAST yields NULL — the engines must agree
    // on malformed attribute bags (the q_ottl_extract_patterns kernel)
    val got = Seq("""{"k": 7}""", """{}""", """{"k": "x"}""", """{"k": 12}""")
      .toDF("props")
      .withColumn("k", org.apache.spark.sql.functions.expr(
        """try_cast(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT)"""))
      .collect().map(r => if (r.isNullAt(1)) None else Some(r.getLong(1))).toSeq
    assert(got == Seq(Some(7L), None, None, Some(12L)), got)
  }
}
