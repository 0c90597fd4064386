package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table loader. Tables mirror the driver's DuckDB oracle
  * views (bare table names over the same parquet files).
  *
  * `events.ts` is INT64 TIMESTAMP(NANOS) parquet, which Spark's
  * vectorized reader rejects. Sessions must set
  * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[GraftSession]]);
  * the raw nanos land in `ts_ns` (bigint) and a micro-truncated
  * `ts` timestamp is derived. Bucketing math uses integral `ts_ns`
  * arithmetic (never double division — 1.7e18 exceeds the 53-bit
  * mantissa).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
    else df
  }
}
