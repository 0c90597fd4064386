package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table loader. Tables mirror the driver's DuckDB oracle
  * views (bare table names over the same parquet files).
  *
  * `events.ts` has shipped as two parquet physical types across
  * driver generations, and the loader normalizes both to the same
  * surface — `ts_ns` (bigint naive-UTC nanos, matching DuckDB's
  * `epoch_ns(ts)`) plus a micro-truncated `ts` timestamp:
  *  - INT64 TIMESTAMP(NANOS): Spark's vectorized reader rejects it
  *    unless `spark.sql.legacy.parquet.nanosAsLong=true` (set in
  *    [[GraftSession]]), which lands the raw nanos as a bigint.
  *  - timestamp[us] (µs precision): read as TIMESTAMP_NTZ; the naive
  *    value is epoch-UTC by construction, so with the session pinned
  *    to UTC, `unix_micros(cast)` recovers the exact micros.
  * Bucketing math uses integral `ts_ns` arithmetic (never double
  * division — 1.7e18 exceeds the 53-bit mantissa).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns DIV 1000")))
      else {
        // keep the legacy column layout: ts_ns where ts was, ts last
        val us = unix_micros(col("ts").cast(
          org.apache.spark.sql.types.TimestampType))
        val cols = df.columns.map {
          case "ts" => (us * lit(1000L)).as("ts_ns")
          case c => col(c)
        } :+ timestamp_micros(us).as("ts")
        df.select(scala.collection.immutable.ArraySeq.unsafeWrapArray(cols): _*)
      }
    } else df
  }
}
