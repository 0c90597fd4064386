package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Oracle-parity helpers.
  *
  * The driver hash-compares Spark parquet output against DuckDB. Two
  * rules keep doubles bit-identical across engines:
  *  1. per-row arithmetic stays in IEEE double (identical in both),
  *  2. any SUM over rows goes through DECIMAL(28,8) so the result is
  *     independent of partitioning/accumulation order, then casts back
  *     to double.
  * Timestamps: events.ts is nanosecond parquet; Spark truncates to
  * micros. We only ever emit second-or-coarser buckets as BIGINT.
  */
object QUtil {
  /** order-independent exact sum of a double expression */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(28, 8))).cast("double")

  /** epoch minute bucket as BIGINT from bigint nanos (integral math;
    * DuckDB twin: epoch_ns(ts) // 60000000000)
    */
  def nsMinute(tsNs: Column): Column = expr(s"${tsNs.toString} DIV 60000000000").cast("bigint")

  /** epoch hour bucket as BIGINT from bigint nanos */
  def nsHour(tsNs: Column): Column = expr(s"${tsNs.toString} DIV 3600000000000").cast("bigint")
}
