package graft

import org.apache.spark.sql.SparkSession

/** One place for session config so Verify/Bench/tests agree.
  * local[N] testing stands in for a multi-executor cluster; shuffle
  * partitions track core count, AQE handles skew/coalescing at scale.
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // events.ts is TIMESTAMP(NANOS) parquet — read as bigint nanos
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // managed tables (bucketed layouts) land in tmp, not the repo
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse")
      // sorted-bucketed scans report their sort order, eliminating
      // both SMJ sorts of a co-located join. Spark gates this behind
      // a legacy flag because it requires ONE file per bucket —
      // which ScaleOps.writeBucketed's bucket-aligned repartition
      // guarantees (multi-file buckets silently fall back to sorting,
      // so the flag is safe for any other table)
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")

  def get(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")): SparkSession = {
    val s = builder(cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
