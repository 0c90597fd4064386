package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-slope harness data: replicate a testdata dir by an integer
  * factor with JOIN-CONSISTENT key offsets, so the same query suite
  * can be measured at two scale factors in one bench run and the
  * wall-clock ratio (the measured scaling slope) lands in the
  * artifact next to the absolute numbers.
  *
  * Each key domain gets one stride = max(key over every referencing
  * column) + 1; copy i adds i·stride to every column in the domain.
  * Foreign keys therefore keep resolving within their copy (orders ⋈
  * lineitem, customer ⋈ orders, events.user_id ⋈ c_custkey), the key
  * spaces never collide across copies, and fixed dims (region,
  * nation) stay fixed — the same shape a larger driver-generated SF
  * would have. Text/vector payloads repeat verbatim, which for the
  * dedup/ANN pipelines is a realistic near-dup-heavy workload, and
  * every skew cap (maxBucket, maxDf) is thereby exercised harder at
  * the top SF, not softer.
  *
  * The replica builds once into tmp (sentinel-guarded) and is reused
  * by later runs; build time is reported separately so measured walls
  * stay clean.
  */
object BenchSlope {

  /** key domains: stride is computed over every (table, column) in
    * the domain, and every one of those columns gets the offset */
  private val domains: Seq[Seq[(String, String)]] = Seq(
    Seq("orders" -> "o_orderkey", "lineitem" -> "l_orderkey"),
    Seq("customer" -> "c_custkey", "orders" -> "o_custkey",
        "events" -> "user_id"),
    Seq("supplier" -> "s_suppkey", "lineitem" -> "l_suppkey"),
    Seq("part" -> "p_partkey", "lineitem" -> "l_partkey"),
    Seq("events" -> "event_id"),
    Seq("documents" -> "doc_id"),
    Seq("embeddings" -> "vec_id"))

  private val fixedDims = Set("region", "nation")

  def replicaDir(sfDir: String, factor: Int): String = {
    val base = new java.io.File(sfDir).getName
    s"${System.getProperty("java.io.tmpdir")}/graft-slope/${base}-x$factor"
  }

  /** Build (or reuse) the factor-× replica. Returns (dir, buildSec —
    * 0.0 when the sentinel said it was already there). */
  def ensure(spark: SparkSession, sfDir: String, factor: Int): (String, Double) = {
    require(factor >= 2, s"slope factor must be >= 2, got $factor")
    val out = replicaDir(sfDir, factor)
    val sentinel = new java.io.File(s"$out/_GRAFT_SLOPE_OK")
    if (sentinel.exists()) return (out, 0.0)
    val t0 = System.nanoTime()
    // raw reads on purpose: the replica must be byte-shape-identical
    // to the source layout (events.ts stays raw nanos), so Tables'
    // derivations apply to it unchanged
    def raw(name: String): DataFrame = spark.read.parquet(s"$sfDir/$name.parquet")
    val stride: Map[(String, String), Long] = domains.flatMap { domain =>
      val s = domain.map { case (t, c) =>
        val r = raw(t).agg(max(col(c))).head()
        if (r.isNullAt(0)) 0L else r.getLong(0) // empty/all-null → 0
      }.max + 1L
      domain.map(tc => tc -> s)
    }.toMap
    Tables.names.foreach { t =>
      val src = raw(t)
      val rep =
        if (fixedDims(t)) src
        else (0 until factor).map { i =>
          stride.collect { case ((`t`, c), s) => (c, s) }
            .foldLeft(src) { case (df, (c, s)) =>
              df.withColumn(c, col(c) + lit(i * s)) }
        }.reduce(_ unionByName _)
      rep.write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    sentinel.getParentFile.mkdirs()
    java.nio.file.Files.write(sentinel.toPath, Array.empty[Byte])
    (out, (System.nanoTime() - t0) / 1e9)
  }
}
