package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Collector-processor analogs, re-expressed as lazy DataFrame
  * transforms so Catalyst can push/prune/fuse them.
  *
  * Reference behavior (not code) from /root/reference:
  *  - processor/batchprocessor/batch_processor.go:42-43,188 (size +
  *    timeout batching triggers, max-size splitting)
  *  - processor/memorylimiterprocessor/memorylimiter.go:252,270
  *    (checkMemLimits → refuse/drop above soft/hard limits)
  *  - connector/forwardconnector/forward.go + service fanout consumer
  *    (route/fan pipelines)
  *  - pdata/pcommon attribute-map mutations (upsert/rename/delete)
  *  - pdata/plog/severity_number.go:23 (severity normalization scale)
  */
object Processors {

  /** Filter processor: keep rows matching `include`, then drop rows
    * matching `exclude` — the include/exclude pair the collector's
    * filter semantics use. Plans as a single scan-adjacent Filter, so
    * parquet predicate pushdown applies.
    */
  def filter(df: DataFrame, include: Column, exclude: Column = lit(false)): DataFrame =
    // NULL exclude (missing attribute) means "does not match the
    // exclude rule" — keep the row. Bare !exclude would three-value
    // the row away.
    df.filter(include && !coalesce(exclude, lit(false)))

  // ---- attributes processor actions (pcommon.Map edit model) ----
  sealed trait AttrAction
  /** insert-or-update a column (pcommon.Map.PutStr/PutInt analog) */
  final case class Upsert(name: String, value: Column) extends AttrAction
  final case class Rename(from: String, to: String) extends AttrAction
  final case class Delete(name: String) extends AttrAction
  /** hash action of the attributes processor (value → stable digest) */
  final case class HashAttr(name: String) extends AttrAction
  /** extract action: regex capture groups become new attributes */
  final case class Extract(from: String, regex: String, groups: Seq[(String, Int)]) extends AttrAction

  def attributes(df: DataFrame, actions: Seq[AttrAction]): DataFrame =
    actions.foldLeft(df) {
      case (d, Upsert(n, v))  => d.withColumn(n, v)
      case (d, Rename(f, t))  => d.withColumnRenamed(f, t)
      case (d, Delete(n))     => d.drop(n)
      case (d, HashAttr(n))   => d.withColumn(n, md5(col(n).cast("string")))
      case (d, Extract(f, re, gs)) =>
        gs.foldLeft(d) { case (dd, (name, idx)) =>
          dd.withColumn(name, regexp_extract(col(f), re, idx))
        }
    }

  // ---- pcommon.Map operations on MapType attribute columns ----
  // (the OtelModel keeps attributes as map<string,string>, matching
  // the reference's pdata/pcommon/map.go mutation surface)

  /** PutStr/upsert into a map column */
  def mapPut(attrs: Column, key: String, value: Column): Column =
    map_concat(map_filter(attrs, (k, _) => k =!= key), map(lit(key), value))

  /** Remove keys from a map column */
  def mapDelete(attrs: Column, keys: Seq[String]): Column =
    map_filter(attrs, (k, _) => !k.isin(keys.map(x => x: Any): _*))

  /** KeepKeys: retain only the allow-listed keys */
  def mapKeepKeys(attrs: Column, keys: Seq[String]): Column =
    map_filter(attrs, (k, _) => k.isin(keys.map(x => x: Any): _*))

  /** Truncate every value to n chars (attribute size limiting) */
  def mapTruncateValues(attrs: Column, n: Int): Column =
    transform_values(attrs, (_, v) => substring(v, 1, n))

  /** Redaction processor analog (reference behavior: the redaction
    * processor masks attribute VALUES matching blocked patterns;
    * allow-listing keys is [[mapKeepKeys]]): every value matching the
    * pattern becomes `mask`, everything else passes through. */
  def mapRedact(attrs: Column, blockedValueRe: String,
                mask: String = "****"): Column =
    transform_values(attrs, (_, v) =>
      when(v.rlike(blockedValueRe), lit(mask)).otherwise(v))

  /** how many values [[mapRedact]] would touch — the processor's
    * redaction summary attribute */
  def mapRedactCount(attrs: Column, blockedValueRe: String): Column =
    // qualified: this object's DataFrame `filter` shadows the HOF
    size(org.apache.spark.sql.functions.filter(
      map_values(attrs), (v: Column) => v.rlike(blockedValueRe)))

  /** group-by-attributes processor: regroup records under the given
    * attribute keys and aggregate the payload. One shuffle on the keys.
    */
  def groupByAttrs(df: DataFrame, keys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)

  /** Batch processor: assign deterministic size-based batch ids.
    *
    * `globalOrder=true` delegates to [[assignBatchesRanged]] — globally
    * ordered ids with no single-partition sort. `globalOrder=false`
    * uses per-partition ids (monotonically_increasing_id encodes the
    * partition id in the high bits): batches form independently per
    * partition like one batcher per collector shard, no shuffle at all.
    */
  def assignBatches(df: DataFrame, orderCol: Column, batchSize: Int,
                    globalOrder: Boolean = true): DataFrame =
    if (globalOrder) assignBatchesRanged(df, orderCol, batchSize)
    else df.withColumn("batch_id",
      floor(monotonically_increasing_id() / batchSize).cast("bigint"))

  /** Globally-ordered batch ids WITHOUT a global sort, in three
    * bounded steps:
    *
    *  1. collect ~`partitions` split points of the (numeric) order key
    *     (approx-percentile sketch — one tiny driver fetch);
    *  2. bucket rows by those LITERAL split points — the bucket id is
    *     a pure function of the key value, so every later pass agrees
    *     on it by construction (a physical spark_partition_id is NOT
    *     stable across jobs and must never be cross-referenced);
    *  3. count rows per bucket (second tiny driver fetch), prefix-sum
    *     into offsets, then id = offset + per-bucket row_number.
    *
    * Identical ids to `row_number() OVER (ORDER BY key)` for a unique
    * key, but each bucket sorts only its own range — the
    * single-partition WindowExec (one executor sorting the whole fact
    * table at 100 TB) never appears. Skewed split points only affect
    * balance, never correctness.
    *
    * The input plan is evaluated three times (split points, counts,
    * final) — like every Spark recompute path it must be
    * deterministic; persist expensive upstream plans before calling.
    */
  def assignBatchesRanged(df: DataFrame, orderCol: Column, batchSize: Int,
                          partitions: Int = 0): DataFrame = {
    val n =
      if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val qs = (1 until n).map(_.toDouble / n)
    val cutRow = df.select(percentile_approx(orderCol, typedLit(qs), lit(10000)).as("c")).head()
    val cuts: Seq[Any] =
      if (cutRow.isNullAt(0)) Seq.empty else cutRow.getSeq[Any](0).distinct
    def bucketOf(c: Column): Column =
      cuts.foldLeft(lit(0))((acc, cut) => acc + when(c > lit(cut), 1).otherwise(0))
    val bucketed = df.withColumn("_bk", bucketOf(orderCol))
    val counts = bucketed.groupBy(col("_bk")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    var acc = 0L
    val offsets: Map[Int, Long] = (0 to cuts.size).map { bk =>
      val o = bk -> acc; acc += counts.getOrElse(bk, 0L); o
    }.toMap
    val w = Window.partitionBy(col("_bk")).orderBy(orderCol)
    bucketed
      .withColumn("batch_id",
        floor((row_number().over(w).cast("long") - 1L +
          coalesce(element_at(typedLit(offsets), col("_bk")), lit(0L))) / batchSize)
          .cast("bigint"))
      .drop("_bk")
  }

  /** Per-metadata-key batching: the reference batchprocessor shards
    * one batcher per distinct metadata-key combination
    * (batch_processor.go:50-57, metadataKeys + metadataCardinalityLimit).
    * Batches form independently inside each key group — one shuffle on
    * the keys, each group's window sorts only its own rows. Compose
    * with [[requireMetadataCardinality]] for the limit semantics.
    *
    * CONTRACT: the key combination must be LOW-CARDINALITY (the
    * reference caps it at metadataCardinalityLimit, default 1000) —
    * ranks ride [[ScaleOps.groupedRankRanged]], which collects
    * #keys × #buckets cells to the driver and hard-fails above 100k
    * cells. A high-cardinality key belongs on a keyed window, not on
    * this batcher. `orderCol` must be row-unique within each key
    * group (the rank's tie-breaker).
    */
  def assignBatchesByKey(df: DataFrame, keys: Seq[String], orderCol: Column,
                         batchSize: Int): DataFrame =
    rankedBatchIds(df, keys.map(col), orderCol, batchSize)

  /** batch_id = (per-group ROW_NUMBER − 1) DIV batchSize, with the
    * per-group rank computed by [[ScaleOps.groupedRankRanged]] — a
    * window keyed on the BARE group key is ≤ #groups tasks, each
    * sort-ranking a 1/#groups slice of the corpus (the PlanSpec
    * low-cardinality ban; batcher keys — event_type, metadata combos
    * — are low-card by construction). `orderCol` must be row-unique
    * within each group (the rank's tie-breaker). */
  private def rankedBatchIds(df: DataFrame, groupCols: Seq[Column],
                             orderCol: Column, batchSize: Int): DataFrame = {
    // key = to_json(struct(...)): bijective with the key TUPLE —
    // concat_ws would silently drop NULLs (('a', NULL) and (NULL,
    // 'a') collapse into one group) and a value containing the
    // separator could forge a collision; JSON field names keep each
    // component in its slot, null fields omit distinctly
    val keyed = df.withColumn("_bkey", to_json(struct(
      groupCols.zipWithIndex.map { case (c, i) =>
        c.cast("string").as(s"k$i") }: _*)))
    ScaleOps.groupedRankRanged(keyed, col("_bkey"), orderCol, orderCol,
        "_rk", "_bcnt")
      .withColumn("batch_id", expr(s"(_rk - 1) DIV $batchSize"))
      .drop("_bkey", "_rk", "_bcnt")
  }

  /** Batch timeout in batch mode: the reference batcher flushes on
    * size OR timeout (batch_processor.go:188) — the timeout bounds how
    * stale a batch can get. Replayed over stored data, the timeout
    * dimension is the event-time window: no batch may span more than
    * `maxAge` of event time, and within a window batches still split
    * at `batchSize`. Batch identity = (time window, size shard) — the
    * same batches a timeout-flushing collector would have produced at
    * a steady clock, and deterministic under replay. `tsCol` must be
    * an integral event-time column (e.g. µs) and `maxAge` its units.
    */
  def assignBatchesTimed(df: DataFrame, tsCol: Column, maxAge: Long,
                         orderCol: Column, batchSize: Int): DataFrame = {
    // double division then floor: exact for integral ts below 2^53
    // with window counts far from the half-ulp boundary (true integer
    // quotients are correctly rounded to themselves)
    val windowed = df.withColumn("batch_window", floor(tsCol / maxAge).cast("bigint"))
    val w = Window.partitionBy(col("batch_window")).orderBy(orderCol)
    windowed.withColumn("batch_id",
      floor((row_number().over(w) - 1) / batchSize).cast("bigint"))
  }

  /** [[assignBatchesByKey]] fed by client.Info request metadata (the
    * reference's actual wiring: multiShardBatcher reads the metadata
    * keys out of the propagated context, batch_processor.go:291-308,
    * and refuses above the cardinality limit, :313). The shard
    * identity is the per-key value-list id ([[ClientInfo.metadataId]]
    * — sorted-set semantics via attach-time normalization), with
    * unset ≠ empty preserved. Emits one `meta_<key>` column per key
    * (the "copy it into the outgoing metadata" half) so exporters can
    * deliver per-combination without re-deriving the lookup. */
  def assignBatchesByMetadata(df: DataFrame, metaKeys: Seq[String],
                              orderCol: Column, batchSize: Int,
                              cardinalityLimit: Int = 0): DataFrame = {
    import graft.pipeline.ClientInfo
    val out = metaKeys.foldLeft(df)((d, k) =>
      d.withColumn(s"meta_${k.toLowerCase}", ClientInfo.metadataId(k)))
    val idCols = metaKeys.map(k => col(s"meta_${k.toLowerCase}"))
    if (cardinalityLimit > 0) {
      val n = out.select(idCols: _*).distinct().limit(cardinalityLimit + 1).count()
      require(n <= cardinalityLimit,
        s"too many batcher metadata-value combinations (> $cardinalityLimit)")
    }
    rankedBatchIds(out, idCols, orderCol, batchSize)
  }

  /** metadataCardinalityLimit analog: the reference refuses data once
    * the distinct metadata combinations exceed the limit (it would
    * otherwise leak one batcher per combination). Batch form: count
    * distinct key combinations and fail fast above the limit. */
  def requireMetadataCardinality(df: DataFrame, keys: Seq[String], limit: Int): Unit = {
    // limit+1 bounds the work: the check needs "more than limit?",
    // never the exact global distinct count
    val n = df.select(keys.map(col): _*).distinct().limit(limit + 1).count()
    require(n <= limit,
      s"metadata cardinality exceeds limit $limit for keys ${keys.mkString(",")}")
  }

  /** Memory limiter: bounded admission. The collector refuses data
    * above a soft limit; in batch terms we keep a deterministic
    * bounded prefix (here: earliest `limit` rows by `order`).
    */
  def memoryLimit(df: DataFrame, order: Seq[Column], limit: Int): DataFrame =
    df.orderBy(order: _*).limit(limit)

  /** Full plog severity scale (severity_number.go: 24 levels in six
    * bands of four): 1-4 TRACE, 5-8 DEBUG, 9-12 INFO, 13-16 WARN,
    * 17-20 ERROR, 21-24 FATAL; the 2nd-4th level of each band carries
    * a numeric qualifier (TRACE2..TRACE4 etc.), 0/out-of-range →
    * UNSPECIFIED. Shared band table drives both the Column form and
    * the SQL-oracle twin so they cannot drift. */
  private val severityBands =
    Seq("TRACE", "DEBUG", "INFO", "WARN", "ERROR", "FATAL")

  def severityText(n: Column): Column = {
    val base = severityBands.zipWithIndex.foldLeft(lit("UNSPECIFIED"): Column) {
      case (els, (name, i)) =>
        val lo = i * 4 + 1
        when(n.between(lo, lo + 3),
          concat(lit(name), when(n === lo, lit(""))
            .otherwise((n - lo + 1).cast("int").cast("string")))).otherwise(els)
    }
    base
  }

  /** DuckDB twin generated from the same band table */
  def severityTextSql(nExpr: String): String =
    severityBands.zipWithIndex.map { case (name, i) =>
      val lo = i * 4 + 1
      s"WHEN $nExpr BETWEEN $lo AND ${lo + 3} THEN '$name' || " +
        s"(CASE WHEN $nExpr = $lo THEN '' ELSE CAST($nExpr - $lo + 1 AS VARCHAR) END)"
    }.mkString("CASE ", " ", " ELSE 'UNSPECIFIED' END")

  /** Probabilistic sampler: deterministic, seed-stable, and portable
    * across engines (md5 of the id — first hex digit < 16*pct).
    * Mirrors the collector's hash-seeded sampler semantics: the same
    * record always gets the same verdict.
    */
  def probabilisticSample(df: DataFrame, idCol: Column, hexDigitsKept: Int): DataFrame =
    df.filter(substring(md5(idCol.cast("string")), 1, 1)
      .isin("0123456789abcdef".take(hexDigitsKept).map(_.toString): _*))

  /** Tail sampling: whole-trace decision — keep every record of a
    * trace (here: user) that contains at least one record matching
    * `keepIf`. Left-semi join on the trace key; the decision side is
    * small (distinct keys) so Catalyst/AQE broadcasts it.
    */
  def tailSample(df: DataFrame, traceKey: String, keepIf: Column): DataFrame = {
    val keep = df.filter(keepIf).select(col(traceKey)).distinct()
    df.join(keep, Seq(traceKey), "left_semi")
  }

  /** Routing connector: label each record with the first matching
    * route (order matters, like the collector's routing table).
    */
  def route(df: DataFrame, routes: Seq[(String, Column)], defaultRoute: String): DataFrame = {
    val labeled = routes.foldRight(lit(defaultRoute): Column) {
      case ((name, cond), els) => when(cond, lit(name)).otherwise(els)
    }
    df.withColumn("route", labeled)
  }

  /** Fanout + forward connector: the same source feeds N pipelines
    * whose outputs are merged (unionByName = schema-aligned merge).
    */
  def fanout(df: DataFrame, pipelines: Seq[DataFrame => DataFrame]): DataFrame =
    pipelines.map(p => p(df)).reduce(_ unionByName _)
}
