package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-strategy operators: the shuffle/skew machinery a 100 TB run
  * needs. None of these change results — they change plans.
  *
  * AQE's skew-join splitting handles sort-merge skew automatically;
  * saltedJoin is for the cases AQE can't fix (broadcast-ineligible
  * dimension with a hot key under a shuffled hash join, or
  * aggregations over a hot group).
  */
object ScaleOps {

  /** Skew-safe equi-join: replicate each right-side row `salt` times
    * and scatter left-side hot keys across the replicas, so one hot
    * key spreads over `salt` reducers instead of melting one.
    *
    * Use when the right side is small-ish but over the broadcast
    * threshold and the left key distribution is heavy-tailed.
    *
    * `saltSource` must be a STABLE left-side column (a record id).
    * Deriving the salt from monotonically_increasing_id() would be
    * partition-layout dependent: a task retry or upstream
    * repartition re-salts rows differently, violating deterministic-
    * under-recompute even when the final result collapses the salt.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int,
                 saltSource: Column): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(salt)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Pre-partition both sides identically so a *sequence* of joins /
    * aggregations on the same key reuses one exchange instead of
    * shuffling per operator — the poor man's bucketing when you can't
    * write bucketed tables.
    */
  def coPartition(dfs: Seq[DataFrame], key: String, partitions: Int): Seq[DataFrame] =
    dfs.map(_.repartition(partitions, col(key)))

  /** Salted two-level aggregation for hot groups: partial-aggregate
    * on (key, salt), then final-aggregate on key. Spark's partial
    * HashAggregate usually makes this unnecessary; it matters when
    * the partial agg state is large (e.g. collect-like buffers).
    * `saltSource`: stable id column — see [[saltedJoin]] on why not
    * monotonically_increasing_id().
    */
  def saltedAgg(df: DataFrame, key: String, salt: Int, saltSource: Column,
                partial: Seq[Column], finalAgg: Seq[Column]): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(saltSource), lit(salt)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(finalAgg.head, finalAgg.tail: _*)

  /** Sketch-based distinct counting — the only viable distinct at
    * 100 TB (exact countDistinct shuffles every key). rsd = relative
    * standard deviation (HyperLogLog++).
    */
  def approxDistinct(df: DataFrame, groupKeys: Seq[Column], target: Column,
                     rsd: Double = 0.02): DataFrame =
    df.groupBy(groupKeys: _*)
      .agg(approx_count_distinct(target, rsd).as("approx_distinct"))

  /** Layout-optimized write: range-partition on the sort prefix, sort
    * within partitions, write parquet. Parquet row-group min/max
    * statistics then let downstream scans skip row groups on the sort
    * columns — poor man's Z-ordering, and the single biggest lever
    * for selective queries over a 100 TB lake.
    */
  def writeSorted(df: DataFrame, path: String, sortCols: Seq[String],
                  partitions: Int, codec: String = "zstd"): Unit =
    df.repartitionByRange(partitions, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").option("compression", codec).parquet(path)

  /** Bucketed table write — the real co-located-join lever (the
    * durable form of [[coPartition]]): rows hash into `buckets` files
    * per partition keyed on `key`, recorded in the catalog, so EVERY
    * later join/aggregation on that key skips its exchange — at
    * 100 TB the difference between re-shuffling the lake per query
    * and never shuffling it again. Optional sortBy adds in-bucket
    * order for sort-merge joins without a sort step. Both sides of a
    * co-located join must use the same bucket count. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    sortCols: Seq[String] = Nil): Unit = {
    val s = df.sparkSession
    // a session with an ephemeral in-memory catalog can find the
    // managed location on disk without the table in the catalog (a
    // previous JVM wrote it) — saveAsTable then refuses with
    // LOCATION_ALREADY_EXISTS. Drop the entry AND clear the stale
    // location so the write is idempotent across sessions.
    s.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    // bucket-align the shuffle: repartition(buckets, key) uses the
    // same pmod(murmur3, n) placement as the bucket-id expression, so
    // each write task holds EXACTLY one bucket → one file per bucket,
    // not numShufflePartitions × buckets small files. At 100 TB the
    // same alignment holds with thousands of buckets; without it a
    // 2000-partition × 4096-bucket write is 8M files.
    val aligned = df.repartition(buckets, col(key))
    val w = aligned.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Global prefix sum WITHOUT a single-partition window (the
    * q_batch_assign discipline applied to values instead of row
    * numbers): percentile cuts bucket the order column, per-bucket
    * sums collect (#partitions rows on the driver), bucket offsets
    * add to an in-bucket running sum. Returns the frame + `cumCol`
    * (INCLUSIVE running total of `valueCol` in `orderCol` order).
    * `orderCol` must be UNIQUE per row — under ties the in-bucket
    * running sum attributes tied rows in nondeterministic order (use
    * a composed unique key, the convention everywhere in this repo). */
  def prefixSumRanged(df: DataFrame, orderCol: Column, valueCol: Column,
                      cumCol: String, partitions: Int = 0): DataFrame = {
    val n =
      if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val qs = (1 until n).map(_.toDouble / n)
    val cutRow = df.select(
      percentile_approx(orderCol, typedLit(qs), lit(10000)).as("c")).head()
    val cuts: Seq[Any] =
      if (cutRow.isNullAt(0)) Seq.empty else cutRow.getSeq[Any](0).distinct
    def bucketOf(c: Column): Column =
      cuts.foldLeft(lit(0))((acc, cut) => acc + when(c > lit(cut), 1).otherwise(0))
    val bucketed = df.withColumn("_bk", bucketOf(orderCol))
    val sums = bucketed.groupBy(col("_bk"))
      .agg(sum(valueCol).as("s")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    var acc = 0L
    val offsets: Map[Int, Long] = (0 to cuts.size).map { bk =>
      val o = bk -> acc; acc += sums.getOrElse(bk, 0L); o
    }.toMap
    val w = Window.partitionBy(col("_bk")).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bucketed
      .withColumn(cumCol,
        sum(valueCol).over(w) +
          coalesce(element_at(typedLit(offsets), col("_bk")), lit(0L)))
      .drop("_bk")
  }

  /** Global 1-based rank WITHOUT a single-partition window — the
    * [[prefixSumRanged]] discipline applied to row numbering with a
    * deterministic tie-break: percentile cuts over `orderCol` bucket
    * the frame, per-bucket counts collect (#buckets rows on the
    * driver), and an in-bucket row_number over (`orderCol`,
    * `tieCol`) adds the bucket offset. Ties on a cut value all land
    * in ONE bucket (strict `>` bucketing), so the (orderCol, tieCol)
    * total order is respected globally as long as (orderCol, tieCol)
    * is unique per row — the same uniqueness convention as
    * prefixSumRanged, here satisfied by passing a row-unique tieCol.
    * Rank semantics = ROW_NUMBER() OVER (ORDER BY orderCol, tieCol):
    * integer-exact, oracle-safe. */
  def globalRank(df: DataFrame, orderCol: Column, tieCol: Column,
                 rankCol: String, partitions: Int = 0): DataFrame = {
    val n =
      if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val qs = (1 until n).map(_.toDouble / n)
    val cutRow = df.select(
      percentile_approx(orderCol, typedLit(qs), lit(10000)).as("c")).head()
    val cuts: Seq[Any] =
      if (cutRow.isNullAt(0)) Seq.empty else cutRow.getSeq[Any](0).distinct
    def bucketOf(c: Column): Column =
      cuts.foldLeft(lit(0))((acc, cut) => acc + when(c > lit(cut), 1).otherwise(0))
    val bucketed = df.withColumn("_bk", bucketOf(orderCol))
    val counts = bucketed.groupBy(col("_bk"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    var acc = 0L
    val offsets: Map[Int, Long] = (0 to cuts.size).map { bk =>
      val o = bk -> acc; acc += counts.getOrElse(bk, 0L); o
    }.toMap
    val w = Window.partitionBy(col("_bk")).orderBy(orderCol, tieCol)
    bucketed
      .withColumn(rankCol,
        row_number().over(w).cast("long") +
          coalesce(element_at(typedLit(offsets), col("_bk")), lit(0L)))
      .drop("_bk")
  }

  /** Per-GROUP 1-based rank + group size WITHOUT a window keyed
    * solely on the group column — the [[globalRank]] discipline for
    * DECLARED low-cardinality group keys (a source/domain/lang column
    * with dozens of values). A window partitioned only on such a key
    * is ≤ #groups tasks each sort-ranking a 1/#groups corpus slice —
    * 5 TB in ONE task's sort at 100 TB / 20 sources, the keyed cousin
    * of the single-partition window PlanSpec bans. Here percentile
    * cuts over `orderCol` sub-bucket EVERY group the same way;
    * per-(group, bucket) counts collect (#groups × #buckets rows —
    * bounded because the caller declares the key low-cardinality);
    * driver-side per-group prefix sums give bucket offsets; rank =
    * offset + row_number over the (group, bucket)-keyed window — so
    * each group's sort spreads over #buckets tasks — and the group
    * total rides the same collected map as `cntCol`.
    *
    * Null-group rows pass through with null rank/size (segregated
    * before the driver collect — never a null map key). Requirements:
    * (groupCol, orderCol, tieCol) unique per row — pass a row-unique
    * tieCol, the prefixSumRanged convention. Rank semantics =
    * ROW_NUMBER() OVER (PARTITION BY group ORDER BY orderCol, tieCol):
    * integer-exact, oracle-safe (ties on a cut value all land in one
    * bucket via strict `>` bucketing, so the in-group total order is
    * respected globally).
    *
    * The input is evaluated TWICE: once projected to (group, order)
    * and checkpointed for the two stats passes, once for the output
    * plan — safe to hand an SF-scaled frame directly (the stats scan
    * is narrow); checkpoint bounded aggregate inputs anyway so the
    * output evaluation doesn't recompute an expensive upstream. */
  def groupedRankRanged(df: DataFrame, groupCol: Column, orderCol: Column,
                        tieCol: Column, rankCol: String, cntCol: String,
                        partitions: Int = 0): DataFrame = {
    // null groups get null rank/size — the STATS passes filter them
    // out so a null key never reaches the driver-side offset/total
    // maps (a null key embedded via typedLit into a Catalyst map
    // literal fails at plan time); in the output plan they ride the
    // same single scan and null out naturally: element_at with a null
    // map key is NULL, so rank = row_number + NULL = NULL (a
    // union-of-two-filters output would scan an SF-scaled source
    // twice)
    val dfNn = df.filter(groupCol.isNotNull)
    val n =
      if (partitions > 0) partitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val qs = (1 until n).map(_.toDouble / n)
    val g = groupCol.cast("string")
    // the percentile cuts and the (group, bucket) counts are TWO
    // driver-side stats passes — derive both from one checkpointed
    // (group, order) projection so an SF-scaled input is scanned once
    // (narrow) for stats + once for the output plan, never three
    // times (q_batch_by_key read its corpus 3× before this)
    val stats = dfNn.select(g.as("_g"), orderCol.as("_o")).localCheckpoint()
    val cutRow = stats.select(
      percentile_approx(col("_o"), typedLit(qs), lit(10000)).as("c")).head()
    val cuts: Seq[Any] =
      if (cutRow == null || cutRow.isNullAt(0)) Seq.empty
      else cutRow.getSeq[Any](0).distinct
    def bucketOf(c: Column): Column =
      cuts.foldLeft(lit(0))((acc, cut) => acc + when(c > lit(cut), 1).otherwise(0))
    val bucketed = df.withColumn("_bk", bucketOf(orderCol))
    val counted = stats.withColumn("_bk", bucketOf(col("_o")))
      .groupBy(col("_g"), col("_bk"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // loud guard: the driver map is bounded ONLY by the declared
    // low cardinality of the group key — a high-card key here is a
    // misuse (use globalRank / a keyed window instead)
    require(counted.length <= 100000,
      s"groupedRankRanged: ${counted.length} (group, bucket) cells — " +
        "group key is not low-cardinality; use a keyed window instead")
    val offsets: Map[String, Map[Int, Long]] =
      counted.groupBy(_._1).map { case (grp, cells) =>
        var acc = 0L
        grp -> cells.sortBy(_._2).map { case (_, bk, c) =>
          val o = bk -> acc; acc += c; o
        }.toMap
      }
    val totals: Map[String, Long] =
      counted.groupBy(_._1).map { case (grp, cells) => grp -> cells.map(_._3).sum }
    val w = Window.partitionBy(g, col("_bk")).orderBy(orderCol, tieCol)
    bucketed
      .withColumn(rankCol,
        row_number().over(w).cast("long") +
          element_at(element_at(typedLit(offsets), g), col("_bk")))
      .withColumn(cntCol, element_at(typedLit(totals), g))
      .drop("_bk")
  }

  /** Systematic (low-variance) weighted resampling — the resample
    * step of DSIR-style data selection: n evenly-spaced points over
    * the cumulative weight axis; each document receives one copy per
    * point falling in its weight interval (multiplicity ≥ 0, the
    * with-replacement semantics of systematic resampling, entirely
    * deterministic). Weights quantize to integer `unit`s first, so
    * the cumulative axis, the sample points p_k = ⌊(2k+1)·W / (2n)⌋,
    * and the per-doc copy count
    * g(cum) − g(cum − w), g(x) = ⌊(2n·x + W − 1) / (2W)⌋
    * are pure integer arithmetic — engine-exact, no RNG, replayable.
    *
    * Scale: the only non-map work is [[prefixSumRanged]] (bounded
    * driver collect, no global window). int64 bounds: 2n·W must stay
    * under 2^63 — at 1e10 docs × 1e6 units, resample per shard or
    * coarsen `unit`.
    */
  def systematicResample(df: DataFrame, orderCol: Column, weightCol: Column,
                         nTarget: Int, unit: Long = 1000000L): DataFrame = {
    // the resampler needs FOUR actions over its input (percentile
    // cuts, bucket sums, total, the consumer's own) — localCheckpoint
    // materializes the quantized (order, weight) projection ONCE so
    // an expensive upstream lineage (e.g. the DSIR weight join) never
    // re-executes per action. One-shot checkpoint, no loop — the CC
    // stats-squaring trap does not apply; blocks are context-cleaned
    // when the plan is dropped.
    val wq = df.withColumn("__wq",
      round(weightCol * lit(unit.toDouble)).cast("long"))
      .localCheckpoint()
    val cum = prefixSumRanged(wq, orderCol, col("__wq"), "__cum")
    val totalRow = cum.agg(sum(col("__wq"))).head()
    val total = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
    // an all-zero or EMPTY weight axis has no interval for any sample
    // point — refuse loudly instead of DIV-by-zero NULL copies
    require(total > 0,
      s"systematicResample needs positive total weight, got $total")
    // g(x) inlined twice on the materialized cum columns (DIV keeps
    // the arithmetic integral; all operands non-negative, so Spark's
    // truncating DIV == the oracle's floor division)
    cum
      .withColumn("__gc",
        expr(s"(${2L * nTarget} * __cum + ${total} - 1) DIV ${2L * total}"))
      .withColumn("__gp",
        expr(s"(${2L * nTarget} * (__cum - __wq) + ${total} - 1) DIV ${2L * total}"))
      .withColumn("copies", (col("__gc") - col("__gp")).cast("bigint"))
      .drop("__gc", "__gp")
  }

  /** Deterministic block sample without a full scan shuffle: hash-mod
    * on a stable id (the probabilistic sampler generalized to any
    * fraction numerator/denominator).
    */
  def hashSample(df: DataFrame, idCol: Column, keepNumerator: Int,
                 denominator: Int): DataFrame =
    df.filter(pmod(xxhash64(idCol), lit(denominator)) < lit(keepNumerator))

  /** Deterministic shard id in [0, nShards): seeded content hash mod
    * the shard count. Derives ONLY from a stable id, so the layout is
    * replay/repartition-stable — and nShards is a PARAMETER: the
    * per-shard work downstream (window sort, pack fill, file write)
    * fans out to nShards tasks, so at 100 TB it must be ≥4096, never
    * a constant baked into the key (a 16-way key caps the heaviest
    * stage at 16 tasks ≈ 6 TB sorts each). xxhash64 kernel — the
    * production path.
    */
  def shardId(id: Column, nShards: Int, seed: String): Column =
    pmod(xxhash64(lit(seed), id.cast("string")), lit(nShards.toLong)).cast("int")

  /** md5-portable twin of [[shardId]] for oracle-checked queries —
    * bit-identical in DuckDB as
    * `('0x' || substr(md5(seed || ':' || id), 1, 8))::BIGINT % nShards`.
    */
  def shardIdPortable(id: Column, nShards: Int, seed: String): Column =
    pmod(conv(substring(md5(concat(lit(seed + ":"), id.cast("string"))), 1, 8), 16, 10)
      .cast("long"), lit(nShards.toLong)).cast("int")

  /** Deterministic global shuffle for training-data order: shard and
    * within-shard position derive only from the seeded content hash of
    * a stable id, so the layout is identical however rows arrive
    * (repartition/retry stable), and every shard sorts and writes
    * independently — a partitioned window over nShards tasks, never a
    * global sort. Adds (shard, pos) to the input columns.
    */
  def shuffleShard(df: DataFrame, idCol: String, nShards: Int, seed: String,
                   portable: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val id = col(idCol)
    // the within-shard order key: md5 hex for the oracle-portable
    // path; zero-padded hex of xxhash64 for the production path (the
    // padding makes string order = unsigned numeric order)
    val h = if (portable) md5(concat(lit(seed + ":"), id.cast("string")))
            else lpad(hex(xxhash64(lit(seed), id.cast("string"))), 16, "0")
    val shard = if (portable) shardIdPortable(id, nShards, seed)
                else shardId(id, nShards, seed)
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), id)
    df.withColumn("__h", h)
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w))
      .drop("__h")
  }

  /** Sequence packing for pretraining: greedy contiguous fill of
    * maxLen-token packs per hash shard — pack id = tokens-before DIV
    * maxLen over the deterministic within-shard id order. Shards pack
    * independently (no global state), so the operator is
    * embarrassingly parallel at any scale — parallelism = nShards,
    * a parameter, not a baked-in constant. Boundary-straddling docs
    * belong to the pack they start in (the consumer splits them).
    * Adds (shard, pack_id) to the input columns.
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String, maxLen: Int,
                    nShards: Int, seed: String, portable: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val id = col(idCol)
    val shard = if (portable) shardIdPortable(id, nShards, seed)
                else shardId(id, nShards, seed)
    val w = Window.partitionBy(col("shard")).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("shard", shard)
      .withColumn("__cum", sum(col(tokensCol)).over(w))
      // integral DIV — double division loses exactness once shard
      // token prefixes pass 2^53
      .withColumn("pack_id", expr(s"(__cum - $tokensCol) DIV $maxLen"))
      .drop("__cum")
  }

  /** Bucketized range join — interval enrichment (value → tier,
    * IP → geo, time → maintenance-window) WITHOUT the
    * BroadcastNestedLoopJoin a naive `BETWEEN` join plans: each
    * interval explodes to the `chunk`-sized buckets it covers
    * (intervals are short relative to chunk by design — pick chunk ≈
    * the p99 interval width), the fact maps to its single bucket, and
    * the match becomes an EQUI-join on the bucket id plus a residual
    * bounds filter. At 100 TB a nested-loop against even a 10k-row
    * interval table is fact×dim row comparisons; this is one shuffle
    * (or a broadcast if the exploded dim is tiny) and O(fact)
    * comparisons. PlanSpec pins the absence of any nested-loop
    * operator. */
  def rangeJoinBucketized(fact: DataFrame, dim: DataFrame, factKey: Column,
                          loCol: String, hiCol: String,
                          chunk: Long): DataFrame = {
    require(chunk > 0, "chunk must be positive")
    // integral DIV on both sides (double division drifts past 2^53);
    // non-negative key domain assumed (truncating DIV = floor there)
    val dimExp = dim
      .withColumn("__chunk", explode(sequence(
        expr(s"$loCol DIV $chunk"), expr(s"$hiCol DIV $chunk"))))
    fact
      .withColumn("__k", factKey.cast("long"))
      .withColumn("__chunk", expr(s"__k DIV $chunk"))
      .join(dimExp, Seq("__chunk"))
      .filter(col("__k") >= col(loCol) && col("__k") <= col(hiCol))
      .drop("__chunk", "__k")
  }

  /** Morton/Z-order bit interleave of two `bits`-bit non-negative
    * ints (Morton 1966 — the multi-dimensional data-LAYOUT primitive
    * behind file skipping on two predicate columns at once, the
    * Delta/Iceberg OPTIMIZE ZORDER idea). Pure integer Column
    * arithmetic: 2·bits shift/mask terms folded by codegen into one
    * projection — no UDF, no shuffle. Requires 2·bits ≤ 62. */
  def mortonInterleave(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Per-file min/max statistics of a Z-ordered layout: rows are
    * assigned to files by their Morton code's high bits (one file =
    * one aligned 2^(fileShift/2) × 2^(fileShift/2) tile of the
    * (x, y) grid when fileShift is even), and each file carries the
    * column min/max a lake's footer stats would — exactly what a
    * reader consults to SKIP files for a box predicate. `hit` marks
    * the files a [x1,x2]×[y1,y2] box query would actually read.
    * One shuffle, ≤ 2^(2·bits − fileShift) groups; everything else
    * is map-side integer math. At 100 TB the difference between this
    * layout and a single-column sort is the read amplification on
    * the second predicate column — the spec pins it (1 file hit
    * z-ordered vs 2^(bits/?) under an x-only sort for an aligned
    * tile box). */
  def zorderFileStats(df: DataFrame, x: Column, y: Column, bits: Int,
                      fileShift: Int,
                      x1: Long, x2: Long, y1: Long, y2: Long): DataFrame = {
    val z = mortonInterleave(x, y, bits)
    df.select(x.cast("long").as("__x"), y.cast("long").as("__y"),
        z.cast("long").as("__z"))
      .groupBy(expr(s"__z DIV ${1L << fileShift}").as("file_id"))
      .agg(count(lit(1)).as("rows"),
        min(col("__x")).as("min_x"), max(col("__x")).as("max_x"),
        min(col("__y")).as("min_y"), max(col("__y")).as("max_y"))
      .withColumn("hit",
        col("max_x") >= x1 && col("min_x") <= x2 &&
          col("max_y") >= y1 && col("min_y") <= y2)
  }
}
