package graft

/** Writes PLANS.md: formatted physical plans of representative
  * queries with the scale-relevant properties called out — the
  * artifact form of "explain and iterate until it's the plan you
  * want". Run: sbt "runMain graft.Plans [sfDir] [outFile]".
  */
object Plans {
  private val picks: Seq[(String, String)] = Seq(
    "q_filter_pushdown" -> ("Predicates reach the parquet scan " +
      "(PushedFilters) and only needed columns are read (ReadSchema) — " +
      "at 100 TB this is the difference between scanning 4 columns of " +
      "matching row groups and scanning everything."),
    "q1_pricing_summary" -> ("partial_ then final HashAggregate around one " +
      "shuffle (map-side combine), the whole pipeline inside " +
      "WholeStageCodegen spans."),
    "q3_top_orders" -> ("NO broadcast hints at all (even the filtered " +
      "customer is SF-scaled — ~20% of a linearly growing table): " +
      "stats/AQE pick BroadcastHashJoin at this SF on observed size and " +
      "keep the right to fall back at 100×; the top-10 collapses via " +
      "TakeOrderedAndProject — no global sort."),
    "q5_local_supplier" -> ("Star join: only the fixed-cardinality dims " +
      "(nation 25 rows, region 5) carry hints; SF-scaled customer/" +
      "supplier join strategy is AQE's call — broadcast while they fit, " +
      "shuffle when they outgrow the build side."),
    "q17_small_quantity" -> ("Correlated scalar subquery decorrelated as " +
      "one per-partkey aggregate joined BACK on the grouping key: no " +
      "per-group window over the fact, and both branches hash-partition " +
      "on l_partkey so the exchange is computed once and reused."),
    "q13_customer_distribution" -> ("Outer-join fan-out distribution " +
      "keeping the zero bucket: customer LEFT OUTER orders, count " +
      "non-null orderkeys per customer, then the tiny histogram " +
      "aggregate. One o_custkey shuffle; no hint on either SF-scaled " +
      "side — strategy is AQE's."),
    "q20_excess_suppliers" -> ("Nested semi-join chain with a HAVING " +
      "threshold: part filter → LEFT SEMI into lineitem (the fact " +
      "never widens), per-supplier quantity aggregate, threshold, then " +
      "LEFT SEMI into supplier. Semi joins all the way down — no " +
      "row multiplication at any step."),
    "q21_waiting_suppliers" -> ("Multi-correlated EXISTS / NOT EXISTS " +
      "fused into ONE per-order aggregate over a single fact⋈orders " +
      "pass: supplier sets ride as collect_set (bounded by suppliers " +
      "per order) and the late-row count rides alongside, so the plan " +
      "shows exactly one lineitem leaf, one orders leaf, one " +
      "l_orderkey shuffle, and a plain partial+final HashAggregate — " +
      "no countDistinct Expand, no second scan (r5's formulation " +
      "scanned the fact twice; PlanSpec pins the single-leaf shape)."),
    "q22_no_order_customers" -> ("Global scalar subquery + dormancy " +
      "anti join: the one-row average cross-joins in (stats broadcast " +
      "it without a hint), the NOT EXISTS is a LEFT ANTI against the " +
      "date-filtered orders scan — both SF-scaled sides stay " +
      "hint-free."),
    "q15_top_supplier" -> ("Max over an aggregated view with ties: " +
      "both consumers (supplier join; global max) canonicalize to the " +
      "SAME per-supplier aggregate — the shared view carries the " +
      "join-key isNotNull explicitly, so the plan shows ONE lineitem " +
      "leaf and a ReusedExchange on l_suppkey instead of a second " +
      "fact scan."),
    "q_batch_assign" -> ("Globally-ordered batch ids with NO " +
      "single-partition window: literal split points bucket the key, the " +
      "window partitions by bucket."),
    "q_dedup_minhash" -> ("Signature computed once per doc (single " +
      "project over the scan), one shuffle on (band, bucket); pair " +
      "expansion stays inside the bucket — no cartesian anywhere."),
    "q_bm25" -> ("Relevance mining: the query-term filter sits INSIDE " +
      "the map-side explode (no exchange between them, PlanSpec-pinned), " +
      "so the (doc, term) aggregate shuffles only query-term hits — " +
      "proportional to matches, never corpus tokens; N/avgdl ride one " +
      "broadcast one-row aggregate."),
    "q_ann_bruteforce" -> ("The deliberate O(Q·N): BroadcastNestedLoopJoin " +
      "with the 10-query side broadcast — map-side similarity, no " +
      "shuffle of the corpus."),
    "q_dedup_embed" -> ("LSH bucket join generates candidates; exact " +
      "cosine runs after pair-dedup. No BroadcastNestedLoopJoin, no " +
      "CartesianProduct on a corpus×corpus operator."),
    "q_ngram_jaccard" -> ("Posting lists over hashed shingles; the " +
      "exact length filter (min(sz) ≥ t·max(sz)) prunes non-qualifying " +
      "pairs INSIDE the explode stage, before the pair exchange — " +
      "profiled at sf0.1: pair counting is ~7% of the query, so the " +
      "filter is a shuffle-volume guard for heavy-tailed corpora, not " +
      "a local win."),
    "q_ann_ivfpq" -> ("IVF-PQ composition: ONE pass over the corpus " +
      "emits cell id + PQ codes together (two native kernels, codebooks " +
      "ride as codegen reference objects — plan size independent of " +
      "c/ksub); probes broadcast with their ADC tables, so the cell " +
      "join scans ~nprobe/c of an already code-compressed corpus; the " +
      "only windows are per-query top-k. The index build itself runs " +
      "no corpus-wide window (bounded orderBy+limit init, spec-pinned)."),
    "q_dedup_cc" -> ("Connected components (hybrid): at this SF the " +
      "pair graph is under the bounded-edge threshold, so the labels " +
      "come from one bounded collect + driver union-find — the plan " +
      "shows the pair derivation feeding a local relation of labels. " +
      "Above the threshold the distributed min-label loop runs; its " +
      "plan reads from RDD-backed frames (one bounded shuffle-join + " +
      "groupBy-min per round, lineage never compounds in the " +
      "optimizer), which is what survives a dup-heavy 100 TB corpus."),
    "q_bucketed_join" -> ("The durable-layout lever: both fact " +
      "projections land as bucketed+sorted tables on the join key, " +
      "then the sort-merge join reads bucket pairs DIRECTLY — no " +
      "Exchange on either side of the join (PlanSpec pins the " +
      "executed adaptive plan; the only exchange is the final " +
      "groupBy's, a different key). At 100 TB this is write-once, " +
      "join-forever: every later query on the key skips the lake " +
      "reshuffle."),
    "q_line_dedup" -> ("C4-style corpus line dedup: segmentation is " +
      "one map-side transform+explode; the first-occurrence decision " +
      "aggregates 16-byte hashes + an int64 composite key. Text " +
      "crosses the wire only in the verdict join and the per-doc " +
      "reassembly regroup — both co-partition under doc-id bucketing, " +
      "and a stats-only consumer drops the second move entirely."),
    "q_dsir_resample" -> ("Systematic weighted resampling with NO " +
      "global window: the cumulative weight axis is prefixSumRanged " +
      "(percentile-cut buckets, per-bucket driver offsets), the " +
      "quantized weights ride a one-shot localCheckpoint (the " +
      "resampler's four actions would otherwise re-execute the DSIR " +
      "feature join each time — measured 6.0 s → 3.3 s serial), and " +
      "every copy count is integer DIV arithmetic in the projection — " +
      "the plan shows bucketed windows only, nothing single-partition."),
    "q_zorder_layout" -> ("Z-order layout stats: the Morton interleave " +
      "is 32 shift/mask terms constant-folded into ONE codegen'd " +
      "projection on the scan, then a single 256-group hash aggregate " +
      "— at 100 TB the same plan writes the layout whose per-file " +
      "min/max stats let a two-column box predicate skip all but one " +
      "file per aligned tile (ZorderSpec pins 1 vs 16 read " +
      "amplification against an x-only sort)."),
    "q_quality_classifier" -> ("Trained quality filter: the token " +
      "explode+distinct is the only corpus-sized shuffle and carries " +
      "(doc_id, token) pairs — never text (PlanSpec rule); the vocab " +
      "caps at 5000 rows by construction, so its join back is " +
      "broadcast-sized at ANY corpus scale; scoring and the confusion " +
      "rollup are integer aggregates."),
    "q_range_enrich" -> ("Bucketized range join: a naive BETWEEN " +
      "join plans BroadcastNestedLoopJoin (or CartesianProduct with " +
      "broadcast off) — fact×dim comparisons. Here each interval " +
      "explodes to its covered chunks and the match is an EQUI-join " +
      "on the chunk id plus a residual bounds filter: O(fact) " +
      "comparisons, a plan Spark can hash/merge/broadcast like any " +
      "equi-join. ScaleOpsSpec pins both directions (this plan has " +
      "no nested-loop/cartesian; the naive one does)."),
    "q_cluster_topics" -> ("The assignment join's input is the " +
      "AGGREGATED (doc_id, term, doc_tf) frame, never the raw " +
      "exploded token stream: the partial HashAggregate sits below " +
      "the join exchange, so what shuffles is bounded by per-doc " +
      "vocabulary while token INSTANCES collapse map-side " +
      "(PlanSpec pins an aggregate grouped on (doc_id, term) below " +
      "every join side carrying `term`)."),
    "q_knn_graph" -> ("Mutual-kNN from LSH bucket collisions: the " +
      "corpus-vs-itself candidate join is a bucket groupBy with " +
      "capped members — NO broadcast of an SF-scaled side, no " +
      "all-pairs sim matrix (the mechanical PlanSpec broadcast rule " +
      "rejected the brute-force draft). Downstream the mutual join " +
      "and degree census shuffle only (id, id) pairs."),
    "q_cardinality_sketch" -> ("HLL distinct-count at sketch size: the " +
      "token stream collapses MAP-SIDE into per-(source, bucket) rho " +
      "maxima — the partial HashAggregate below the exchange is the " +
      "whole trick, what shuffles is ≤ sources×256 sketch cells, " +
      "never token instances. The union row merges the SAME cells by " +
      "MAX (mergeability is the 100 TB story: shard sketches, merge " +
      "anywhere, no re-scan), and the harmonic sum is integer " +
      "2^(49−rho) terms — exact-oracle-safe, zero libm."),
    "q_heavy_hitters" -> ("Count-min frequency at fixed state: 4 " +
      "hash lanes × 1024 buckets of ADDITIVE counts — the partial " +
      "aggregate combines map-side, so the exchange carries ≤4096 " +
      "cells whatever the corpus size. min-over-lanes answers the " +
      "point query; the exact top-20 join-back exists only to " +
      "measure the one-sided overestimate the sketch guarantees."),
    "q_vocab_drift" -> ("Exact total-variation distance per source " +
      "with the absent-word mass folded ANALYTICALLY (1 − Σ p over " +
      "the source's own words): the join touches only (source, word) " +
      "pairs the source actually contains — never the source × " +
      "global-vocab fan-out a literal Σ over all words would plan. " +
      "The one-row corpus total cross-joins in unhinted (stats " +
      "broadcast it); cross-row double sums ride DECIMAL(28,8)."),
    "q_length_percentiles" -> ("Per-source exact percentiles WITHOUT " +
      "a window keyed solely on the 20-value source column (the r10 " +
      "weak): groupedRankRanged sub-buckets EVERY group by the same " +
      "percentile cuts, collects #groups×#buckets counts, and ranks " +
      "as offset + row_number over (source, bucket) — each group's " +
      "sort spreads over #buckets tasks instead of one 5 TB task at " +
      "100 TB / 20 sources. PlanSpec now mechanically bans WindowExec " +
      "partitioned solely on a declared low-cardinality key."),
    "q_repetition_gopher" -> ("The COMPLETE Gopher repetition block " +
      "as ONE map-side projection per doc: duplicate line/paragraph " +
      "mass via size/length deltas against array_distinct " +
      "(Σ(count−1)·len = total − distinct, no per-line rows), the " +
      "top-{2,3,4}-gram char mass and the duplicate-{5..10}-gram " +
      "occurrence mass via sorted run-length folds — thirteen " +
      "signals and thirteen threshold flags computed where the doc " +
      "is read, so the ONLY exchange is the ≤#sources-row census. " +
      "At 100 TB this is a single corpus scan; nothing text-shaped " +
      "ever shuffles."),
    "q_dedup_fused" -> ("The fused dedup verdict (drop_exact / " +
      "drop_near / cut_spans / keep): three bounded inputs — md5 " +
      "keep-min groups, the hybrid-CC keep rule over LSH-bounded " +
      "pairs, ExactSubstr b-side coverage — join onto a one-row-per-" +
      "doc verdict frame (checkpointed: the per-source census and the " +
      "fused corpus-totals aggregate read it without re-running CC or " +
      "the anchor machinery; the CC and ExactSubstr branches " +
      "themselves build CONCURRENTLY — r18, guide §2.6). Exchanges " +
      "carry hashes, component ids and (doc, pos) counts; document " +
      "text never crosses a shuffle. The report is the q_dedup_impact " +
      "mixture shape over the FUSED rule."),
    "q_novelty_incr" -> ("Incremental novelty WITHOUT re-reading the " +
      "store: the batch half segments once (the shared noveltySegs " +
      "kernel under the explode), reduces to within-batch first " +
      "carriers on the hash key, and the store probe is the ONE " +
      "LeftAnti join against the fingerprint table — shuffle ∝ " +
      "distinct new hashes in the batch, never ∝ store, and the " +
      "store side carries a single 32-hex column (its text is never " +
      "scanned). The rollup join stays doc-sized, the q_novelty " +
      "shape."),
    "q_seqlen_sweep" -> ("The max_seq_len dial as ONE pass: the " +
      "corpus tokenizes once into an 8-byte/doc count frame " +
      "(localCheckpoint), the 6-value grid rides a " +
      "BroadcastNestedLoopJoin over it, and every grid point's " +
      "truncation/packing numbers reduce in the same HashAggregate " +
      "keyed on seq_len — never one scan per length; text leaves " +
      "the plan at the first projection."),
    "q_bm25_sweep" -> ("The (k1, b) retrieval dial WITHOUT one " +
      "corpus pass per grid point: tf/dft/dl/avgdl reduce once (the " +
      "flagship's own bm25Hits frame, checkpointed), the 12-point " +
      "grid is a BroadcastNestedLoopJoin over the bounded hits " +
      "frame, and every point's top-20 ranks inside ONE Window " +
      "keyed on (k1_pct, b_pct) — partitions stay grid-point-sized; " +
      "the overlap census joins against the default point's 20 rows."),
    "q_decontam_sweep" -> ("The contamination-cutoff dial over ONE " +
      "pair pass: the shared-5-gram join (eval postings broadcast, " +
      "the flagship's shape) counts pairs once into a checkpointed " +
      "frame; each cutoff is a filter riding the broadcast grid and " +
      "the three censuses reduce in one aggregate keyed on cutoff."),
    "q_pair_align" -> ("The multimodal alignment census rides ONE " +
      "co-partitioned self-join on the pair id (the vectors cross " +
      "exactly one exchange) into a checkpointed (source, sim) frame " +
      "of one double per pair; the 8-point cutoff grid is a " +
      "BroadcastNestedLoopJoin over that checkpoint — never one " +
      "corpus pass per threshold — and the census is one partial+" +
      "final aggregate keyed (source, t_pct)."),
    "q_caption_dedup" -> ("Composite-key (image, caption) dedup: the " +
      "window partitions on (img_id, cap_hash) — the 16-byte caption " +
      "hash keeps the partition key high-cardinality (the window-ban " +
      "good case) — and only ids + hashes cross the exchange; text is " +
      "pruned at the scan projection, before the union with the " +
      "planted mirror branch."),
    "q_text_fix" -> ("The mojibake census is ONE map-side projection " +
      "(the 8-replace repair chain + the planted-suffix CASE fold " +
      "into the scan stage under whole-stage codegen) feeding a " +
      "single partial+final aggregate keyed on source — text never " +
      "shuffles, only the per-source counters cross the one " +
      "exchange."),
    "q_vocab_budget" -> ("The budget sweep touches the corpus ONCE: " +
      "the word histogram aggregates and checkpoints (vocab-sized, " +
      "bounded by construction), then every merge-budget leg is a " +
      "map-side re-encode OVER THE CHECKPOINT (bpe_apply rides the " +
      "prefix as a codegen reference object, never an In-list) into " +
      "a one-row aggregate; the legs union. The parquet read happens " +
      "once, at checkpoint materialization — THIS plan shows only " +
      "checkpoint scans, zero parquet re-reads."),
    "q_phash_sweep" -> ("The radius dial runs the chunk-blocked pair " +
      "miner ONCE at the widest verify threshold (Hamming ≤ 6) and " +
      "grid-joins the 7-row radius frame as a BROADCAST nested loop " +
      "(hamming <= radius is the only condition — a 7× fan-out of " +
      "the bounded pair set, never a re-mine per radius); the " +
      "id-pair explode and the per-radius distinct ride one " +
      "exchange keyed on radius."),
    "q_langid_sweep" -> ("The profile-depth dial retrains NOTHING: " +
      "language and doc profiles build ONCE at max depth (both " +
      "checkpointed — the plan shows checkpoint scans where the legs " +
      "read, not corpus re-reads), the 4-row leg frame joins as a " +
      "BROADCAST nested loop, and each leg is a rank-threshold " +
      "filter over the one matched frame into a partial+final " +
      "aggregate; the argmin window partitions (doc, leg) — " +
      "high-cardinality by construction. Text leaves the plan at the " +
      "trigram explode; only (tri, rank) pairs cross exchanges."),
    "q_langid_prefix" -> ("The sample-size dial scans the corpus " +
      "ONCE: a single positioned trigram explode feeds the leg grid " +
      "(broadcast 4-row join on start-position <= cap-2 — a capped " +
      "leg is a FILTER of the full leg's trigram stream, never a " +
      "re-substring), counts aggregate per (doc, leg, tri) with " +
      "map-side partials, and the per-leg rank is one window " +
      "partitioned (doc, leg). The trained profile is the flagship's " +
      "own checkpoint, read twice (langs frame + match join)."),
    "q_dedup_substring_exact" -> ("ExactSubstr (Lee et al.) with " +
      "shuffle ∝ ANCHORS and extension CPU ∝ REGION, never text² in " +
      "either: the winnow window selects ≈ 2/(w+1) fingerprints per " +
      "token (per-doc window — high-card key), the distinct-doc df " +
      "cap bounds every anchor's pair fan-out at C(cap,2), and ONLY " +
      "8-byte hashes + positions ride the pair exchange; anchors " +
      "then GROUP per (doc_a, doc_b) so the token arrays join back " +
      "once per candidate PAIR (not once per anchor), and one " +
      "diagonal-sorted fold extends each duplicated region exactly " +
      "once — anchors inside an already-extended span are skipped, " +
      "the left scan is capped by the previous span's known " +
      "mismatch, and both scans short-circuit after the first " +
      "mismatch. A near-mirror pair costs one O(T) walk where the " +
      "per-anchor form paid O(0.4·T²) comparisons plus 0.4·T array " +
      "replications. A suffix array would need a global sort of " +
      "every suffix; this plan's biggest exchange is the anchor " +
      "join."))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("/root/repo/PLANS.md")
    val spark = GraftSession.get()
    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of representative queries\n\n")
    sb.append(s"Generated by `graft.Plans` at $sfDir (plans are scale-\n")
    sb.append("independent in shape; AQE refines exchanges at runtime).\n")
    for ((name, note) <- picks) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      sb.append(s"\n## $name\n\n$note\n\n```\n")
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode).take(6000))
      sb.append("\n```\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
