package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines:
  * exact (content hash), MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design: signature computation is map-side only (one
  * codegen'd pass per doc, no shuffle). The only wide operations are
  * (a) the groupBy on content hash (exact dedup) and (b) the
  * band-bucket self-join (LSH), which joins within buckets only —
  * the standard way to keep near-dup detection out of O(N²).
  * Frequent-shingle skew is capped via `maxBucket`.
  */
object DedupOps {

  /** whitespace tokens (matches DuckDB regexp_split_to_array twin) */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** distinct word n-gram shingles straight from the text column
    * (native single-pass expression; empty for docs shorter than n) */
  def shinglesOfText(text: Column, n: Int): Column =
    graft.functions.HashExprs.word_shingles(text, n)

  /** content-normalized fingerprint: md5 of the sorted distinct token
    * set (bag-of-words identity, order-insensitive) */
  def bagFingerprint(words: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(words))))

  /** Row-LOCAL decontamination score — the per-doc verdict of
    * q_decontaminate computed inside the row, which is what makes
    * the contamination check streamable (an ingest feed alerts when
    * it starts swallowing benchmark text, before the corpus census
    * runs): `outCol` = max over eval docs of the occurrence-pair
    * share count with this doc's word-5-grams, EXACTLY
    * q_decontaminate's join accounting (n_shared counts matching
    * occurrence pairs, Σ_s cnt_doc(s)·cnt_eval(s)) because
    * `postings` inlines eval-side multiplicity: 5-gram → eval ids
    * REPEATED per occurrence, so each doc-side occurrence's lookup
    * contributes cnt_eval copies and the run-length max over the
    * sorted hit list is the max pair count. Bounded BY CONSTRUCTION:
    * the eval set is the benchmark — small by definition, the same
    * boundedness argument as the batch query's broadcast (this is
    * not a data-scaling In-list; the map rides the plan as one
    * literal whose size is the benchmark's). Staged projections,
    * not one nested expression (the withTrigramLangId discipline:
    * interpreted higher-order functions re-evaluate referenced
    * subtrees per lambda call). Null/short text scores 0. */
  def withContamScore(df: DataFrame, textCol: String, outCol: String,
                      postings: Map[String, Seq[Long]]): DataFrame = {
    require(postings.nonEmpty, "withContamScore: empty eval postings")
    val sh = col("__ctm_sh")
    val hits = col("__ctm_hits")
    val bnd = col("__ctm_bnd")
    df.withColumn("__ctm_sh", shinglesOfText(col(textCol), 5))
      .withColumn("__ctm_hits", array_sort(flatten(
        filter(transform(sh, s => element_at(typedLit(postings), s)),
          a => a.isNotNull))))
      // run boundaries of equal eval ids in the sorted hit list —
      // the sort + boundary-delta counting pattern (O(n log n),
      // never a per-distinct re-scan)
      .withColumn("__ctm_bnd", when(size(hits) >= 1,
        concat(filter(sequence(lit(1), size(hits)), i =>
            i === 1 || element_at(hits, i) =!= element_at(hits, i - 1)),
          array(size(hits) + 1)))
        .otherwise(array().cast("array<int>")))
      .withColumn(outCol, when(size(bnd) >= 2, array_max(
          transform(sequence(lit(1), size(bnd) - 1), j =>
            element_at(bnd, j + 1) - element_at(bnd, j))))
        .otherwise(lit(0)))
      .drop("__ctm_sh", "__ctm_hits", "__ctm_bnd")
  }

  /** Windowed duplicated-substring detection — the distributable
    * approximation of exact substring dedup (the suffix-array dedup
    * of "Deduplicating Training Data Makes Language Models Better"):
    * every w-token window at `stride` is fingerprinted (md5 of the
    * joined window — engine-portable); a fingerprint occurring ≥2
    * times anywhere in the corpus marks a duplicated span, including
    * repeats WITHIN one document. Returns (id, dup_windows) for
    * documents containing at least one duplicated span; span offsets
    * are implied by window index × stride for the consumer's cut.
    *
    * Scale: windows/doc = len/stride, emitted by one map-side
    * transform+explode; the wide ops are the fingerprint count and a
    * semi join back — both shuffle fingerprints (16 bytes/window),
    * never text. A suffix array finds duplicates at EVERY offset;
    * the windowed form trades offsets divisible by `stride` for
    * embarrassing parallelism — the standard corpus-scale variant.
    */
  def duplicatedWindows(docs: DataFrame, idCol: String, textCol: String,
                        w: Int, stride: Int): DataFrame = {
    val toks = docs.select(col(idCol), tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= w)
    // (size - w) / stride: double division then int cast — truncation
    // equals floor for non-negative, matching the oracle's `//`
    val wins = toks.select(col(idCol), explode(transform(
        sequence(lit(0), ((size(col("__t")) - lit(w)) / lit(stride)).cast("int")),
        i => md5(concat_ws(" ", slice(col("__t"), i * stride + 1, lit(w)))))).as("__fp"))
    val dupFp = wins.groupBy(col("__fp")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2).select(col("__fp"))
    wins.join(dupFp, Seq("__fp"), "left_semi")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("dup_windows"))
  }

  /** Cross-document segment-level exact dedup — the C4/RefinedWeb
    * "line dedup" pass: segment every document, hash each segment,
    * keep only the corpus-wide FIRST occurrence (smallest
    * (doc, position)), and reassemble documents from their surviving
    * segments. Boilerplate (nav bars, license headers, cookie
    * banners) repeats across millions of pages; this removes every
    * copy but one while leaving unique prose untouched.
    *
    * Segments here are `window`-token chunks — the newline-free
    * synthetic corpus's stand-in for lines; a production corpus
    * passes its natural splitter by segmenting upstream and the
    * first-occurrence/reassembly machinery is unchanged.
    *
    * Scale shape: segmentation is one map-side transform+explode.
    * The decision aggregate shuffles (16-byte md5, 8-byte composite
    * key) — never text. Text moves twice: the hash-partitioned join
    * that brings each segment its verdict, and the doc regroup for
    * reassembly; writing the corpus bucketed by the id makes the
    * regroup exchange-free, and a stats-only consumer (keep counts,
    * no text_dedup) drops the second move entirely.
    *
    * The composite first-occurrence key is id·10⁶ + position —
    * exact in int64 up to 9.2e12 documents per corpus and 10⁶
    * segments per document (a 100 TB corpus is ~1e10 docs). Both
    * bounds are ENFORCED: a negative id (would invert the min-key
    * ordering) or a document beyond 10⁶ segments (keys would collide
    * into the next id) raises at execution instead of silently
    * producing wrong first-occurrence verdicts.
    */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
                window: Int): DataFrame = {
    val toks = docs.select(col(idCol), tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 1)
    // (n + w - 1) / w: double division then int cast — exact for the
    // int-sized counts, truncation = floor for non-negatives
    val nSeg = ((size(col("__t")) + lit(window - 1)) / lit(window)).cast("int")
    val segs = toks.select(col(idCol), posexplode(transform(
        sequence(lit(0), nSeg - 1),
        i => concat_ws(" ", slice(col("__t"), i * window + 1, lit(window))))))
      .withColumnRenamed("pos", "__pos").withColumnRenamed("col", "__seg")
    val idL = col(idCol).cast("long")
    // guarded composite key: violations raise (codegen'd when/raise_error
    // per segment — branch-predicted away on the valid path)
    val key = when(idL >= 0 && col("__pos") < 1000000L,
        idL * lit(1000000L) + col("__pos"))
      .otherwise(raise_error(concat(
        lit("lineDedup composite key out of domain: id="), idL.cast("string"),
        lit(" pos="), col("__pos").cast("string"),
        lit(" (requires id >= 0 and < 1e6 segments per document)"))))
    val firsts = segs.groupBy(md5(col("__seg")).as("__h"))
      .agg(min(key).as("__fk"))
    segs.withColumn("__h", md5(col("__seg")))
      .join(firsts, "__h")
      .withColumn("__keep", key === col("__fk"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_segments"),
        sum(col("__keep").cast("long")).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("__keep"),
            struct(col("__pos"), col("__seg"))))),
          s => s.getField("__seg")), " ").as("__joined"))
      .select(col(idCol), col("n_segments"), col("n_kept"),
        // a fully-duplicate document keeps nothing: NULL, not ""
        when(col("n_kept") > 0, col("__joined")).as("text_dedup"))
  }

  /** BOILERPLATE census per source: the [[lineDedup]] segmentation
    * (window-token line segments), scored ACROSS documents — a
    * segment appearing in ≥ `minDocs` distinct docs of one source is
    * boilerplate (nav bars, license headers, footers: the shared
    * chrome C4 strips before training). Reports per source the
    * distinct boilerplate segments and the documents carrying any.
    * Scale shape: segments collapse to distinct (source, hash, doc)
    * triples map-side, then two (source, hash)-keyed aggregates and
    * a candidate-bounded join-back — fingerprints only through every
    * exchange, never text. */
  def boilerplate(docs: DataFrame, idCol: String, srcCol: String,
                  textCol: String, window: Int, minDocs: Int): DataFrame = {
    val toks = docs.select(col(idCol), col(srcCol), tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 1)
    val nSeg = ((size(col("__t")) + lit(window - 1)) / lit(window)).cast("int")
    val segs = toks.select(col(idCol), col(srcCol), explode(transform(
        sequence(lit(0), nSeg - 1),
        i => concat_ws(" ", slice(col("__t"), i * window + 1, lit(window)))))
        .as("__seg"))
      .select(col(srcCol), md5(col("__seg")).as("__h"), col(idCol))
      .distinct()
    val boiler = segs.groupBy(col(srcCol), col("__h"))
      .agg(count(lit(1)).as("n_docs_with")) // triples are distinct → per-doc
      .filter(col("n_docs_with") >= minDocs)
    val nB = boiler.groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_boiler_segments"))
    val affected = segs.join(boiler.select(col(srcCol), col("__h")),
        Seq(srcCol, "__h"))
      .groupBy(col(srcCol))
      .agg(countDistinct(col(idCol)).as("n_affected_docs"))
    nB.join(affected, Seq(srcCol))
  }

  /** Incremental dedup — admit a NEW batch against a historical
    * fingerprint STORE (the daily-ingest pattern: dedup today's crawl
    * against the accumulated corpus without touching its text). A doc
    * duplicates the store if its content hash is already there, and
    * duplicates the batch if an earlier incoming doc (smaller id)
    * carries the same hash; `admit` = neither. Admitted hashes are
    * what the caller appends back to the store for tomorrow.
    *
    * Scale shape: the store is fingerprints only (16 B/doc — a 1e10
    * doc corpus is a 160 GB store, not 100 TB of text); the probe is
    * hash⋈hash with text riding only the incoming side; bucketing
    * the store table by hash makes the probe exchange-free, and at
    * 100 TB that bucketed store IS the dedup index.
    *
    * `storeHashes` needs one column `content_hash`.
    */
  def dedupAgainstStore(incoming: DataFrame, idCol: String, textCol: String,
                        storeHashes: DataFrame): DataFrame = {
    val h = incoming.withColumn("__h", md5(col(textCol)))
    val st = storeHashes.select(col("content_hash").as("__h")).distinct()
      .withColumn("__in_store", lit(true))
    val firstInBatch = h.groupBy(col("__h")).agg(min(col(idCol)).as("__first"))
    h.join(st, Seq("__h"), "left")
      .join(firstInBatch, Seq("__h"))
      .withColumn("dup_of_store", coalesce(col("__in_store"), lit(false)))
      .withColumn("dup_in_batch", col(idCol) =!= col("__first"))
      .withColumn("admit", !col("dup_of_store") && !col("dup_in_batch"))
      .drop("__h", "__in_store", "__first")
  }

  /** [[dedupAgainstStore]] with a Bloom pre-filter on the STORE scan —
    * the shape that matters when the fingerprint store is the big
    * side (it is: the store accumulates every day ever ingested,
    * the increment is one day). Build direction is the point:
    * the filter is built over the INCREMENT's hashes (small — one
    * distributed partial aggregate, ~`numBits/8` bytes to the
    * driver once), then probes ride into the store scan as a
    * map-side codegen'd Filter — store rows that can't match any
    * increment hash never enter the store's distinct/join shuffle.
    * At 10 bits/key the false-positive rate is <1%, so the shuffle
    * carries ≈ the true matches; with no false negatives the LEFT
    * probe join's result is bit-identical to the unfiltered probe
    * (same oracle), which the spec pins.
    *
    * `numBits` sizes the filter: ~10× the expected increment
    * cardinality, rounded up to a multiple of 64. The two extra jobs
    * (bloom build) scan only the increment. */
  def dedupAgainstStoreBloom(incoming: DataFrame, idCol: String, textCol: String,
                             storeHashes: DataFrame,
                             numBits: Int = 1 << 20,
                             numHashes: Int = 5): DataFrame = {
    import graft.functions.BloomExprs
    val bytes = incoming
      .select(BloomExprs.bloom_build(
        xxhash64(md5(col(textCol))), numBits, numHashes).as("b"))
      .head().getAs[Array[Byte]]("b")
    val words = BloomExprs.wordsOf(bytes)
    val prefiltered = storeHashes.filter(
      BloomExprs.bloom_might_contain(words, numHashes,
        xxhash64(col("content_hash"))))
    dedupAgainstStore(incoming, idCol, textCol, prefiltered)
  }

  /** Incremental NEAR-dup — [[dedupAgainstStore]]'s minhash sibling:
    * probe an incoming batch's signatures against the historical
    * SIGNATURE store (the persisted index of everything already
    * ingested; signatures, never text). Both sides band identically;
    * candidates are band-key collisions (incoming ⋈ store — one
    * shuffle keyed on (band, bucket)), verified by lane agreement ≥
    * threshold. Store buckets are capped deterministically (smallest
    * ids win — the lshNearDupPairs skew discipline): a boilerplate
    * bucket stops absorbing probes instead of going quadratic.
    * Returns (id_in, id_store, est_sim); admitted = incoming ids
    * absent from the result, and admitted signatures are what the
    * caller appends to the store.
    *
    * md5-lane variant (value-oracled); swap the xxh64 signature for
    * the scale path exactly as with lshNearDupPairs.
    */
  def lshNearDupAgainstStoreMd5(incoming: DataFrame, store: DataFrame,
                                idCol: String, sigCol: String,
                                bands: Int, rows: Int, threshold: Double,
                                maxBucket: Int = 1000): DataFrame = {
    val k = bands * rows
    def banded(df: DataFrame, idOut: String, sigOut: String): DataFrame =
      // explode(array(sig)): one-row Generate barrier so the length
      // filter can't be pushed below with the signature expression
      // inlined (see lshNearDupPairsImpl)
      df.select(col(idCol), explode(array(col(sigCol))).as(sigCol))
        .filter(size(col(sigCol)) === k)
        .select(col(idCol).as(idOut), col(sigCol).as(sigOut),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(concat_ws(",",
              transform(slice(col(sigCol), b * rows + 1, lit(rows)),
                x => x.cast("string")))))))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "band_key")
    val stBands = banded(store, "id_store", "sig_store")
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("band"), col("band_key"))
          .orderBy(col("id_store"))))
      .filter(col("__rk") <= maxBucket).drop("__rk")
    banded(incoming, "id_in", "sig_in")
      .join(stBands, Seq("band", "band_key"))
      .select(col("id_in"), col("id_store"),
        minhashEstimate(col("sig_in"), col("sig_store"), k).as("est_sim"))
      .filter(col("est_sim") >= threshold)
      .distinct()
  }

  /** k-minhash signature: native single-pass expression (one XXH64
    * pair per shingle, k lanes by double hashing). array<bigint>
    * length k. See graft.functions.MinHashSignature.
    */
  def minhashSignature(shs: Column, k: Int): Column =
    graft.functions.HashExprs.minhash_signature(shs, k)

  /** md5-portable minhash (array<string> hex lanes, empty array for
    * empty input) — the variant the value-level DuckDB oracle checks.
    * The xxhash64 [[minhashSignature]] stays the faster scale path. */
  def minhashSignatureMd5(shs: Column, k: Int): Column =
    graft.functions.HashExprs.minhash_signature_md5(shs, k)

  /** md5-portable simhash bits (oracle-verifiable twin of [[simhashBits]]) */
  def simhashBitsMd5(words: Column): Column =
    graft.functions.HashExprs.simhash_bits_md5(words)

  /** 128-bit simhash — the scale variant (see [[simhashNearDupPairs]]
    * blocking note) */
  def simhashBits128(words: Column): Column =
    graft.functions.HashExprs.simhash_bits_128(words)

  /** estimated Jaccard from two signatures: matching positions / k */
  def minhashEstimate(sigA: Column, sigB: Column, k: Int): Column =
    size(filter(zip_with(sigA, sigB, (x, y) => when(x === y, lit(1))),
      v => v.isNotNull)).cast("double") / lit(k.toDouble)

  /** LSH banding: candidate pairs whose signatures collide in ≥1 of
    * `bands` bands of `rows` hashes. Input: (idCol, sigCol). Output:
    * (id_a, id_b, est_sim) for estimate ≥ threshold.
    */
  def lshNearDupPairs(df: DataFrame, idCol: String, sigCol: String,
                      bands: Int, rows: Int, threshold: Double,
                      maxBucket: Int = 1000): DataFrame =
    lshNearDupPairsImpl(df, idCol, sigCol, bands, rows, threshold, maxBucket,
      // docs with no shingles have all-MaxValue signatures; they'd all
      // "match" each other, so drop them from candidate generation
      sig => element_at(sig, 1) =!= Long.MaxValue)

  /** LSH banding over md5-portable signatures (empty array = no
    * shingles). Identical pair semantics, value-verifiable by SQL. */
  def lshNearDupPairsMd5(df: DataFrame, idCol: String, sigCol: String,
                         bands: Int, rows: Int, threshold: Double,
                         maxBucket: Int = 1000): DataFrame =
    lshNearDupPairsImpl(df, idCol, sigCol, bands, rows, threshold, maxBucket,
      sig => size(sig) > 0)

  private def lshNearDupPairsImpl(df: DataFrame, idCol: String, sigCol: String,
                                  bands: Int, rows: Int, threshold: Double,
                                  maxBucket: Int,
                                  nonEmptyGuard: Column => Column): DataFrame = {
    val k = bands * rows
    // r19: materialize the signature ONCE per row behind a Generate
    // barrier before the guard filter. A filter on a computed column
    // is pushed below its Project WITH THE EXPRESSION INLINED
    // (PushPredicateThroughNonJoin), so the k-lane signature was being
    // computed twice per row — observed in the executed
    // q_dedup_minhash plan, where the guard Filter re-ran
    // minhash_signature_md5 (8 md5 digests per shingle) that the
    // Project above recomputed. A generator's output cannot be pushed
    // past, so explode(array(sig)) — exactly one output row per input
    // row — pins one evaluation.
    val once = df.select(col(idCol), explode(array(col(sigCol))).as(sigCol))
    val nonEmpty = once.filter(nonEmptyGuard(col(sigCol)))
      // a signature built with a different k would silently band on
      // empty slices and mis-scale est_sim — fail loudly instead
      .withColumn(sigCol, when(size(col(sigCol)) === k, col(sigCol))
        .otherwise(raise_error(concat(
          lit(s"signature length != bands*rows=$k: "), size(col(sigCol)).cast("string")))))
    val banded = nonEmpty.select(col(idCol), col(sigCol),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",",
            transform(slice(col(sigCol), b * rows + 1, lit(rows)), _.cast("string")))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_key")
    // One shuffle: collect each bucket's members, emit ordered pairs
    // in place (signatures computed once — no self-join re-evaluating
    // the lineage). Skew guard: a degenerate bucket (shingle shared by
    // everything) is dropped rather than going quadratic.
    val buckets = banded
      .groupBy(col("band"), col("band_key"))
      .agg(sort_array(collect_list(struct(col(idCol).as("id"), col(sigCol).as("sig"))))
        .as("members"))
      .filter(size(col("members")).between(2, maxBucket))
    pairsWithin(buckets, "members")
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        minhashEstimate(col("a.sig"), col("b.sig"), k).as("est_sim"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("est_sim") >= threshold)
  }

  /** explode all ordered pairs (i < j) of a collected struct array as
    * columns `a` and `b` (native kernel — the HOF chain interprets) */
  private def pairsWithin(buckets: DataFrame, membersCol: String): DataFrame =
    buckets.select(explode(
        graft.functions.VectorExprs.pair_combinations(col(membersCol))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))

  /** 64-bit SimHash over the token multiset: per bit, sign of the
    * sum of ±1 votes from each token's xxhash64. One codegen'd pass
    * per doc. Returned as array<int> of 64 bits (MSB-free form that
    * keeps Hamming math in plain array ops).
    */
  def simhashBits(words: Column): Column =
    graft.functions.HashExprs.simhash_bits(words)

  def hamming(bitsA: Column, bitsB: Column): Column =
    graft.functions.VectorExprs.hamming_dist(bitsA, bitsB)

  /** SimHash near-dup pairs: block on bit chunks (a pair within
    * Hamming ≤ chunks−1 must agree on ≥1 chunk — guaranteed; larger
    * radii are caught probabilistically), verify exact Hamming ≤
    * maxHamming.
    *
    * Blocking at scale: the per-chunk key space is 2^chunkBits, so
    * expected bucket population is N/2^chunkBits — with 64-bit
    * hashes and 16-bit chunks that saturates `maxBucket` around
    * N≈10^8 and recall collapses. The scale configuration is the
    * 128-bit hash ([[simhashBits128]]) with chunkBits=32: 2^32 keys
    * keeps buckets ~1 even at 10^9+ docs (chunkBits=16 over 128 bits
    * trades bucket size for a Hamming≤7 guarantee instead).
    */
  def simhashNearDupPairs(df: DataFrame, idCol: String, bitsCol: String,
                          maxHamming: Int, maxBucket: Int = 1000,
                          nBits: Int = 64, chunkBits: Int = 16): DataFrame = {
    require(nBits % 64 == 0 && 64 % chunkBits == 0,
      s"simhashNearDupPairs: nBits=$nBits must pack into longs and " +
        s"chunkBits=$chunkBits must divide 64")
    val chunks = nBits / chunkBits
    val nWords = nBits / 64
    // r18 optimization (identical pairs, oracle green): bucket keys
    // and carried signatures are PACKED LONGS, not '0'/'1' strings /
    // 4-byte-per-bit int arrays — bits_pack is a bijection of the bit
    // slice, so the (chunk, key) partition of segments is unchanged
    // and Hamming over packed words (bit_count of xor) equals the
    // elementwise bit diff. The old form built each chunk key through
    // two nested interpreted HOFs (~0.4 s/query at sf0.1) and carried
    // a 256-byte array per member through the bucket exchange; this
    // one is all codegen and carries nBits/8 bytes (guide §2.3:
    // narrower types — the banding shuffle shrinks ~30×).
    val sigPacked = array((0 until nWords).map(w =>
      graft.functions.HashExprs.bits_pack(col(bitsCol), w * 64, 64)): _*)
    val chunkKeys = array((0 until chunks).map(c =>
      graft.functions.HashExprs.bits_pack(col(bitsCol), c * chunkBits,
        chunkBits)): _*)
    val chunked = df.select(col(idCol), sigPacked.as("__sig"),
        posexplode(chunkKeys))
      .withColumnRenamed("pos", "chunk")
      .withColumnRenamed("col", "chunk_key")
    val buckets = chunked
      .groupBy(col("chunk"), col("chunk_key"))
      .agg(sort_array(collect_list(struct(col(idCol).as("id"), col("__sig").as("sig"))))
        .as("members"))
      .filter(size(col("members")).between(2, maxBucket))
    val ham = (0 until nWords).map(w =>
        bit_count(element_at(col("a.sig"), w + 1)
          .bitwiseXOR(element_at(col("b.sig"), w + 1))))
      .reduce(_ + _)
    pairsWithin(buckets, "members")
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        ham.as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
  }

  /** Apply near-dup pairs as a dedup decision: greedily keep every doc
    * that never appears as the larger id of a pair. Greedy keeps every
    * LOCAL minimum — a doc smaller than all its direct neighbors — so
    * on transitive chains (1~3, 2~3 but 1≁2) it keeps {1,2} where
    * cluster semantics keep only the component min {1}. Production
    * corpus dedup wants [[applyDedupCC]]; this stays as the cheap
    * single-join variant.
    */
  def applyDedup(df: DataFrame, idCol: String, pairs: DataFrame): DataFrame =
    df.join(pairs.select(col("id_b").as(idCol)).distinct(), Seq(idCol), "left_anti")

  /** Connected components over an undirected pair list (numeric ids)
    * by iterative min-label propagation with pointer jumping:
    * each round every vertex takes the min of its own label, its
    * neighbors' labels, and its label's label (label(label(v))).
    * On monotone chains the jump doubles propagation distance per
    * round (a 200-hop path converges in 9 rounds, measured); on
    * randomly-labeled near-critical graphs the min-pointer sits
    * mid-ball and the speedup is weaker (a 2000-vertex random graph
    * at mean degree 1.2 took 32 rounds). Near-dup corpus graphs are
    * dense small-diameter clusters — a handful of rounds in
    * practice; maxIters is a backstop, and converged rounds stop the
    * loop immediately. Runs to the fixed
    * point, detected by the sum-of-labels checksum: labels only ever
    * decrease, so an unchanged sum IS convergence — one cheap agg
    * action per round, no row-wise diff join. The fixed point (min id
    * reachable from each vertex) is unique, so the result is
    * deterministic regardless of partitioning or join order.
    *
    * Scale shape: each round is one shuffle-join on the vertex id
    * plus a groupBy-min — rows never exceed |V| + 2|E|, nothing is
    * collected, and each round's labels materialize through an
    * RDD-backed frame so the loop's join lineage never reaches the
    * optimizer.
    *
    * Hybrid small-graph path: the pair list is the OUTPUT of near-dup
    * detection — tiny relative to the corpus (pairs ≪ docs on real
    * corpora). Below `maxLocalEdges` the component labels come from a
    * driver-side union-find over one bounded collect (same fixed
    * point, exact; the bounded-collect discipline the IVF centroid
    * build documents), skipping ~N_rounds × 3 shuffles of fixed
    * per-job overhead. Above it, the distributed loop runs. Both
    * paths produce identical labels (spec-verified on the same
    * graphs).
    *
    * Returns (id, component): one row per id present in `pairs`,
    * component = min id of its connected component.
    */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
                          idB: String = "id_b", maxIters: Int = 100,
                          maxLocalEdges: Long = 2000000L): DataFrame = {
    val spark = pairs.sparkSession
    val e = pairs.select(col(idA).cast("long").as("src"), col(idB).cast("long").as("dst"))
      .persist()
    val n = e.limit((maxLocalEdges + 1).toInt).count()
    val result =
      if (n <= maxLocalEdges) {
        val edges = e.collect().map(r => (r.getLong(0), r.getLong(1)))
        e.unpersist()
        val parent = new java.util.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.get(r) != r) r = parent.get(r)
          // path compression
          var c = x
          while (parent.get(c) != r) { val nx = parent.get(c); parent.put(c, r); c = nx }
          r
        }
        edges.foreach { case (a, b) =>
          parent.putIfAbsent(a, a); parent.putIfAbsent(b, b)
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
        }
        val rows = parent.keySet().toArray(Array.empty[java.lang.Long])
          .map(v => (v.toLong, find(v)))
        import spark.implicits._
        rows.toSeq.toDF("id", "component")
      } else {
        // the loop's result is RDD-backed (materializeRound), so the
        // source frame's cache can release as soon as the loop ends
        val r = connectedComponentsImpl(e, maxIters)
        e.unpersist()
        r
      }
    result
  }

  /** Materialize a round's labels as a cached RDD wrapped in a FRESH
    * DataFrame. `localCheckpoint` is the obvious tool but is unusable
    * in a loop: its LogicalRDD inherits the origin plan's stats and
    * constraints, the join-size estimate squares sizeInBytes every
    * round, and by round ~15 the driver spends minutes doing BigInt
    * arithmetic on numbers with 2^round bits (observed live; the
    * constraint set compounds the same way). createDataFrame over the
    * raw RDD starts every round from clean default stats.
    */
  private def materializeRound(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]) = {
    val rdd = df.rdd
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (df.sparkSession.createDataFrame(rdd, df.schema), rdd)
  }

  /** distributed min-label propagation; `pairsLong` has (src, dst) */
  private def connectedComponentsImpl(pairsLong: DataFrame, maxIters: Int): DataFrame = {
    val edges = pairsLong
      .union(pairsLong.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    var (labels, labelsRdd) = materializeRound(
      edges.select(col("src").as("id")).distinct().withColumn("label", col("id")))
    var prevSum = labels.agg(sum(col("label"))).head.getLong(0)
    var converged = false
    var round = 0
    while (!converged && round < maxIters) {
      val viaEdges = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("label"))
      // pointer jumping: every label is itself a vertex id, so its
      // current label is always resolvable (inner join is total)
      val viaJump = labels.as("x")
        .join(labels.select(col("id").as("jid"), col("label").as("jlab")),
          col("x.label") === col("jid"))
        .select(col("x.id").as("id"), col("jlab").as("label"))
      val (next, nextRdd) = materializeRound(
        labels.union(viaEdges).union(viaJump)
          .groupBy(col("id")).agg(min(col("label")).as("label")))
      val s = next.agg(sum(col("label"))).head.getLong(0)
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        println(s"CC round=$round sum=$s prev=$prevSum")
      converged = s == prevSum
      prevSum = s
      labelsRdd.unpersist()
      labels = next
      labelsRdd = nextRdd
      round += 1
    }
    edges.unpersist()
    // the final round's cached RDD backs the returned frame, so it
    // cannot be unpersisted here; Spark's ContextCleaner releases it
    // once the frame becomes unreachable. A caller looping CC over
    // many graphs in one session can force it with result.rdd.unpersist()
    labels.select(col("id"), col("label").as("component"))
  }

  /** Cluster-semantics dedup: connected components over the pair
    * graph, keep exactly the min id per component (plus every doc in
    * no pair at all) — what production corpus dedup does, vs the
    * greedy local-minima [[applyDedup]].
    */
  def applyDedupCC(df: DataFrame, idCol: String, pairs: DataFrame,
                   maxIters: Int = 30): DataFrame = {
    val drop = connectedComponents(pairs, maxIters = maxIters)
      .filter(col("id") =!= col("component"))
      .select(col("id").as(idCol))
    df.join(drop, Seq(idCol), "left_anti")
  }

  /** exact n-gram Jaccard pairs via posting lists: group ids per
    * shingle, emit ordered pairs within each list, count per pair,
    * compute |A∩B| / (|A|+|B|−|A∩B|). Shingles are computed ONCE (no
    * self-join re-evaluating the lineage), shuffling once on the
    * shingle and once on the pair.
    *
    * `maxDf`: document-frequency cap — a shingle present in huge
    * numbers of docs generates quadratic pairs with little signal,
    * and an uncapped posting list eventually overflows pair
    * expansion. The default (50k ≈ 1.25B pairs) is the hard ceiling;
    * set it far lower at scale. (Caps change results only when a
    * shingle's df exceeds them — the sf0.01 oracle corpus never
    * gets near the default.)
    */
  def jaccardPairs(df: DataFrame, idCol: String, shinglesCol: String,
                   threshold: Double, maxDf: Int = 50000): DataFrame = {
    // shuffle 8-byte shingle hashes, not strings: identical counts
    // unless XXH64 collides within one doc pair's shingle sets
    // (P ≈ n²/2⁶⁵ — negligible), and the shuffle shrinks ~3×. The doc
    // size rides along in the posting struct so the per-pair union
    // size needs NO join back to the docs — pair counting is the last
    // shuffle.
    val postings = df.select(explode(col(shinglesCol)).as("s"),
        struct(col(idCol).as("id"), size(col(shinglesCol)).as("sz")).as("m"))
      .select(xxhash64(col("s")).as("s"), col("m"))
      .groupBy(col("s")).agg(sort_array(collect_list(col("m"))).as("ms"))
      .filter(size(col("ms")) >= 2 && size(col("ms")) <= maxDf)
    val pairs = postings.select(explode(
        graft.functions.VectorExprs.pair_combinations(col("ms"))).as("p"))
      // exact length filter BEFORE the pair shuffle: jaccard(a,b) ≤
      // min(sz)/max(sz), so a pair whose size ratio is under the
      // threshold can never qualify — dropped in the explode stage,
      // never shuffled. (Profiled at sf0.1: pair counting is ~7% of
      // the query — postings shuffle + shingle computation dominate —
      // but at corpus scale with heavy-tailed doc sizes this prunes
      // shuffle rows for free and is exactly result-preserving.)
      .filter(least(col("p.a.sz"), col("p.b.sz")).cast("double") >=
        lit(threshold) * greatest(col("p.a.sz"), col("p.b.sz")))
    pairs
      .groupBy(col("p.a.id").as("id_a"), col("p.b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"),
        first(col("p.a.sz")).as("sz_a"), first(col("p.b.sz")).as("sz_b"))
      .withColumn("union_sz",
        (col("sz_a") + col("sz_b") - col("inter")).cast("long"))
      .withColumn("jaccard", col("inter").cast("double") / col("union_sz"))
      .filter(col("jaccard") >= threshold)
      // union_sz rides along so downstream threshold comparisons can
      // stay in integers (inter*100 >= t_pct*union) — a pair at
      // exactly a grid cutoff must not fall to float rounding
      // (r14 advice on q_dedup_threshold_sweep)
      .select(col("id_a"), col("id_b"), col("inter"), col("union_sz"),
        col("jaccard"))
  }

  // ---- ExactSubstr span-cut kernel (Lee et al. APPLY) --------------
  // ONE copy of the cut rule, shared by q_dedup_span_cut,
  // q_dedup_fused and the dedup_spancut config stage (the gopherFlags
  // discipline: the filter and every report derive from the same
  // expressions so they can never drift).

  /** the covered b-side token positions of an ExactSubstr span frame
    * (doc_a < doc_b by pair construction — the NON-canonical copy
    * loses its positions, keep-earliest at span granularity): one
    * DISTINCT (doc_id, pos) row per covered position */
  def spanCutPositions(spans: DataFrame): DataFrame =
    spans.select(col("doc_b").as("doc_id"),
        explode(expr("sequence(start_b, start_b + span_len - 1)")).as("pos"))
      .distinct()

  /** apply the cut: per CUT doc, original/kept token counts and the
    * kept text reassembled in token order — covered positions leave
    * via ONE anti-join, order restored by sort_array over
    * (pos, token) structs (never a window), a fully-cut doc
    * legitimately keeps "" with n_after 0. Docs without cut
    * positions are absent (semi-join pruned BEFORE the tokenize, so
    * only candidates pay the posexplode); `cut` feeds two joins and
    * the tokenized frame two aggregates — pass a checkpointed `cut`
    * when spans are expensive. */
  def spanCutRebuild(docsDf: DataFrame, idCol: String, textCol: String,
                     cut: DataFrame): DataFrame = {
    val mine = docsDf.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .join(cut.select(col("doc_id")).distinct(), Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        posexplode(tokens(col("__t"))).as(Seq("p0", "w")))
      .withColumn("pos", (col("p0") + 1).cast("long")).drop("p0")
      .localCheckpoint() // feeds before + kept
    val kept = mine.join(cut, Seq("doc_id", "pos"), "left_anti")
    val before = mine.groupBy(col("doc_id")).agg(count(lit(1)).as("n_before"))
    val after = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_after"),
        concat_ws(" ", expr(
          "transform(sort_array(collect_list(struct(pos, w))), x -> x.w)"))
          .as("kept_text"))
    before.join(after, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_before"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }
}
