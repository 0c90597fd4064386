package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: token counting, quality
  * scoring, language ID, fingerprinting. All pure column expressions
  * (codegen'd, no UDFs) with DuckDB-twin formulations.
  */
object TextOps {

  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Deliberate cross-engine semantics: empty/whitespace-only text
    * tokenizes to [""] (count 1) in BOTH Spark split and DuckDB
    * regexp_split_to_array — the oracle contract pins this edge, so
    * don't "fix" it one-sided. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Verbatim 8-token segments of a token array (the Lee et al.
    * overlap unit) — ONE kernel shared by q_split_leakage, q_novelty
    * and the streaming novelty monitor so the segmentation cannot
    * drift between surfaces: consecutive 8-token windows, the last
    * allowed short. ⌈n/8⌉ via exact double division (int-sized
    * counts, truncation = floor — the chunkDocs discipline). */
  def segments8(ws: Column): Column =
    // empty-array guard: sequence(0, -1) DESCENDS in Spark ([0, -1]),
    // which would fabricate two phantom "" segments. tokens() never
    // returns an empty array (the [""] contract above), but a caller
    // passing a FILTERED token array must get [] — review-wave
    // finding, property-swept including this edge. `<= 0`, not `=== 0`
    // (r14 advice): size(NULL) is -1, and a NULL token array (NULL
    // text upstream) would otherwise ride the descend path and
    // fabricate a phantom "" segment shared by every null-text doc
    when(size(ws) <= 0, array().cast("array<string>")).otherwise(
      transform(
        sequence(lit(0),
          ((size(ws) + lit(7)).cast("double") / lit(8.0)).cast("int") - lit(1)),
        i => concat_ws(" ", slice(ws, i * lit(8) + lit(1), lit(8)))))

  /** BPE-ish subword segmentation: letter runs, digit runs, and
    * punctuation runs (each optionally space-prefixed) — the GPT-2
    * pre-tokenizer shape, minus lookahead so RE2 (DuckDB) and Java
    * regex agree. */
  val BpePattern = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** character count excluding spaces / token count */
  def avgTokenLen(text: Column): Column =
    length(regexp_replace(trim(text), "\\s+", "")).cast("double") /
      tokenCount(text).cast("double")

  /** fraction of tokens found in `words` */
  def wordlistRatio(toks: Column, words: Seq[String]): Column =
    wordlistHits(toks, words).cast("double") / size(toks).cast("double")

  def wordlistHits(toks: Column, words: Seq[String]): Column =
    graft.functions.HashExprs.wordlist_hits(toks, words)

  val EnStop = Seq("the", "a", "of", "and", "to", "in", "is", "on")
  val EsStop = Seq("el", "la", "de", "y", "en", "es", "los", "que")

  /** Shared survival-curve bucketing kernel (q_quality_survival AND
    * the streaming survival monitor — one scorer, the calibration/
    * classifier discipline): integer stopword-per-mille surrogate
    * (LOW = high quality, the q_budget_select score), 20‰-grid
    * bucket capped at 10. Adds `n_tokens` + `bucket` to the frame;
    * null/empty-token docs are filtered (the census's n>=1 guard).
    * Integral DIV throughout — double division truncates ~1e-8 of
    * boundary rows the wrong way (the Ottl.timeFromUnixNano class). */
  def survivalBuckets(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("__stop_hits", wordlistHits(tokens(col(textCol)), EnStop))
      .filter(col("n_tokens") >= 1)
      .withColumn("bucket",
        least(expr("__stop_hits * 1000 DIV n_tokens DIV 20"), lit(10L)))
      .drop("__stop_hits")
  val DeStop = Seq("der", "die", "das", "und", "zu", "ist", "den", "von")

  /** n-gram/stopword language-ID heuristic: argmax of per-language
    * stopword hits with a deterministic tie order (en > es > de),
    * 'und' (undetermined) when nothing matches.
    */
  def langId(toks: Column): Column = {
    val en = wordlistHits(toks, EnStop)
    val es = wordlistHits(toks, EsStop)
    val de = wordlistHits(toks, DeStop)
    when(en === 0 && es === 0 && de === 0, lit("und"))
      .when(en >= es && en >= de, lit("en"))
      .when(es >= de, lit("es"))
      .otherwise(lit("de"))
  }

  /** Per-ROW trigram-profile language ID (Cavnar & Trenkle
    * out-of-place rank distance — the q_lang_trigram scorer as a
    * map-side projection chain): the doc's top-`r` trigram ranks
    * compute inside the row (trigrams → sort → run-length counts →
    * sort by (count desc, tri asc) → positional rank — the identical
    * key q_lang_trigram's row_number uses), then each language's
    * broadcast profile map scores Σ |rk_doc − rk_lang| with
    * absent-from-profile = r, and the argmin (distance asc, lang asc
    * — the batch tie-break) is the prediction in `outCol`. 'und'
    * when the text is too short for a single trigram (the
    * streamingLangId null path's analog).
    *
    * This is what makes the TRIGRAM detector streamable (r17 verdict
    * #6): the batch pipeline ranks doc profiles with a window and
    * joins the profile table — two shuffles a per-trigger monitor
    * can't run — while this form is row-local; the spec pins it
    * prediction-for-prediction equal to the batch scorer on the
    * held-out split. `maxChars` bounds per-row work (the C&T sample
    * discipline — language ID needs a prefix, not the document;
    * ≤ 0 disables the cap, which is how the batch-parity spec runs).
    * `profile` = (lang, tri, rank) rows, langs × ≤ r — bounded by
    * construction, riding the plan as per-language literal maps
    * (NEVER data-scaling: the In-list hazard does not apply to a
    * fixed langs × 200 table). */
  def withTrigramLangId(df: DataFrame, textCol: String, outCol: String,
                        profile: Seq[(String, String, Long)],
                        maxChars: Int = 400, r: Int = 200): DataFrame = {
    require(profile.nonEmpty, "withTrigramLangId: empty profile")
    // depth-r semantics take the RANK PREFIX of a deeper profile
    // (the C&T truncation — exactly q_langid_sweep's leg filter):
    // without this, a trigram matched at rk_lang > r would score
    // |rk_doc − rk_lang| > the absent penalty r, punishing a
    // sharing language harder than a non-sharing one
    val prof = profile.filter(_._3 <= r)
    require(prof.nonEmpty,
      s"withTrigramLangId: no profile rows at rank <= $r")
    // STAGED projections, not one nested Column: interpreted
    // higher-order functions re-evaluate a subtree on EVERY lambda
    // call (split(t,'') would re-split the text once per trigram —
    // measured minutes per trigger on 500 short docs when this was
    // a single expression), while a staged alias is materialized
    // once per row and every later reference is an O(1) attribute
    // read. CollapseProject cannot re-inline the stages: each alias
    // is non-cheap and referenced more than once downstream.
    val t0 = col("__tlid_t")
    val chars = col("__tlid_chars")
    val tris = col("__tlid_tris")
    val sorted = col("__tlid_sorted")
    val bnd = col("__tlid_bnd")
    val ranked = col("__tlid_ranked")
    val byLang = prof.groupBy(_._1).view
      .mapValues(_.map { case (_, tri, rk) => tri -> rk.toInt }.toMap)
      .toSeq.sortBy(_._1)
    val scored = byLang.map { case (lang, m) =>
      struct(
        aggregate(ranked, lit(0L), (acc, s) =>
          acc + coalesce(abs(s("rk") -
            element_at(typedLit(m), s("tri")).cast("long")),
            lit(r.toLong))).as("dist"),
        lit(lang).as("cand"))
    }
    df.withColumn("__tlid_t",
        if (maxChars > 0) substring(col(textCol), 1, maxChars)
        else col(textCol))
      .withColumn("__tlid_chars", split(t0, ""))
      .withColumn("__tlid_tris", when(length(t0) >= 3,
        transform(sequence(lit(1), greatest(length(t0) - 2, lit(1))),
          i => concat(element_at(chars, i), element_at(chars, i + 1),
            element_at(chars, i + 2))))
        .otherwise(array().cast("array<string>")))
      // occurrence counts by sort + run-length, NOT a per-distinct
      // re-scan (distinct × len comparisons): boundaries of equal
      // runs in the sorted array, counts as boundary deltas —
      // O(n log n) per row
      .withColumn("__tlid_sorted", array_sort(tris))
      .withColumn("__tlid_bnd", when(size(sorted) >= 1,
        concat(filter(sequence(lit(1), size(sorted)), i =>
            i === 1 || element_at(sorted, i) =!= element_at(sorted, i - 1)),
          array(size(sorted) + 1)))
        .otherwise(array().cast("array<int>")))
      .withColumn("__tlid_cnt", when(size(bnd) >= 2,
        array_sort(
          transform(sequence(lit(1), size(bnd) - 1), j => struct(
            (element_at(bnd, j + 1) - element_at(bnd, j)).as("n"),
            element_at(sorted, element_at(bnd, j)).as("tri"))),
          // (count desc, tri asc) — the identical rank key
          // q_lang_trigram's row_number uses
          (a, b) => when(a("n") > b("n"), -1).when(a("n") < b("n"), 1)
            .when(a("tri") < b("tri"), -1).when(a("tri") > b("tri"), 1)
            .otherwise(0)))
        .otherwise(array().cast("array<struct<n:int,tri:string>>")))
      .withColumn("__tlid_ranked",
        transform(slice(col("__tlid_cnt"), 1, r), (s, i) =>
          struct(s("tri").as("tri"), (i + 1).cast("long").as("rk"))))
      .withColumn(outCol, when(size(ranked) === 0, lit("und"))
        .otherwise(array_min(array(scored: _*))("cand")))
      .drop("__tlid_t", "__tlid_chars", "__tlid_tris", "__tlid_sorted",
        "__tlid_bnd", "__tlid_cnt", "__tlid_ranked")
  }

  /** The Gopher quality-rule flags (Rae et al. Table A1 subset —
    * word count, mean word length, symbol ratio, alpha fraction,
    * stopword floor), shared verbatim by q_gopher_rules (the census)
    * and the config `gopher_gate` processor (the filter) so the two
    * surfaces can never drift. */
  def gopherFlags(text: Column): Seq[(String, Column)] = {
    val ws = tokens(text)
    val nW = size(ws)
    val meanLen = avgTokenLen(text)
    val hashes = length(text) - length(regexp_replace(text, "#", ""))
    val ellipses = (length(text) -
      length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    val symRatio = (hashes + ellipses) / nW
    val alphaFrac = size(filter(ws, w => w.rlike("[a-z]"))).cast("double") / nW
    val stopCount = size(filter(ws, w => w.isInCollection(EnStop)))
    Seq(
      "r_wc" -> (nW >= 50 && nW <= 100000),
      "r_mwl" -> (meanLen >= 3.0 && meanLen <= 10.0),
      "r_sym" -> (symRatio <= 0.1),
      "r_alpha" -> (alphaFrac >= 0.8),
      "r_stop" -> (stopCount >= 2))
  }

  /** The Gopher REPETITION signals (Rae et al. 2021, Table A1's
    * repetitious-text block, completing [[gopherFlags]]'s subset):
    * duplicate line/paragraph fraction, duplicate line/paragraph
    * CHARACTER fraction, and the character share of the most
    * frequent {2,3,4}-gram, and the duplicate-{5..10}-gram character
    * fractions (occurrence mass of n-grams appearing 2+ times over
    * total token chars — overlapping occurrences each count, so the
    * ratio may exceed 1 on degenerate text; the DuckDB twin runs the
    * identical accounting), as one struct column with thirteen DOUBLE
    * fields. The synthetic corpus carries no newlines, so "lines"
    * are synthesized deterministically as 8-token chunks and
    * "paragraphs" as 32-token chunks — the DuckDB oracle runs the
    * identical synthesis (the q_pii_redact discipline: the operator
    * under test is the signal kernel, not the corpus's line
    * structure). Everything is per-doc higher-order expressions:
    * duplicate mass via size/length deltas against array_distinct
    * (Σ(count−1)·len = total − distinct, in one pass), the top-gram
    * char mass via a sorted run-length fold (run length × gram chars
    * excluding separators, maxed). Nothing leaves the projection —
    * a consumer's only shuffle is its own census aggregate.
    * `ws` must NAME a non-empty token array column. */
  def repetitionSignals(ws: String): Column =
    // r19: the ~9 interpreted sorted gram walks per doc collapsed
    // into ONE native pass (repetition_signals — the old SQL
    // expression lives on verbatim in KernelPropertySpec as the
    // parity reference; the run-length folds only used run counts ×
    // per-gram char mass, so hash counting is exactly equivalent)
    graft.functions.HashExprs.repetition_signals(col(ws))

  /** quality class from simple, portable signals */
  def qualityClass(nTokens: Column, avgLen: Column, stopRatio: Column): Column =
    when(nTokens >= lit(60) && avgLen >= lit(4.0) && stopRatio <= lit(0.3), lit("high"))
      .when(nTokens >= lit(20), lit("medium"))
      .otherwise(lit("low"))

  /** Self-trained bigram-LM fluency score — the CCNet/Gopher-style
    * language-model quality filter: add-one-smoothed
    * p(w_i | w_{i-1}) from the corpus's OWN bigram/prefix counts,
    * averaged per document. Predictable prose scores high; word soup
    * and boilerplate glue score low. The arithmetic-mean form (not
    * log-perplexity) keeps every operation libm-free so the DuckDB
    * oracle is bit-exact; a geometric mean ranks the same way, the
    * class boundary just moves.
    *
    * Scale shape: the bigram explode is map-side; the two count
    * tables are plain aggregates shuffled on their own keys, and the
    * join-back co-partitions on those keys; vocab is one exact
    * distinct count (swap ScaleOps.approxDistinct in at 100 TB —
    * smoothing doesn't care about the last few vocab entries).
    */
  def lmBigramScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 2)
    val big = toks
      .withColumn("__a", slice(col("__t"), lit(1), size(col("__t")) - 1))
      .withColumn("__b", slice(col("__t"), lit(2), size(col("__t")) - 1))
      .select(col(idCol), explode(arrays_zip(col("__a"), col("__b"))).as("__pr"))
      .select(col(idCol), col("__pr.__a").as("__w1"), col("__pr.__b").as("__w2"))
    val bc = big.groupBy(col("__w1"), col("__w2")).agg(count(lit(1)).as("__c12"))
    val uc = big.groupBy(col("__w1")).agg(count(lit(1)).as("__c1"))
    val vocab = docs.select(explode(tokens(col(textCol))).as("__term"))
      .agg(countDistinct(col("__term")).cast("double").as("__v"))
    big.join(bc, Seq("__w1", "__w2")).join(uc, Seq("__w1")).crossJoin(vocab)
      .withColumn("__p",
        (col("__c12").cast("double") + lit(1.0)) /
          (col("__c1").cast("double") + col("__v")))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        (graft.QUtil.dsum(col("__p")) / count(lit(1)).cast("double")).as("lm_score"))
  }

  /** DSIR-shaped importance weights (public method: "Data Selection
    * for Language Models via Importance Resampling", Xie et al. 2023):
    * hashed n-gram features estimate how target-like each document
    * is, and the weights drive resampling of a raw corpus toward a
    * target distribution (e.g. books+wiki) at 100 TB, where training
    * a classifier per candidate doc is infeasible but counting hashed
    * bigrams is one aggregate.
    *
    * Features are word bigrams hashed into `buckets` via the
    * md5-portable 32-bit kernel (engine-identical; the xxh64 swap is
    * the scale path, same discipline as shardId). One pass builds
    * BOTH count tables — target mass as a conditional sum riding the
    * total count. Each document then scores
    * (Σ_f target(f) + 1) / (Σ_f total(f) + 2) over its own feature
    * multiset — the ratio-of-sums surrogate for DSIR's mean log
    * ratio: integer sums stay exact, the single final division is
    * correctly-rounded IEEE, so the oracle is bit-exact where a
    * log-space estimator would drift in the last ulp.
    *
    * Scale shape: the bigram explode is map-side; the feature-count
    * aggregate shuffles (bucket id, two longs); the join-back carries
    * (doc id, bucket id) pairs — 16 bytes per feature occurrence,
    * never text. `buckets` bounds the count table at any corpus size.
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  targetPred: Column, buckets: Int = 4096): DataFrame = {
    val toks = docs.select(col(idCol), targetPred.as("__target"),
        tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 2)
    val feats = toks
      .withColumn("__a", slice(col("__t"), lit(1), size(col("__t")) - 1))
      .withColumn("__b", slice(col("__t"), lit(2), size(col("__t")) - 1))
      .select(col(idCol), col("__target"),
        explode(arrays_zip(col("__a"), col("__b"))).as("__pr"))
      .select(col(idCol), col("__target"),
        pmod(conv(substring(md5(concat_ws(" ",
            col("__pr.__a"), col("__pr.__b"))), 1, 8), 16, 10).cast("long"),
          lit(buckets.toLong)).as("__f"))
    val counts = feats.groupBy(col("__f")).agg(
      sum(when(col("__target"), 1L).otherwise(0L)).as("__nt"),
      count(lit(1)).as("__na"))
    feats.join(counts, Seq("__f"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_feats"),
        (sum(col("__nt")) + lit(1L)).as("target_mass"),
        (sum(col("__na")) + lit(2L)).as("total_mass"))
      .withColumn("weight",
        col("target_mass").cast("double") / col("total_mass").cast("double"))
  }

  /** BM25 relevance scoring of every document against a bounded query
    * term set — the retrieval/mining primitive of a training-data
    * pipeline (mine a 100 TB corpus for documents relevant to a seed
    * query, rank domain matches). Shape at scale: tokenize+explode is
    * map-side, and the posting FILTER to the query terms sits inside
    * it, so the one wide op (groupBy doc,term) carries only hits —
    * proportional to matches, never to corpus tokens; document length
    * stays exact integer; the corpus scalars (N, avgdl) are one tiny
    * aggregate cross-joined in (stats broadcast it, q22 discipline).
    *
    * idf uses the RATIONAL form (N - df + 0.5)/(df + 0.5): BM25's
    * log-idf is monotone in it, so per-term ranking is unchanged, and
    * staying libm-free keeps every operation IEEE-exact and
    * bit-identical in the DuckDB oracle (JVM Math.log is not
    * correctly rounded — ln() would drift in the last ulp). The
    * per-doc sum routes through DECIMAL(28,8) like every cross-row
    * double sum in the repo.
    *
    * k1/b arrive as separate literal terms (k1 + 1.0 is computed in
    * the PLAN, mirroring the oracle's text) so both engines run the
    * identical float expression tree.
    */
  /** CCNet-style perplexity bucketing (public method: "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data", Wenzek et al. 2020): score every document with the
    * corpus-trained LM and split the corpus into head / middle /
    * tail THIRDS by fluency rank — the standard crawl-curation cut
    * that keeps the head, samples the middle, drops the tail.
    *
    * The score is [[lmBigramScore]]'s arithmetic-mean bigram
    * probability (monotone in fluency, libm-free — CCNet's perplexity
    * is exp of a mean log prob; a monotone transform preserves every
    * rank, so the BUCKETS are identical while staying bit-exact under
    * the oracle). Assignment is by integer rank, not by score
    * thresholds: rank r of n (ordered score DESC, id ASC) → head if
    * 3r ≤ n, middle if 3r ≤ 2n, else tail — no floating-point
    * percentile boundary to disagree across engines.
    *
    * Scale shape: ranking is [[ScaleOps.globalRank]] (percentile
    * buckets + driver offsets — no single-partition window); the
    * total count rides a 1-row broadcast crossJoin. Only (id, score,
    * rank) move — never text. */
  def perplexityBuckets(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    // globalRank needs two driver actions (percentile cuts + bucket
    // counts) before the consumer's own — localCheckpoint the scored
    // frame once so the LM pipeline (two corpus-count joins) never
    // re-executes per action (the systematicResample discipline)
    val scored = lmBigramScore(docs, idCol, textCol).localCheckpoint()
    val n = scored.agg(count(lit(1)).as("__n"))
    val ranked = ScaleOps.globalRank(scored.crossJoin(n),
      negate(col("lm_score")), col(idCol), "ppl_rank")
    ranked.select(col(idCol), col("lm_score"), col("ppl_rank"),
      when(col("ppl_rank") * 3 <= col("__n"), lit("head"))
        .when(col("ppl_rank") * 3 <= col("__n") * 2, lit("middle"))
        .otherwise(lit("tail")).as("ppl_bucket"))
  }

  /** Temperature-weighted domain mixture (public method: the
    * multinomial sampling-rate computation of multilingual/multi-
    * domain pretraining — e.g. "Cross-lingual Language Model
    * Pretraining", Conneau & Lample 2019, §3.1): per-domain token
    * share p_i, re-weighted q_i = p_i^τ / Σ p_j^τ, and the implied
    * per-domain epoch factor q_i / p_i capped at `epochCap` (a small
    * domain must not repeat unboundedly). τ is FIXED at 1/2 — sqrt
    * is correctly-rounded IEEE (bit-exact in every engine) where
    * pow(x, τ) is libm and is not; τ=0.5 is also squarely in the
    * published range (0.3–0.7).
    *
    * Scale shape: one aggregate per domain (token counting is
    * map-side), then arithmetic over the #domains-row frame with the
    * grand totals riding 1-row broadcast crossJoins. The Σ p_j^τ
    * normalizer goes through DECIMAL(28,8) ([[graft.QUtil.dsum]]) so
    * the cross-row double sum is order-independent. */
  def domainMixture(docs: DataFrame, domainCol: String, textCol: String,
                    epochCap: Double = 4.0): DataFrame = {
    val perDomain = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol)).cast("long")).as("total_tokens"))
    val grand = perDomain.agg(sum(col("total_tokens")).as("__tot"))
    val shared = perDomain.crossJoin(grand)
      .withColumn("token_share",
        col("total_tokens").cast("double") / col("__tot").cast("double"))
      .withColumn("__w", sqrt(col("token_share")))
    val norm = shared.agg(graft.QUtil.dsum(col("__w")).as("__sw"))
    shared.crossJoin(norm)
      .withColumn("mix_weight", col("__w") / col("__sw"))
      .select(col(domainCol), col("n_docs"), col("total_tokens"),
        col("token_share"), col("mix_weight"),
        least(lit(epochCap),
          col("mix_weight") / col("token_share")).as("epochs"))
  }

  /** Training-sequence chunking: split every document into
    * `maxLen`-token windows advancing by `stride` tokens (stride <
    * maxLen → overlapping context, the standard long-document prep
    * before packing; [[graft.operators.ScaleOps.packSequences]] is
    * the complementary op for SHORT documents). Emits one row per
    * chunk with its position metadata and reassembled text.
    *
    * Chunk count is 1 + ⌈max(0, n − maxLen) / stride⌉ — the final
    * window is allowed to be short rather than dropping tail tokens
    * (lossless coverage; a trainer that wants full windows filters
    * n_tok = maxLen). All-integer arithmetic, engine-exact.
    *
    * Scale shape: tokenize + explode is one map-side transform —
    * chunking shuffles NOTHING (no aggregate, no join); output size
    * is corpus × (1 + overlap share). */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
                maxLen: Int, stride: Int): DataFrame = {
    require(maxLen > 0 && stride > 0 && stride <= maxLen,
      s"need 0 < stride <= maxLen, got maxLen=$maxLen stride=$stride")
    val toks = docs.select(col(idCol), tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) >= 1)
    val n = size(col("__t"))
    // ⌈(n - maxLen) / stride⌉ via the exact double-division trick the
    // segmenters use (int-sized counts, truncation = floor)
    val extra = when(n > maxLen,
      ((n - lit(maxLen) + lit(stride - 1)) / lit(stride)).cast("int"))
      .otherwise(lit(0))
    toks.select(col(idCol), col("__t"), n.as("__n"),
        explode(sequence(lit(0), extra)).as("__ci"))
      .select(col(idCol),
        col("__ci").cast("long").as("chunk_id"),
        (col("__ci") * stride).cast("long").as("start_tok"),
        least(lit(maxLen), col("__n") - col("__ci") * stride).cast("long")
          .as("n_tok"),
        concat_ws(" ", slice(col("__t"), col("__ci") * stride + 1,
          least(lit(maxLen), col("__n") - col("__ci") * stride)))
          .as("chunk_text"))
  }

  /** HTML→clean-text extraction — the stage UPSTREAM of every
    * web-corpus operator in the pipeline (the trafilatura/C4 step):
    * drop script/style payloads, convert block-level tags to line
    * breaks, strip remaining tags, decode the common entities.
    * Pure regex column kernels: map-side, zero shuffle, and every
    * pattern is RE2-and-Java-identical so the DuckDB oracle can run
    * the same extraction verbatim. (The collector reference has no
    * analog — it consumes structured signals; this serves the
    * LLM-data-pipeline side.) */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?s)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val blocks = regexp_replace(noScript,
      "<(/?)(p|div|br|h1|h2|h3|li|ul|ol|tr|table|nav|footer|header)[^>]*>", "\n")
    val noTags = regexp_replace(blocks, "<[^>]*>", "")
    // entity decode; &amp; LAST so &amp;lt; decodes to the literal <
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(regexp_replace(noTags,
        "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&#39;", "'"),
      "&nbsp;", " "), "&amp;", "&")
  }

  /** [[htmlToText]] plus the line-level boilerplate filter: split on
    * the block-break lines, trim, drop empties, keep only lines with
    * at least `minWords` whitespace-words (nav items, footers, and
    * button labels die here — the C4 line filter). Reports per-doc
    * raw/kept line counts, kept-text length, and an md5 of the kept
    * text (portable exactness witness). Map-side only. */
  def htmlExtract(df: DataFrame, idCol: String, htmlCol: String,
                  minWords: Int = 5): DataFrame = {
    val txt = htmlToText(col(htmlCol))
    val lines = filter(transform(split(txt, "\n"), l => trim(l)),
      l => l =!= "")
    val kept = filter(lines, l => size(split(l, " +")) >= minWords)
    df.select(col(idCol), lines.as("__lines"), kept.as("__kept"))
      .select(col(idCol),
        size(col("__lines")).cast("long").as("n_lines"),
        size(col("__kept")).cast("long").as("n_kept"),
        length(array_join(col("__kept"), "\n")).cast("long").as("n_chars"),
        md5(array_join(col("__kept"), "\n")).as("text_md5"))
  }

  /** Unicode confusable folding — the decode-layer normalization
    * every web corpus runs before tokenization (smart punctuation
    * and invisible characters otherwise split the vocabulary:
    * "don’t" and "don't" become distinct tokens): curly
    * single/double quotes → ASCII quotes, en/em/figure dashes → '-',
    * NBSP → space, zero-width space/joiners/BOM stripped. Pure
    * chained regexp_replace over DISJOINT character classes (order
    * can't matter), map-side, and every class is RE2-and-Java
    * identical so the DuckDB oracle runs the same folding verbatim. */
  def normalizeConfusables(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(text,
        "[\u2018\u2019\u02BC]", "'"), // curly/modifier apostrophes
      "[\u201C\u201D]", "\""),        // curly double quotes
      "[\u2012\u2013\u2014]", "-"),   // figure/en/em dashes
      "\u00A0", " "),                   // no-break space
      "[\u200B\u200C\u200D\uFEFF]", "") // zero-widths + BOM

  /** the mojibake repair table — ONE table behind q_text_fix (the
    * census query AND its DuckDB oracle via [[mojibakeFixSqlOf]])
    * and the `text_fix` config stage (via [[fixMojibake]]): the
    * double-encoded UTF-8 class (bytes written UTF-8, read back
    * latin-1/cp1252, re-encoded) — five 2-char accent digraphs and
    * three 3-char cp1252 punctuation trigraphs. Trigraphs share no
    * prefix with the digraphs (lead chars â vs Ã), so chain order
    * is free. */
  val mojibakePairs: Seq[(String, String)] = Seq(
    "\u00C3\u00A9" -> "\u00E9", "\u00C3\u00A8" -> "\u00E8",
    "\u00C3\u00BC" -> "\u00FC", "\u00C3\u00B1" -> "\u00F1",
    "\u00C3\u00A7" -> "\u00E7",
    "\u00E2\u20AC\u2122" -> "\u2019",
    "\u00E2\u20AC\u0153" -> "\u201C",
    "\u00E2\u20AC\u201D" -> "\u2014")

  /** the repair as a Column chain (the `text_fix` stage's form) —
    * literal-for-literal the same replace() tree as the SQL
    * fragment, so stage and census cannot drift (spec-pinned) */
  def fixMojibake(text: Column): Column =
    mojibakePairs.foldLeft(text) { case (acc, (from, to)) =>
      replace(acc, lit(from), lit(to))
    }

  /** the repair as ONE SQL fragment over column `col` — shared
    * verbatim by the q_text_fix Spark expr and its DuckDB oracle
    * (the Bm25AggCtes one-copy discipline) */
  def mojibakeFixSqlOf(col: String): String =
    mojibakePairs.foldLeft(col) { case (acc, (from, to)) =>
      s"replace($acc, '$from', '$to')"
    }

  /** the PII mask regexes — ONE set behind q_pii_redact (query +
    * oracle, interpolated) and the `pii_scrub` config stage; all
    * three are RE2-and-Java identical (char classes, bounded
    * repetition, `\b` ASCII word boundaries — no lookaround).
    *
    * Email: case-insensitive by class (not `(?i)` — identical
    * semantics both engines without flag-syntax risk), dotted /
    * `+`-tagged / `%`-escaped local parts, multi-label domains
    * ("First.Last+tag@Sub.Example.co.uk" masks). IPv4: octets
    * bounded to 0-255 (the r17 verdict fix — "999.1.1.1" is NOT an
    * address and must not mask as one) and `\b`-anchored so an
    * in-range suffix of an out-of-range run can't match. Phone:
    * E.164 international form (leading '+') by design — bare
    * national numbers and separator-formatted digit groups fall
    * through to the generic digit-run rule below, so they still
    * REDACT (as `<NUM>`), just under the generic label; the PHONE
    * class is deliberately the unambiguous international format. */
  val PiiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiIpRe = "\\b(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])" +
    "(\\.(25[0-5]|2[0-4][0-9]|1?[0-9]?[0-9])){3}\\b"
  val PiiPhoneRe = "\\+[0-9]{7,15}"

  /** the PII mask chain (q_pii_redact's audit kernel and the
    * `pii_scrub` stage share THIS expression): the specific masks
    * (email, IPv4, E.164 phone) run BEFORE the generic digit-run
    * rule, which would otherwise eat the octets/digits. The generic
    * rule doubles as the redaction backstop: any ≥3-digit run the
    * specific classes miss (national phone formats, account ids,
    * out-of-range fake IPs) leaves as `<NUM>`, never in clear. */
  def piiScrub(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(
      regexp_replace(text, PiiEmailRe, "<EMAIL>"),
      PiiIpRe, "<IP>"), PiiPhoneRe, "<PHONE>"),
      "[0-9]{3,}", "<NUM>")

  /** Content-type detector: code/table/prose from portable
    * character-class ratios — code-symbol density (≥ 50‰ of chars)
    * then digit density (≥ 150‰) then prose, all integer arithmetic
    * (hits·1000 vs chars·threshold — exact on both engines). The
    * batch census (q_content_type) and the streaming monitor share
    * THIS expression, so the routing rule cannot drift between the
    * two surfaces. */
  def contentType(text: Column): Column = {
    val chars = length(text)
    val codeSyms = chars - length(regexp_replace(text, "[;{}()=<>\\[\\]]", ""))
    val digits = chars - length(regexp_replace(text, "[0-9]", ""))
    // zero-length text first: 0 ≥ 0 would satisfy the code-density
    // test and route empty docs to the code pipeline (and make empty
    // classify differently from NULL, which falls through to prose)
    // — review-wave finding, mirrored in the DuckDB twin
    when(chars === 0, "prose")
      .when(codeSyms * 1000 >= chars * 50, "code")
      .when(digits * 1000 >= chars * 150, "table")
      .otherwise("prose")
  }

  /** URL canonicalization — the normalize step url-keyed dedup
    * assumes (every crawl pipeline runs one before refetch-dedup):
    * lowercase scheme+host, strip a leading www., drop the scheme's
    * DEFAULT port (explicit non-default ports survive), strip one
    * trailing path slash, drop the fragment, drop utm_* tracking
    * params and SORT the survivors. Pure map-side regexp parse +
    * string rebuild, zero shuffle; every pattern is
    * RE2-and-Java-identical so the DuckDB oracle runs the same
    * surgery verbatim. (No collector analog — LLM-pipeline side.) */
  def urlCanon(url: Column): Column = {
    // the fragment drops FIRST: RFC 3986 allows '?' inside a
    // fragment, so parsing the query from the raw string would
    // resurrect fragment text as query params ('/p#sec?a=1' must
    // canonicalize to '/p', not '/p?a=1' — review-wave finding,
    // property-swept)
    val nofrag = regexp_replace(url, "#.*", "")
    val scheme = lower(regexp_extract(nofrag, "^([^:]+)://", 1))
    val hostport = regexp_extract(nofrag, "^[^:]+://([^/?#]+)", 1)
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val path0 = regexp_extract(nofrag, "^[^:]+://[^/?#]+([^?#]*)", 1)
    val path = when(path0.endsWith("/") && length(path0) > 1,
      path0.substr(lit(1), length(path0) - 1)).otherwise(path0)
    val q = regexp_extract(nofrag, "\\?([^#]*)", 1)
    val qc = array_join(array_sort(filter(split(q, "&"),
      x => x =!= lit("") && !x.startsWith("utm_"))), "&")
    val portC = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    concat(scheme, lit("://"), urlHost(url), portC, path,
      when(qc =!= "", concat(lit("?"), qc)).otherwise(lit("")))
  }

  /** canonical host of a URL: lowercased, port and leading www.
    * stripped (the [[urlCanon]] host rule, exposed for host-keyed
    * censuses) */
  def urlHost(url: Column): Column = {
    val hostport = regexp_extract(url, "^[^:]+://([^/?#]+)", 1)
    regexp_replace(lower(regexp_extract(hostport, "^([^:]+)", 1)),
      "^www\\.", "")
  }

  /** BM25's per-(doc, term) aggregate frame — tf, dft, dl, corpus N
    * and avgdl joined per hit; the ONE corpus pass [[bm25]] and the
    * (k1, b) tuning sweep both score from, so the scorer and its
    * dial table cannot drift. */
  def bm25Hits(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String]): DataFrame = {
    val toks = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
    val dl = toks.select(col(idCol), size(col("__toks")).cast("long").as("__dl"))
    // N and avgdl: integer-exact inputs, one one-row aggregate
    val stats = dl.agg(count(lit(1)).cast("double").as("__n"),
      (sum(col("__dl")).cast("double") / count(lit(1)).cast("double")).as("__avgdl"))
    val hits = toks.select(col(idCol), explode(col("__toks")).as("__term"))
      .filter(col("__term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("__term"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    val dft = hits.groupBy(col("__term"))
      .agg(count(lit(1)).cast("double").as("__dft"))
    hits.join(dft, "__term")
      .join(dl, idCol)
      .crossJoin(stats)
  }

  /** the Robertson idf × saturation term with (k1, b) as COLUMNS —
    * literal for the flagship, grid-joined for the sweep; the
    * identical expression tree both ways (and in the DuckDB twins) */
  def bm25TermScore(k1: Column, b: Column): Column =
    ((col("__n") - col("__dft") + lit(0.5)) / (col("__dft") + lit(0.5))) *
      (col("__tf") * (k1 + lit(1.0))) /
      (col("__tf") + k1 *
        (lit(1.0) - b + b * (col("__dl").cast("double") / col("__avgdl"))))

  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Hits(docs, idCol, textCol, queryTerms)
      .withColumn("__s", bm25TermScore(lit(k1), lit(b)))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"), graft.QUtil.dsum(col("__s")).as("score"))

  /** Printable-ASCII word filter shared by the BPE surfaces so the
    * char-split semantics match DuckDB's code-point split exactly
    * (Java chars are UTF-16 units; outside ASCII the two engines
    * would disagree on "characters"). */
  private val asciiWord = "^[!-~]+$"

  /** per-word symbol-pair counts weighted by word frequency — BPE
    * training's inner statistic, exposed for the oracle-checked
    * first iteration (q_bpe_pairs) and reused each [[bpeTrain]]
    * round. `words` = (wc, syms). */
  private def pairCounts(words: DataFrame): DataFrame =
    words.filter(size(col("syms")) >= 2)
      .select(col("wc"), explode(transform(
        sequence(lit(1), size(col("syms")) - 1),
        i => struct(element_at(col("syms"), i).as("l"),
                    element_at(col("syms"), i + 1).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("wc")).as("cnt"))

  /** the distinct-word × frequency histogram of a corpus — THE one
    * corpus-sized pass behind bpeTrain and vocabBudgetReport; callers
    * composing both (q_vocab_budget) checkpoint THIS frame and pass
    * it down so the corpus is genuinely scanned once (review-wave
    * finding: train + report each rebuilding it silently doubled the
    * data-sized pass). Columns (word, wc). */
  def wordHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(tokens(col(textCol))).as("word"))
      .filter(col("word").rlike(asciiWord))
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))

  /** word-frequency vocab of a corpus, chars as initial symbols */
  def bpeVocab(docs: DataFrame, textCol: String): DataFrame =
    wordHistogram(docs, textCol)
      .select(col("wc"), split(col("word"), "").as("syms"))

  /** first-iteration pair statistics, the sql-oracled slice */
  def bpePairCounts(docs: DataFrame, textCol: String, topK: Int): DataFrame =
    pairCounts(bpeVocab(docs, textCol))
      .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
      .limit(topK)

  /** BPE merge training (Sennrich et al. 2016, "Neural Machine
    * Translation of Rare Words with Subword Units" — the algorithm,
    * from the paper). Scale shape: the CORPUS is touched exactly
    * once — the word-frequency aggregate, the only data-sized pass
    * at 100 TB — and Spark job count is O(1), INDEPENDENT of
    * `nMerges`. The vocab (distinct printable-ASCII words × counts)
    * is bounded by construction (~100 MB at web scale), so it is
    * collected under an explicit cap — the same bounded-collect
    * discipline as DedupOps.connectedComponents' ≤2M-edge
    * union-find — and the merge loop runs driver-side in memory:
    * incremental pair-count maintenance (only words containing the
    * merged pair are rewritten) plus a lazy-deletion max-heap for
    * the argmax, so a 50k-merge tokenizer trains in seconds, not
    * 2 Spark jobs per merge. [[bpePairCounts]] stays the
    * distributed, sql-oracled statistic kernel.
    *
    * Argmax tie-break matches the distributed kernel exactly:
    * count desc, then (left, right) lexicographic asc. The merge
    * rewrite is the same greedy left-to-right scan as
    * [[graft.functions.HashExprs.merge_pair]].
    *
    * Returns the merge table (rank, left, right, merged, pair_count)
    * — the training artifact a tokenizer consumes, in merge order.
    * Stops early when no pair reaches `minCount`.
    */
  def bpeTrain(docs: DataFrame, textCol: String, nMerges: Int,
               minCount: Long = 2L, maxVocab: Int = 2000000): DataFrame =
    bpeTrainFrom(wordHistogram(docs, textCol), nMerges, minCount, maxVocab)

  /** [[bpeTrain]] from a pre-built (word, wc) histogram — the seam a
    * caller sharing the histogram with another consumer uses
    * (q_vocab_budget: one checkpointed histogram feeds train AND
    * report, so the corpus is scanned once) */
  def bpeTrainFrom(hist: DataFrame, nMerges: Int,
                   minCount: Long = 2L, maxVocab: Int = 2000000): DataFrame = {
    val sp = hist.sparkSession
    // the one corpus-sized Spark pass; limit(cap+1) bounds the fetch
    // so an over-cap vocab raises instead of OOMing the driver
    val vocabRows = hist
      .select(col("wc"), split(col("word"), "").as("syms"))
      .limit(maxVocab + 1).collect()
    require(vocabRows.length <= maxVocab,
      s"bpeTrain: vocab exceeds maxVocab=$maxVocab distinct words; " +
        "raise the cap or pre-filter the corpus")
    val wc = vocabRows.map(_.getLong(0))
    val words: Array[Array[String]] =
      vocabRows.map(_.getSeq[String](1).toArray)

    // pair -> weighted count, and pair -> word indices containing it
    val cnt = scala.collection.mutable.HashMap[(String, String), Long]()
    val occ = scala.collection.mutable.HashMap[(String, String),
      scala.collection.mutable.HashSet[Int]]()
    // lazy-deletion heap: (count, l, r); stale entries are skipped
    // when their count no longer matches the live map
    val heapOrd = new Ordering[(Long, String, String)] {
      def compare(a: (Long, String, String), b: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c
        else {
          val cl = b._2.compareTo(a._2) // smaller l = higher priority
          if (cl != 0) cl else b._3.compareTo(a._3)
        }
      }
    }
    val heap = scala.collection.mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)

    def wordPairs(syms: Array[String]): Iterator[(String, String)] =
      if (syms.length < 2) Iterator.empty
      else (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1)))
    def addWord(i: Int): Unit = wordPairs(words(i)).foreach { p =>
      val c = cnt.getOrElse(p, 0L) + wc(i)
      cnt(p) = c
      occ.getOrElseUpdate(p, scala.collection.mutable.HashSet.empty) += i
      heap.enqueue((c, p._1, p._2))
    }
    def dropWord(i: Int): Unit = wordPairs(words(i)).foreach { p =>
      val c = cnt(p) - wc(i)
      if (c == 0L) { cnt.remove(p); occ.remove(p) }
      else {
        cnt(p) = c
        val s = occ(p); s -= i
        heap.enqueue((c, p._1, p._2)) // refresh so the live count surfaces
      }
    }
    // same greedy left-to-right scan as the merge_pair codegen kernel
    def mergeWord(syms: Array[String], l: String, r: String): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
          out += (l + r); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toArray
    }

    words.indices.foreach(addWord)
    val merges = scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Long)]()
    var rank = 1L
    var done = false
    while (!done && rank <= nMerges) {
      // pop stale entries until one matches its live count
      var best: Option[(Long, String, String)] = None
      while (best.isEmpty && heap.nonEmpty) {
        val e = heap.dequeue()
        if (cnt.get((e._2, e._3)).contains(e._1)) best = Some(e)
      }
      best match {
        case Some((c, l, r)) if c >= minCount =>
          merges += ((rank, l, r, l + r, c))
          val affected = occ.get((l, r)).map(_.toArray).getOrElse(Array.empty)
          affected.foreach { i =>
            dropWord(i)
            words(i) = mergeWord(words(i), l, r)
            addWord(i)
          }
          rank += 1L
        case _ => done = true
      }
    }
    import sp.implicits._
    merges.toSeq.toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** BPE-encode a corpus with a trained merge table: per document,
    * tokenize, char-split each word, apply the merges in rank order
    * (one [[graft.functions.HashExprs.bpe_apply]] kernel call per
    * word — the table rides as a single codegen reference object),
    * and report the compression the subword vocabulary achieves.
    * Map-side only: no shuffle except the final count-free projection
    * the caller adds; the merge table is driver-held and broadcast
    * with the plan (50k merges ≈ a few hundred KB).
    */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
                merges: Seq[(String, String)]): DataFrame = {
    val enc = explode(transform(
      filter(tokens(col(textCol)), w => w.rlike(asciiWord)),
      w => graft.functions.HashExprs.bpe_apply(split(w, ""), merges)))
    docs.select(col(idCol), enc.as("subwords"))
      .select(col(idCol),
        size(col("subwords")).as("n_subwords"),
        aggregate(col("subwords"), lit(0),
          (acc, s) => acc + length(s)).as("n_chars"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_subwords")).as("n_subwords"),
        sum(col("n_chars")).as("n_chars"))
  }

  /** Tokenizer-BUDGET report (r16 verdict #7): the OOV-at-budget
    * measurement read against the TRAINED vocabulary rather than the
    * raw top-B corpus word list (q_vocab_oov) — the table a
    * tokenizer-size decision actually consumes. Budgets are RANK
    * PREFIXES of ONE trained merge table (the sweep discipline:
    * merge rank m's vocab nests inside m+1's by construction), so
    * whole-word coverage is monotone nondecreasing and fertility
    * monotone nonincreasing BY THEOREM — spec-pinned, and the full
    * budget anchors bit-equal to q_bpe_encode's corpus totals.
    *
    * Scale shape: the corpus is touched ZERO extra times — every leg
    * reads the checkpointed word HISTOGRAM (distinct word × freq,
    * the bpeTrain bound), re-encoding each distinct word per budget
    * with the merge prefix as a codegen reference object; corpus
    * subword totals are freq-weighted sums over that vocab-sized
    * frame. Per budget: trained pieces (alphabet + distinct merge
    * outputs), whole-word coverage (occurrences + types encoding to
    * ONE piece — BPE never hard-OOVs inside ASCII, so "OOV" is the
    * fertility cost, reported alongside). */
  def vocabBudgetReport(docs: DataFrame, textCol: String,
                        merges: Seq[(String, String)],
                        budgets: Seq[Int]): DataFrame =
    // materialize here: the From-variant's contract is a histogram
    // that is already cheap to re-read (every budget leg re-reads it)
    vocabBudgetReportFrom(wordHistogram(docs, textCol).localCheckpoint(),
      merges, budgets)

  /** [[vocabBudgetReport]] from a pre-built (word, wc) histogram —
    * share ONE checkpointed histogram with [[bpeTrainFrom]] and the
    * corpus is genuinely scanned once (q_vocab_budget's composition;
    * review-wave finding: the report silently rebuilt the
    * data-sized pass the train had already made).
    *
    * CONTRACT: `hist` must already be materialized (localCheckpoint
    * or equivalent) — every budget leg re-reads it, and this method
    * deliberately adds NO checkpoint of its own (r17 advice: the
    * inner re-checkpoint materialized the same vocab-sized frame a
    * second time when the caller had already done so, contradicting
    * the PLANS one-materialization audit). [[vocabBudgetReport]] and
    * q_vocab_budget both honor the contract. */
  def vocabBudgetReportFrom(hist: DataFrame,
                            merges: Seq[(String, String)],
                            budgets: Seq[Int]): DataFrame = {
    require(budgets.nonEmpty,
      "vocabBudgetReport: budgets must be non-empty (merge-prefix sizes)")
    val words = hist.select(col("word").as("w"), col("wc").as("tf"))
    // the alphabet is data-derived and bounded (printable ASCII ≤ 94)
    val nChars = words
      .select(explode(split(col("w"), "")).as("c"))
      .agg(count_distinct(col("c"))).head().getLong(0)
    val legs = budgets.map { m =>
      // bpeTrain stops early when no pair reaches minCount, so a
      // requested budget can exceed the trained table; take() clamps
      // silently — effective_merges makes a clamped leg
      // distinguishable from a real plateau in the report itself
      // (r17 advice: two legs labeled 40 and 50 over a 32-merge
      // table would otherwise read as a fabricated flat tail)
      val prefix = merges.take(m)
      // two different merges can concatenate to the same string
      // ((a,bc) and (ab,c) both read "abc") — count pieces distinct
      val pieceSet = prefix.map { case (l, r) => l + r }.distinct
      val ns = if (m == 0) size(split(col("w"), ""))
        else size(graft.functions.HashExprs.bpe_apply(
          split(col("w"), ""), prefix))
      // whole-word = encodes to ONE piece — measured off the encode
      // itself (np = 1), never an isInCollection over the piece set:
      // a 50k-merge vocabulary must not inline into the plan as an
      // In-list (the BpeApply reference-object discipline; the
      // merges already ride as ONE codegen object) — review wave
      words.select(col("tf"), ns.as("np"))
        .agg(
          coalesce(sum(when(col("np") === 1, col("tf")).otherwise(0L)),
            lit(0L)).cast("long").as("whole_word_tokens"),
          coalesce(sum(when(col("np") === 1, 1L).otherwise(0L)), lit(0L))
            .cast("long").as("whole_word_types"),
          coalesce(sum(col("tf")), lit(0L)).cast("long").as("total_tokens"),
          count(lit(1)).cast("long").as("total_types"),
          coalesce(sum(col("tf") * col("np")), lit(0L)).cast("long")
            .as("total_subwords"))
        .withColumn("budget_merges", lit(m.toLong))
        .withColumn("effective_merges", lit(prefix.length.toLong))
        .withColumn("vocab_pieces", lit(nChars + pieceSet.size))
    }
    legs.reduce(_.unionByName(_))
      // an empty/fully-non-ASCII corpus reports 0 rates, not nulls
      .withColumn("coverage_rate", when(col("total_tokens") === 0, lit(0.0))
        .otherwise(col("whole_word_tokens").cast("double") /
          col("total_tokens").cast("double")))
      .withColumn("fertility", when(col("total_tokens") === 0, lit(0.0))
        .otherwise(col("total_subwords").cast("double") /
          col("total_tokens").cast("double")))
      .select(col("budget_merges"), col("effective_merges"),
        col("vocab_pieces"),
        col("whole_word_tokens"), col("whole_word_types"),
        col("total_tokens"), col("total_types"), col("total_subwords"),
        col("coverage_rate"), col("fertility"))
  }

  /** Unigram-LM subword tokenizer training (Kudo 2018, "Subword
    * Regularization: Improving Neural Network Translation Models
    * with Multiple Subword Candidates" — the SentencePiece unigram
    * algorithm, from the paper, with hard-EM Viterbi counts instead
    * of lattice forward-backward: deterministic, and the decode a
    * tokenizer actually applies). Scale shape mirrors [[bpeTrain]]:
    * the CORPUS is touched exactly once — the word-frequency
    * aggregate, the only data-sized pass at 100 TB — the bounded
    * vocab collects under an explicit cap, and the seed/EM/prune
    * loop runs driver-side in memory; Spark job count is O(1),
    * independent of emIters.
    *
    * Steps: (1) seed = every corpus code point (mandatory, full
    * coverage) + the top multi-char substrings (length ≤ maxPieceLen)
    * by freq·length over the word histogram (4× the multi-piece
    * budget); (2) hard-EM rounds: E = Viterbi-segment each distinct
    * word under current piece log-probs (the SAME
    * [[graft.functions.impl.Kernels.viterbiSegment]] kernel the
    * distributed encode runs — train and apply cannot disagree),
    * counts weighted by word freq; M = prob = count/total, zero-count
    * multi-char pieces drop, zero-count single chars keep a half-count
    * floor (coverage must survive); (3) after half the rounds, prune
    * multi-char pieces to the vocabSize budget by (count desc, piece
    * asc) and finish the remaining rounds on the final vocabulary.
    *
    * Returns (piece, n_chars, count, prob) — the trained vocabulary
    * with its final E-step counts; rows ≤ vocabSize.
    */
  def unigramTrain(docs: DataFrame, textCol: String, vocabSize: Int,
                   maxPieceLen: Int = 6, emIters: Int = 4,
                   maxVocab: Int = 2000000): DataFrame =
    unigramTrainFrom(wordHistogram(docs, textCol), vocabSize,
      maxPieceLen, emIters, maxVocab)

  /** [[unigramTrain]] from a pre-built (word, wc) histogram — the
    * bpeTrainFrom seam on the unigram family: a caller composing
    * train + report (q_unigram_budget) checkpoints ONE histogram and
    * passes it to both, so the corpus is scanned once. */
  def unigramTrainFrom(hist: DataFrame, vocabSize: Int,
                       maxPieceLen: Int = 6, emIters: Int = 4,
                       maxVocab: Int = 2000000): DataFrame = {
    val sp = hist.sparkSession
    val vocabRows = hist.select(col("word"), col("wc"))
      .limit(maxVocab + 1).collect()
    require(vocabRows.length <= maxVocab,
      s"unigramTrain: vocab exceeds maxVocab=$maxVocab distinct words; " +
        "raise the cap or pre-filter the corpus")
    // collect order is not deterministic — sort before anything depends on it
    val words: Array[(String, Long)] = vocabRows
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)

    // seed: all single code points (coverage floor) + frequent substrings
    val chars = scala.collection.mutable.SortedSet[String]()
    val sub = scala.collection.mutable.HashMap[String, Long]()
    for ((w, c) <- words) {
      var i = 0
      while (i < w.length) {
        chars += w.substring(i, i + 1)
        var j = i + 2
        val jMax = math.min(i + maxPieceLen, w.length)
        while (j <= jMax) {
          val p = w.substring(i, j)
          sub(p) = sub.getOrElse(p, 0L) + c
          j += 1
        }
        i += 1
      }
    }
    val nChars = chars.size
    require(vocabSize > nChars,
      s"unigramTrain: vocabSize=$vocabSize must exceed the corpus " +
        s"alphabet ($nChars code points)")
    val multiBudget = vocabSize - nChars
    val seedMulti = sub.toSeq
      .sortBy { case (p, c) => (-c * p.length, p) }
      .take(multiBudget * 4)
    // seed counts: chars get their exact occurrence mass, multi-char
    // pieces their substring mass — the first M-step's inputs
    val charCount = scala.collection.mutable.HashMap[String, Long]()
    for ((w, c) <- words; i <- 0 until w.length) {
      val ch = w.substring(i, i + 1)
      charCount(ch) = charCount.getOrElse(ch, 0L) + c
    }
    var vocab: Vector[(String, Long)] =
      (chars.toVector.map(ch => ch -> charCount(ch)) ++ seedMulti)
        .sortBy(_._1)

    def eStep(v: Vector[(String, Long)]): scala.collection.mutable.HashMap[String, Long] = {
      val total = v.map(_._2).sum.toDouble
      val idx = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer]()
      val lps = new Array[Double](v.length)
      v.iterator.zipWithIndex.foreach { case ((p, c), i) =>
        idx.put(org.apache.spark.unsafe.types.UTF8String.fromString(p),
          Integer.valueOf(i))
        // zero-count chars keep a half-count floor so coverage survives
        lps(i) = math.log((if (c > 0L) c.toDouble else 0.5) / total)
      }
      val out = scala.collection.mutable.HashMap[String, Long]()
      for ((w, c) <- words) {
        val segs = graft.functions.impl.Kernels.viterbiSegment(
          org.apache.spark.unsafe.types.UTF8String.fromString(w),
          idx, lps, maxPieceLen)
        var i = 0
        while (i < segs.numElements()) {
          val p = segs.getUTF8String(i).toString
          out(p) = out.getOrElse(p, 0L) + c
          i += 1
        }
      }
      out
    }
    def mStep(counts: scala.collection.mutable.HashMap[String, Long],
              v: Vector[(String, Long)]): Vector[(String, Long)] =
      v.flatMap { case (p, _) =>
        val c = counts.getOrElse(p, 0L)
        if (c == 0L && p.length > 1) None else Some(p -> c)
      }

    val pruneAt = math.max(1, emIters / 2)
    for (it <- 1 to emIters) {
      vocab = mStep(eStep(vocab), vocab)
      if (it == pruneAt) {
        val (single, multi) = vocab.partition(_._1.length == 1)
        vocab = (single ++ multi.sortBy { case (p, c) => (-c, p) }
          .take(multiBudget)).sortBy(_._1)
      }
    }
    // converge to a hard-EM FIXED POINT (bounded extra rounds): the
    // returned counts must reproduce themselves under one more E-step
    // — the externally checkable contract the reference spec pins.
    // Hard EM with deterministic tie-breaks is monotone in corpus
    // likelihood, so this terminates; the cap is a safety rail.
    var rows = mStep(eStep(vocab), vocab)
    var extra = 0
    while (extra < 8 && rows != vocab) {
      vocab = rows
      rows = mStep(eStep(vocab), vocab)
      extra += 1
    }
    val total = rows.map(_._2).sum.toDouble
    import sp.implicits._
    rows.map { case (p, c) =>
      (p, p.length, c, c.toDouble / total) }
      .toDF("piece", "n_chars", "count", "prob")
  }

  /** Viterbi-encode a corpus with a trained unigram vocabulary: per
    * document, tokenize, segment each word (one
    * [[graft.functions.HashExprs.unigram_apply]] DP call per word —
    * the vocabulary rides as two codegen reference objects), and
    * report the compression it achieves. Map-side only, the
    * [[bpeEncode]] shape. `pieces` = (piece, logprob). */
  def unigramEncode(docs: DataFrame, idCol: String, textCol: String,
                    pieces: Seq[(String, Double)], maxPieceLen: Int): DataFrame = {
    val enc = explode(transform(
      filter(tokens(col(textCol)), w => w.rlike(asciiWord)),
      w => graft.functions.HashExprs.unigram_apply(w, pieces, maxPieceLen)))
    docs.select(col(idCol), enc.as("subwords"))
      .select(col(idCol),
        size(col("subwords")).as("n_subwords"),
        aggregate(col("subwords"), lit(0),
          (acc, s) => acc + length(s)).as("n_chars"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_subwords")).as("n_subwords"),
        sum(col("n_chars")).as("n_chars"))
  }

  /** Unigram-family tokenizer-BUDGET report (r17 verdict #5 — the
    * [[vocabBudgetReportFrom]] discipline on the OTHER production
    * subword family): OOV/coverage/fertility per vocabulary budget,
    * read against prefixes of the ONE trained unigram table in the
    * trainer's OWN deterministic prune order (multi-char pieces by
    * count desc, piece asc — exactly [[unigramTrainFrom]]'s mid-EM
    * prune key), singles always retained (the SentencePiece coverage
    * floor). Budgets are COUNTS OF MULTI-CHAR PIECES kept; a budget
    * beyond the trained table clamps with `effective_pieces` saying
    * so (the vocabBudgetReport clamp discipline).
    *
    * HONEST NON-RETRAIN NOTE: a leg is a prefix of the one trained
    * table with its log-probs renormalized over the retained counts
    * — what a deployment shipping a truncated vocab actually runs —
    * NOT an EM retrain at the smaller size (retrained vocabularies
    * would not nest). Piece SETS nest by construction; coverage and
    * fertility are NOT monotone theorems here (renormalization moves
    * every log-prob, and Viterbi optimizes probability, not piece
    * count) — the spec pins what IS structural: per-word pieces
    * never exceed chars (so every leg's total_subwords ≤ the
    * budget-0 char decode), the budget-0 leg is the closed-form
    * char tokenizer, and the FULL budget is the trainer's hard-EM
    * fixed point, so its corpus decode reproduces the trained
    * counts: total_subwords(full) == Σ count over the table, and
    * the leg anchors bit-equal to q_unigram_encode's totals.
    *
    * Scale shape: zero extra corpus passes — every leg re-encodes
    * the checkpointed word histogram (the CONTRACT: `hist` arrives
    * materialized, this method adds no checkpoint of its own) with
    * the piece subset riding as codegen reference objects. `vocab`
    * = the trained (piece, count) rows. */
  def unigramBudgetReportFrom(hist: DataFrame, vocab: Seq[(String, Long)],
                              budgets: Seq[Int],
                              maxPieceLen: Int): DataFrame = {
    require(budgets.nonEmpty,
      "unigramBudgetReport: budgets must be non-empty (multi-piece counts)")
    val words = hist.select(col("word").as("w"), col("wc").as("tf"))
    val singles = vocab.filter(_._1.length == 1)
    val multi = vocab.filter(_._1.length > 1)
      .sortBy { case (p, c) => (-c, p) }
    val legs = budgets.map { b =>
      val prefix = multi.take(b)
      val subset = (singles ++ prefix).sortBy(_._1)
      val total = subset.map(_._2).sum.toDouble
      // the SAME log-prob construction as unigramTrain's E-step and
      // q_unigram_encode (zero-count floor 0.5) — the fixed-point
      // anchor depends on it
      val pieces = subset.map { case (p, c) =>
        (p, math.log((if (c > 0L) c.toDouble else 0.5) / total)) }
      val ns = size(graft.functions.HashExprs.unigram_apply(
        col("w"), pieces, maxPieceLen))
      words.select(col("tf"), ns.as("np"))
        .agg(
          coalesce(sum(when(col("np") === 1, col("tf")).otherwise(0L)),
            lit(0L)).cast("long").as("whole_word_tokens"),
          coalesce(sum(when(col("np") === 1, 1L).otherwise(0L)), lit(0L))
            .cast("long").as("whole_word_types"),
          coalesce(sum(col("tf")), lit(0L)).cast("long").as("total_tokens"),
          count(lit(1)).cast("long").as("total_types"),
          coalesce(sum(col("tf") * col("np")), lit(0L)).cast("long")
            .as("total_subwords"))
        .withColumn("budget_pieces", lit(b.toLong))
        .withColumn("effective_pieces", lit(prefix.length.toLong))
        .withColumn("vocab_pieces",
          lit((singles.length + prefix.length).toLong))
    }
    legs.reduce(_.unionByName(_))
      .withColumn("coverage_rate", when(col("total_tokens") === 0, lit(0.0))
        .otherwise(col("whole_word_tokens").cast("double") /
          col("total_tokens").cast("double")))
      .withColumn("fertility", when(col("total_tokens") === 0, lit(0.0))
        .otherwise(col("total_subwords").cast("double") /
          col("total_tokens").cast("double")))
      .select(col("budget_pieces"), col("effective_pieces"),
        col("vocab_pieces"),
        col("whole_word_tokens"), col("whole_word_types"),
        col("total_tokens"), col("total_types"), col("total_subwords"),
        col("coverage_rate"), col("fertility"))
  }

  /** Trained quality classifier — the classifier-based filtering
    * stage of a curation pipeline (the role fastText quality models
    * play in public web-corpus recipes: train on labeled seed docs,
    * score the rest, keep the confident slice). The model is a
    * Bernoulli-NB-shaped document-frequency posterior kept entirely
    * in libm-free integer arithmetic so training AND application are
    * value-oracle-able:
    *
    *  - train split (`trainPred`): per distinct (doc, token), count
    *    df_label (docs matching `labelPred` containing the token) and
    *    df_all;
    *  - vocabulary = top `maxVocab` tokens by (df_all desc, token) —
    *    an explicit bound, so the model is broadcast-sized at ANY
    *    corpus scale (the capped-vocab discipline of the bigram LM);
    *  - token weight = fixed-point smoothed posterior
    *    w = (10^6 · (df_label+1)) DIV (df_all+2) ∈ [0, 10^6];
    *  - a held-out doc scores the integer mean of w over its distinct
    *    in-vocab tokens (m=0 falls back to the 500000 prior), and is
    *    predicted positive above the prior;
    *  - output = the confusion table (predicted × actual, doc counts,
    *    mean score) — the report a pipeline gates a corpus on.
    *
    * Scale shape: tokenize+explode+distinct is one shuffle of
    * (doc_id, token) pairs; the df aggregate shuffles tokens once;
    * the capped vocab joins back broadcast-sized; the per-doc score
    * groups (doc_id) with two longs. Text itself never shuffles. */
  def qualityClassifier(docs: DataFrame, idCol: String, textCol: String,
                        labelPred: Column, trainPred: Column,
                        maxVocab: Int = 5000): DataFrame =
    qualityScores(docs, idCol, textCol, labelPred, trainPred, maxVocab)
      .groupBy((col("score") > 500000L).as("predicted"),
        col("__label").as("actual"))
      .agg(count(lit(1)).as("docs"), sum(col("score")).as("__ss"))
      .withColumn("avg_score", expr("__ss DIV docs"))
      .drop("__ss")

  /** the ONE scorer behind [[qualityClassifier]]'s confusion table
    * and the calibration census (q_quality_calibration): train the
    * capped-vocab df-posterior on the train split, return every
    * held-out doc as (__id, __label, score ∈ [0, 10^6]) — a
    * threshold or bucketing change downstream can never drift the
    * model itself. */
  def qualityScores(docs: DataFrame, idCol: String, textCol: String,
                    labelPred: Column, trainPred: Column,
                    maxVocab: Int = 5000): DataFrame = {
    val tok = docs.select(col(idCol).as("__id"), labelPred.as("__label"),
        trainPred.as("__train"), explode(tokens(col(textCol))).as("__tok"))
      .distinct()
    val dfs = tok.filter(col("__train"))
      .groupBy(col("__tok"))
      .agg(sum(when(col("__label"), 1L).otherwise(0L)).as("__dfl"),
        count(lit(1)).as("__dfa"))
    val vocab = dfs.orderBy(col("__dfa").desc, col("__tok").asc)
      .limit(maxVocab)
      .withColumn("__w", expr("(1000000 * (__dfl + 1)) DIV (__dfa + 2)"))
      .select(col("__tok"), col("__w"))
    tok.filter(!col("__train"))
      .join(vocab, Seq("__tok"), "left")
      .groupBy(col("__id"), col("__label"))
      .agg(count(col("__w")).as("__m"), sum(col("__w")).as("__sw"))
      .withColumn("score", when(col("__m") === 0L, lit(500000L))
        .otherwise(expr("__sw DIV __m")))
      .select(col("__id"), col("__label"), col("score"))
  }
}
