package graft.operators

import org.apache.spark.sql.Column
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

  /** quality class from simple, portable signals */
  def qualityClass(nTokens: Column, avgLen: Column, stopRatio: Column): Column =
    when(nTokens >= lit(60) && avgLen >= lit(4.0) && stopRatio <= lit(0.3), lit("high"))
      .when(nTokens >= lit(20), lit("medium"))
      .otherwise(lit("low"))
}
