package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Text-analysis primitives for a large-scale training-data pipeline:
 * tokenization, quality scoring, fingerprinting, and a lightweight
 * language-ID heuristic. Everything is built from codegen'd native
 * functions (`split`, higher-order array functions, `md5`, `xxhash64`) —
 * no UDFs — so the whole stage stays inside WholeStageCodegen and
 * scales embarrassingly parallel (per-row, no shuffle).
 */
object TextAnalysis {

  /** Whitespace tokenization (the corpus is single-space separated;
    * use [[normalize]] first for arbitrary whitespace). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Canonical form for fingerprinting: lowercase, collapsed
    * whitespace, trimmed. */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** BPE-style pre-tokenizer classes: letter runs, digit runs,
    * punctuation runs (the GPT-2 pre-tokenizer's shape, ASCII classes
    * so the Java and RE2 regex dialects agree). The classes are
    * disjoint, so the split is deterministic under any alternation
    * semantics. */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"

  /** Sub-word-ish token stream for token-count accounting (a corpus
    * budget measured in whitespace tokens undercounts punctuation-heavy
    * text badly). Codegen'd native regexp — no UDF. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** 128-bit content fingerprint of the normalized text — the exact-dedup
    * key. Hash-based, so dedup is a hash aggregation on a short fixed-width
    * key instead of a shuffle of full document bodies. */
  def fingerprint(text: Column): Column = md5(normalize(text))

  private[graft] val StopWords = Seq("the", "a", "of", "and", "to", "in")

  /** Number of DISTINCT stopwords present — the Gopher-style "contains
    * at least 2 of the required words" naturalness signal (a stronger
    * prose test than the ratio: boilerplate can repeat one stopword). */
  def distinctStopwords(text: Column): Column =
    size(array_intersect(array_distinct(tokens(text)),
      array(StopWords.map(lit): _*)))

  /** Fraction of tokens that are stopwords — high for natural prose,
    * low for code/tables/noise. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isin(StopWords: _*))).cast(DoubleType) / size(toks)
  }

  /** Fraction of distinct tokens — low values indicate repetitive or
    * boilerplate documents. */
  def uniqueRatio(text: Column): Column = {
    val toks = tokens(text)
    size(array_distinct(toks)).cast(DoubleType) / size(toks)
  }

  /** Composite quality score in [0,1]: diverse vocabulary, damped by
    * stopword saturation. */
  def qualityScore(text: Column): Column =
    uniqueRatio(text) * (lit(1.0) - stopwordRatio(text))

  /** Per-language marker-token profiles for the n-gram-free language-ID
    * heuristic. Tiny on purpose: the profiles broadcast as literals into
    * codegen, so language-ID is a pure map-side operation. */
  private[graft] val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  /**
   * Heuristic language-ID: score = marker-token hits per language,
   * winner = (score, lang) lexicographic max, so ties resolve
   * deterministically. Returns struct(score, lang).
   */
  def langIdScored(text: Column): Column = {
    val toks = tokens(text)
    val scored = LangMarkers.map { case (lang, markers) =>
      struct(
        size(filter(toks, t => t.isin(markers: _*))).as("score"),
        lit(lang).as("lang"))
    }
    array_max(array(scored: _*))
  }

  def langId(text: Column): Column = langIdScored(text).getField("lang")
}
