package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for LLM-data-pipeline curation
  * (additive beyond the reference — BASELINE.json north star): token
  * counting, normalization/fingerprinting, n-gram heuristic language
  * ID, and quality scoring.
  *
  * Everything here is built from codegen'd `org.apache.spark.sql
  * .functions` (no UDFs): at 100 TB these run inside whole-stage
  * codegen straight over the parquet scan — no shuffle, no JVM
  * boundary crossing, perfectly partition-parallel.
  */
object TextAnalysis {

  /** Whitespace tokens of the raw text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(size(tokens(text)))

  /** Lowercase, strip non-alphanumerics, collapse whitespace — the
    * canonical form used for fingerprinting and near-dup shingling.
    * Fused single-pass expression; equivalent to
    * `trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))` (see
    * [[expressions.NormalizeText]]). */
  def normalized(text: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(expressions.NormalizeText(
      org.apache.spark.sql.GraftSqlBridge.expression(text)))

  /** The regex composition normalized() replaces (kept for tests). */
  def normalizedComposed(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Document fingerprint: md5 over the normalized text. Two documents
    * differing only in case/punctuation/whitespace collide — the
    * standard "normalize then hash" exact-near-dup key. */
  def fingerprint(text: Column): Column = md5(normalized(text))

  /** Word n-grams (shingles) over normalized tokens, via the fused
    * [[expressions.WordShingles]] Catalyst expression (the equivalent
    * transform∘slice∘concat_ws composition is interpreted and ~30×
    * slower — see that class's scaladoc). */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(normalized(text), " ")
    org.apache.spark.sql.GraftSqlBridge.column(
      expressions.WordShingles(
        org.apache.spark.sql.GraftSqlBridge.expression(toks), n))
  }

  /** Tiny per-language stopword lists for the n-gram/stopword
    * language-ID heuristic. Deliberately small and fixed so the DuckDB
    * oracle can reproduce them verbatim. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "to", "and", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es" -> Seq("el", "los", "las", "es", "un", "una", "en", "que"),
  )

  private def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Per-language stopword hit counts + argmax language (ties broken in
    * `stopwords` order, 'und' = unknown when nothing hits). */
  def langScores(text: Column): Seq[(String, Column)] = {
    val toks = split(normalized(text), " ")
    stopwords.map { case (lang, words) => lang -> hitCount(toks, words) }
  }

  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((lang, score), acc) =>
      when(score === best && best > 0, lit(lang)).otherwise(acc)
    }
    // NB foldRight ⇒ first list entry wins ties, matching the oracle's
    // CASE WHEN chain order.
  }

  /** BPE-ish token counting: counts the pre-tokenizer word pieces a
    * byte-pair encoder would start from — letter runs, digit runs, and
    * punctuation runs as separate tokens (the GPT-2-style pretoken
    * split, minus byte fallback). A cheap, deterministic proxy for
    * "how many LLM tokens is this document" used for corpus budgeting.
    */
  val BpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"

  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeTokenPattern))

  /** Quality signals: length, alphabetic ratio, punctuation ratio,
    * stopword ratio, mean token length — the classic cheap filters a
    * pretraining pipeline runs before anything expensive. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val len = length(text).cast("double")
    val alpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?]", "")).cast("double")
    val toks = split(normalized(text), " ")
    val nTok = tokenCount(text).cast("double")
    val stopHits = hitCount(toks, stopwords.flatMap(_._2)).cast("double")
    Seq(
      "n_chars_measured" -> length(text).cast("long"),
      "n_tokens" -> tokenCount(text).cast("long"),
      "n_tokens_bpe" -> bpeTokenCount(text).cast("long"),
      "alpha_ratio" -> round(alpha / nullif(len, lit(0.0)), 6),
      "punct_ratio" -> round(punct / nullif(len, lit(0.0)), 6),
      "stopword_ratio" -> round(stopHits / nullif(nTok, lit(0.0)), 6),
      "mean_token_len" -> round(alpha / nullif(nTok, lit(0.0)), 6))
  }
}
