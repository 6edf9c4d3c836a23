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

  /** Overlapping passage extraction — the RAG/embedding chunking step:
    * cut each document's whitespace tokens into `chunkTokens`-token
    * windows every `strideTokens` (stride < chunk ⇒ overlap), emitting
    * `(doc_id, chunk_idx, start_tok, n_chunk_tokens, passage)`.
    * Stride-aligned trailing windows shorter than `strideTokens` are
    * still emitted (the tail must be retrievable), and an empty
    * document yields no rows.
    *
    * Scale shape: pure generator work — windows are computed and
    * exploded INSIDE the row (sequence → transform → posexplode), no
    * shuffle, no state; downstream embedding/indexing sees rows
    * multiply map-side exactly like a parser UDTF would, but fully
    * inside whole-stage codegen. */
  def chunkPassages(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, chunkTokens: Int,
                    strideTokens: Int): org.apache.spark.sql.DataFrame = {
    require(chunkTokens > 0 && strideTokens > 0 && strideTokens <= chunkTokens,
      s"need 0 < stride <= chunk, got chunk=$chunkTokens stride=$strideTokens")
    val toks = filter(split(trim(col(textCol)), "\\s+"), t => t =!= "")
    val n = size(toks)
    val starts = filter(
      sequence(lit(0), greatest(n - 1, lit(0)), lit(strideTokens)),
      s => s < n)
    docs
      .select(col(idCol).as("doc_id"), toks.as("_toks"), n.as("_n"),
        posexplode(starts))
      .select(col("doc_id"), col("pos").as("chunk_idx"),
        col("col").as("start_tok"),
        least(lit(chunkTokens), col("_n") - col("col")).cast("long")
          .as("n_chunk_tokens"),
        array_join(slice(col("_toks"), col("col") + 1, lit(chunkTokens)), " ")
          .as("passage"))
  }

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

  /** Content-defined chunk boundary positions (Rabin rolling hash) —
    * see [[expressions.RabinBoundaries]] for the contract and why it
    * is a custom one-pass Expression. */
  def cdcBoundaries(text: Column, w: Int, div: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      expressions.RabinBoundaries(
        org.apache.spark.sql.GraftSqlBridge.expression(text), w, div))

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

  /** Per-(document, token) term statistics over normalized tokens:
    * `tf` (occurrences in the doc) and `df` (number of docs containing
    * the token).
    *
    * Scale shape: one hash aggregation keyed (doc, token) for tf, then
    * df as a count window over the token key — the same shuffle a
    * df-table join would need, minus the join-back. No collect, no
    * vocabulary broadcast: the vocabulary can be larger than any one
    * executor at 100 TB.
    */
  def termStats(docs: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = split(normalized(col(textCol)), " ")
    val wTok = org.apache.spark.sql.expressions.Window.partitionBy("token")
    docs.select(col(idCol).as("doc_id"), explode(toks).as("token"))
      .filter(col("token") =!= "")
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .withColumn("df", count(lit(1)).over(wTok))
  }

  /** Canonical TF-IDF: tf · ln((N+1)/(df+1)), N = corpus size. Driver
    * passes N (one count() probe) so the score stays a codegen'd column
    * expression. NB `ln` is engine-specific in the last ulp — this form
    * is for in-Spark ranking/filtering; cross-engine-exact ranking uses
    * [[topTermsExact]] (docs/SEMANTICS.md). */
  def tfIdf(stats: org.apache.spark.sql.DataFrame, corpusSize: Long): org.apache.spark.sql.DataFrame =
    stats.withColumn("tfidf",
      col("tf") * log((lit(corpusSize) + 1.0) / (col("df") + lit(1.0))))

  /** Top-k distinctive terms per document, ranked by the integer-exact
    * rarity score `tf·10⁶ div df` (monotone in tf/df). Chosen over the
    * ln-based score for the ORACLE surface because integer division is
    * bit-identical across engines while `ln` may differ in the last ulp
    * (docs/SEMANTICS.md); ties break on token order. */
  def topTermsExact(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(col("score_micro").desc, col("token"))
    termStats(docs, idCol, textCol)
      .withColumn("score_micro", expr("tf * 1000000 div df"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Repetition stats (the Gopher-rules shape): how dominated a
    * document is by its most frequent word bigram. High ratios flag
    * templated/boilerplate text that per-document quality scores miss.
    * The dominance ratio surfaces as the integer-exact
    * `ratio_micro = max_bigram_count·10⁶ div n_bigrams` (same pattern
    * as [[topTermsExact]]'s score_micro): `round` on DOUBLE is not
    * bit-identical across engines (Spark rounds via BigDecimal HALF_UP,
    * DuckDB differs in the last ulp on boundary quotients), while
    * integer division is (docs/SEMANTICS.md).
    */
  def repetitionStats(docs: org.apache.spark.sql.DataFrame, idCol: String,
                      textCol: String): org.apache.spark.sql.DataFrame = {
    val grams = docs
      .select(col(idCol).as("doc_id"), shingles(col(textCol), 2).as("g"))
      .filter(size(col("g")) > 0)
      .select(col("doc_id"), explode(col("g")).as("bigram"))
    grams.groupBy("doc_id", "bigram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum(col("c")).as("n_bigrams"),
           max(col("c")).as("max_bigram_count"))
      .select(col("doc_id"), col("n_bigrams"), col("max_bigram_count"),
              expr("max_bigram_count * 1000000 div n_bigrams")
                .as("ratio_micro"))
  }

  /** Corpus-bigram language-model quality score — the integer-exact
    * stand-in for the LM-perplexity filter a pretraining pipeline runs
    * (CCNet-style: score each document against a reference LM; cut the
    * tails). The LM here is the corpus's own bigram table; a doc's
    * score is the MEAN conditional probability of its bigrams in ppm
    * (arithmetic mean, so the surface stays in BIGINT `div` arithmetic
    * both engines reproduce bit-identically — the geometric mean that
    * true perplexity takes needs logs, which are not integer-exact).
    * Low score = improbable token transitions (noise, shuffled text,
    * wrong language); high = formulaic/repetitive.
    *
    * Scale shape: the LM is one groupBy over corpus bigrams (shuffle
    * on the bigram key); scoring joins the doc bigrams against it on
    * the same key, then one groupBy(doc). No broadcast requirement (a
    * web-scale vocab² LM shuffles fine), no collect, no text rescan. */
  def lmScore(docs: org.apache.spark.sql.DataFrame, idCol: String,
              textCol: String): org.apache.spark.sql.DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"),
        filter(split(normalized(col(textCol)), " "), t => t =!= "").as("t"))
      .filter(size(col("t")) >= 2)
    val docBigrams = toks.select(col("doc_id"), explode(expr(
      "filter(zip_with(t, slice(t, 2, size(t) - 1), " +
      "(a, b) -> concat(a, ' ', b)), x -> x is not null)")).as("bigram"))
    // materialize per-doc bigram COUNTS once: the raw occurrence
    // explode is the biggest relation here and fed three consumers
    // (LM build, unigram heads, final scoring join) — each re-ran the
    // corpus tokenize+explode (measured 15.8 s at sf1; the count table
    // is smaller than the occurrence stream and derives everything)
    val db = graft.operators.LoopCheckpoint(
      docBigrams.groupBy("doc_id", "bigram").agg(count(lit(1)).as("c")))
    val lm = db.groupBy("bigram").agg(sum("c").as("n"))
    val uni = lm
      .groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
      .agg(sum("n").as("n_w1"))
    val scored = lm
      .join(uni, substring_index(col("bigram"), " ", 1) === uni("w1"))
      .select(col("bigram"),
        expr("cast(n as decimal(38,0)) * 1000000 div n_w1").as("cond_ppm"))
    db.join(scored, "bigram")
      .groupBy("doc_id")
      .agg(sum("c").as("n_bigrams"),
           sum(expr("c * cond_ppm")).as("sum_ppm"))
      .select(col("doc_id"), col("n_bigrams"),
        expr("cast(cast(sum_ppm as decimal(38,0)) div n_bigrams as bigint)")
          .as("lm_score_ppm"))
  }

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

  /** Distinctive terms per stratum — the c-TF-IDF-style "what makes
    * this slice different" analysis (BERTopic's class-TF-IDF, the
    * standard way to LABEL a corpus partition: a source, a language, a
    * semantic cluster) with the log replaced by an integer lift so
    * both engines agree bit-for-bit:
    *
    *   lift_ppm(t, s) = ((cnt·10⁶ div cnt_g) · tot_g) div tot_s
    *
    * i.e. the term's within-stratum relative frequency over its
    * corpus-wide relative frequency, in ppm (1,000,000 = exactly
    * corpus-average usage). Top `topK` per stratum by (lift DESC,
    * term ASC), gated on `cnt ≥ minCount` so one-off typos don't top
    * every list.
    *
    * Scale shape: one tokenize pass → a map-side-combinable
    * (stratum, term) count; everything after runs on VOCAB-sized
    * relations (stratum totals, global term counts), never the corpus
    * — the per-stratum top-k window sorts |vocab ∩ stratum| rows, not
    * documents. `tot_g` is corpus token volume: the ppm product needs
    * `cnt·10⁶ ≤ ~9·10¹⁸/tot_g`, comfortably wide below ~10¹²-token
    * corpora; shard the call beyond that. */
  def distinctiveTerms(docs: org.apache.spark.sql.DataFrame,
                       stratumCol: String, textCol: String,
                       minCount: Long = 5L, topK: Int = 5)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val st = docs
      .select(col(stratumCol).as("stratum"),
        explode(split(normalized(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("stratum", "term").agg(count(lit(1)).as("cnt"))
    val tots = st.groupBy("stratum").agg(sum("cnt").as("tot_s"))
    val glob = st.groupBy("term").agg(sum("cnt").as("cnt_g"))
    val totg = st.agg(sum("cnt").as("tot_g"))
    val w = Window.partitionBy("stratum")
      .orderBy(col("lift_ppm").desc, col("term"))
    st.filter(col("cnt") >= minCount)
      .join(broadcast(tots), "stratum")
      .join(glob, "term")
      .crossJoin(broadcast(totg))
      .withColumn("lift_ppm",
        expr("((cnt * 1000000 div cnt_g) * tot_g) div tot_s"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select("stratum", "rank", "term", "cnt", "lift_ppm")
  }
}
