package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINER (Sennrich et al., "Neural Machine Translation
  * of Rare Words with Subword Units") — k merge rounds over the corpus
  * vocabulary, the tokenizer-training primitive a data pipeline ships
  * (q_bpe_merge was the single-round pair count; this runs the loop).
  *
  * Representation: each distinct word is a SPACE-JOINED symbol string
  * ("cat" → "c a t") with its corpus frequency — symbols never contain
  * spaces (words are normalized [a-z0-9] tokens), so the encoding is
  * unambiguous and, crucially, the greedy left-to-right non-overlapping
  * merge is plain string `replace` on a doubled-space form:
  * every inter-symbol gap widens to two spaces, the pattern
  * `' a  b '` consumes one boundary space on each side, so consecutive
  * occurrences ("a b a b") still all match, while a symbol-internal
  * false match ("ab c" vs pair "b c") is impossible because the inner
  * 'b' is not space-delimited. Both engines implement `replace` as
  * left-to-right non-overlapping substring replacement, which is what
  * makes the whole trainer oracle-checkable as k unrolled CTE stages.
  *
  * Per round: adjacent-pair counts weighted by word frequency (one
  * shuffle keyed by pair over the VOCABULARY, not the corpus — the
  * corpus is scanned exactly once to build the word table), a 1-row
  * global argmax (count desc, pair asc — deterministic tie-break),
  * broadcast-joined back for the merge rewrite. No driver actions at
  * all; [[graft.operators.LoopCheckpoint]] cuts the loop-carried
  * lineage each round (the SPARK-39748 stats blow-up found at sf1).
  *
  * Scale shape: after the initial corpus scan everything is
  * vocabulary-proportional — exactly why production BPE trainers
  * pre-aggregate to word counts. k rounds = k small shuffles.
  */
object Bpe {

  /** Distinct-word frequency table as (w, s = space-joined chars,
    * freq). Distinct words have distinct char sequences, so w ↔ s is
    * a bijection — carrying w costs nothing and lets [[encode]] map
    * corpus words to their merged symbol strings. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(filter(
        split(TextAnalysis.normalized(col(textCol)), " "),
        t => t =!= "")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), concat_ws(" ",
        expr("slice(split(w, ''), 1, length(w))")).as("s"), col("freq"))

  private def pairCounts(words: DataFrame): DataFrame =
    words.select(col("freq"), explode(expr(
        "filter(zip_with(split(s, ' '), slice(split(s, ' '), 2, " +
        "size(split(s, ' ')) - 1), (a, b) -> concat(a, ' ', b)), " +
        "x -> x is not null)")).as("pair"))
      .groupBy("pair").agg(sum("freq").as("n"))

  /** Greedy non-overlapping merge of `_bp` ("a b") inside the
    * space-joined symbol string `s`, via the doubled-space replace. */
  private val mergeExpr =
    "trim(replace(replace(concat(' ', replace(s, ' ', '  '), ' '), " +
    "concat(' ', replace(_bp, ' ', '  '), ' '), " +
    "concat(' ', replace(_bp, ' ', ''), ' ')), '  ', ' '))"

  /** THE merge loop, run once: returns (merge table (round, pair, n),
    * final word table (w, s, freq)). `train`/`vocab`/`encode` are all
    * views over this pair — one loop, no drift, and the suite shares
    * one model per (session, dir) through QueryHelpers.bpeModelFor.
    *
    * The merge step is a LEFT join against the (0-or-1-row) argmax: a
    * vocabulary that fully merges before `rounds` yields an EMPTY
    * best, which must leave the word table unchanged — the earlier
    * crossJoin formulation annihilated the whole table (and the
    * matching oracle CROSS JOIN collapsed identically, so the
    * cross-engine check could never catch it; BpeSpec now pins the
    * exhausted case). */
  def model(docs: DataFrame, textCol: String,
            rounds: Int): (DataFrame, DataFrame) = {
    var words = graft.operators.LoopCheckpoint(wordTable(docs, textCol))
    val merges = Seq.newBuilder[DataFrame]
    // words rolls (round r dead once r+1 lands); the 1-row best frames
    // all survive into the merge table, so they never roll
    val roll = new graft.operators.LoopCheckpoint.Rolling
    for (r <- 0 until rounds) {
      val best = graft.operators.LoopCheckpoint(
        pairCounts(words).orderBy(col("n").desc, col("pair").asc).limit(1)
          .select(lit(r).as("round"), col("pair"), col("n")))
      merges += best
      words = roll.next(
        words.join(broadcast(best.select(col("pair").as("_bp"))),
                   lit(true), "left")
          .select(col("w"),
            when(col("_bp").isNull, col("s"))
              .otherwise(expr(mergeExpr)).as("s"),
            col("freq")))
    }
    (merges.result().reduce(_ unionByName _), words)
  }

  /** Train `rounds` BPE merges; returns the merge table
    * (round, pair, n) — round k's pair is the most frequent adjacent
    * symbol pair after rounds 0..k−1 were applied. */
  def train(docs: DataFrame, textCol: String, rounds: Int): DataFrame =
    model(docs, textCol, rounds)._1

  /** The word→symbols mapping after `rounds` merges — the trained
    * tokenizer's application table. */
  def mergedWordTable(docs: DataFrame, textCol: String,
                      rounds: Int): DataFrame =
    model(docs, textCol, rounds)._2

  /** [[vocab]] over an already-trained word table. */
  def vocabFrom(words: DataFrame): DataFrame =
    words.select(col("freq"), explode(split(col("s"), " ")).as("symbol"))
      .groupBy("symbol").agg(sum("freq").as("n"))

  /** Final subword vocabulary after `rounds` merges: every surviving
    * symbol with its corpus frequency — what the trained tokenizer
    * actually loads alongside the merge table. */
  def vocab(docs: DataFrame, textCol: String, rounds: Int): DataFrame =
    vocabFrom(model(docs, textCol, rounds)._2)

  /** [[encode]] over an already-trained word table. */
  def encodeFrom(docs: DataFrame, idCol: String, textCol: String,
                 words: DataFrame): DataFrame = {
    val wt = words.select(col("w"), size(split(col("s"), " ")).as("n_sub"))
    docs.select(col(idCol).as("doc_id"), explode(filter(
        split(TextAnalysis.normalized(col(textCol)), " "),
        t => t =!= "")).as("w"))
      .join(wt, "w")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
           sum(col("n_sub").cast("long")).as("n_subwords"))
  }

  /** ENCODE the corpus with the trained tokenizer: every document's
    * words map through [[mergedWordTable]] to their merged symbol
    * strings, yielding per-doc word and subword counts — the
    * tokenized-length surface a packing/budgeting stage consumes.
    * One equi-join on the word key (vocabulary-sized right side; at
    * web scale this is the classic token-count join, broadcastable
    * when the vocab fits). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             rounds: Int): DataFrame =
    encodeFrom(docs, idCol, textCol, model(docs, textCol, rounds)._2)
}
