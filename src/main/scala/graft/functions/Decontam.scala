package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the eval-leakage check every
  * pretraining pipeline runs before training: flag any document that
  * shares at least one word n-gram with the benchmark/eval corpus, so
  * test questions can't leak into the training set verbatim (additive
  * beyond the reference — BASELINE.json north star; the method follows
  * the published n-gram-overlap decontamination used by the GPT-3 /
  * Gopher / PaLM data cards, with 60-bit md5 gram keys so the DuckDB
  * oracle reproduces every hit exactly).
  *
  * Scale shape (100 TB corpus, MB-scale benchmark): the benchmark side
  * is tiny by construction — eval sets are thousands of prompts — so
  * its distinct gram-hash set is explicitly `broadcast()`: the
  * corpus-side probe is a broadcast hash join evaluated map-side
  * inside the scan, no corpus shuffle. The only shuffle is the
  * per-doc hit count, whose map-side partial aggregation collapses
  * each doc's hits before anything moves (a doc's grams explode out of
  * one input row, so they are co-partitioned by construction); shuffle
  * volume is O(contaminated docs), not O(grams). If the benchmark ever
  * outgrew broadcast range, the same pipeline degrades gracefully to a
  * shuffled equi-join on `gh` — the gram hash is the join key either
  * way.
  */
object Decontam {

  /** Per-document contamination report: `(doc_id, n_hit_grams,
    * contaminated)` for EVERY input doc (clean docs report 0/false).
    * `n_hit_grams` counts the doc's DISTINCT n-grams that appear
    * anywhere in `bench`'s n-gram set — the re-ranking signal used to
    * pick a removal threshold; `contaminated` is the ≥1-hit flag.
    *
    * Grams are word n-grams over normalized text ([[TextAnalysis
    * .shingles]]), hashed to 60-bit md5 keys ([[Dedup.md5Hash60]])
    * before the join so shuffled/broadcast rows carry 8-byte keys, not
    * strings (the PPJoin trick, Dedup.scala). A hash collision can
    * only over-count by vanishing odds (~2^-60 per pair) and the
    * oracle applies the identical hash, so parity holds regardless.
    */
  def report(docs: DataFrame, idCol: String, textCol: String,
             bench: DataFrame, benchTextCol: String, n: Int): DataFrame = {
    val benchGrams = bench
      .select(explode(array_distinct(
        TextAnalysis.shingles(col(benchTextCol), n))).as("g"))
      .select(Dedup.md5Hash60(col("g")).as("gh"))
      .distinct()
    val docGrams = docs
      .select(col(idCol).as("doc_id"), explode(array_distinct(
        TextAnalysis.shingles(col(textCol), n))).as("g"))
      .select(col("doc_id"), Dedup.md5Hash60(col("g")).as("gh"))
    val hits = docGrams.join(broadcast(benchGrams), "gh")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit_grams"))
    docs.select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"),
        (coalesce(col("n_hit_grams"), lit(0L)) > 0).as("contaminated"))
  }
}
