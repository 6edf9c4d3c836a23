package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for training-data pipelines (additive
  * beyond the reference — BASELINE.json north star): leakage-safe
  * train/val/test splits, deterministic stratified sampling for
  * domain mixing, and token-budget sequence packing.
  *
  * Everything is deterministic arithmetic — no RNG, no engine-specific
  * hash — so results are reproducible across runs AND reproducible by
  * the DuckDB oracle, and appending data never reshuffles existing
  * assignments.
  */
object Corpus {

  /** Train/val/test assignment that never separates near-duplicates:
    * candidate pairs (MinHash/SimHash/embedding, `Dedup`) are closed
    * into components ([[graft.operators.ConnectedComponents]]) and the
    * split is a pure function of the COMPONENT id — every member of a
    * duplicate cluster lands in the same split, so test data can't
    * leak into training via a near-copy. Assignment is
    * `component mod 100` against integer thresholds: deterministic,
    * engine-portable, and stable under appends for docs whose
    * component doesn't change.
    *
    * Scale shape: components iterate over the candidate-pair node set
    * only; the assignment itself is one equi-join (docs ⋈ components
    * on id) plus a map-side CASE — no extra shuffle beyond what the
    * join needs.
    */
  def leakFreeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
                    trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split percentages: train=$trainPct val=$valPct")
    val comps = graft.operators.ConnectedComponents.run(
      docs.select(col(idCol).as("node")), pairs)
    val slot = pmod(col("component"), lit(100))
    docs.join(comps, docs(idCol) === comps("node"))
      .drop("node")
      .withColumn("split",
        when(slot < trainPct, "train")
          .when(slot < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Multiplicative-hash slot in [0, 1e6): the per-row coin for
    * [[stratifiedSample]], exposed so callers (and the oracle) can
    * reproduce membership. Knuth's 2654435761 spreads sequential ids
    * uniformly; plain `id mod 1e6` would alias any stride structure in
    * the ids straight into the sample. NB the product must fit a
    * signed 64-bit int (ids < ~3.4e9) — DuckDB errors on overflow
    * where the JVM would wrap, so the oracle keeps us honest. */
  def sampleSlot(id: Column): Column =
    pmod(id * lit(2654435761L), lit(1000000L))

  /** Deterministic stratified (per-domain) downsampling — the data
    * mixing step of a pretraining pipeline ("keep 75% of en, 12.5% of
    * es, ..."): keep a row iff its [[sampleSlot]] falls below the
    * stratum's parts-per-million rate. Sampling decisions are
    * per-row, map-side, reproducible, and MONOTONE in the rate: the
    * 10%-sample is a subset of the 20%-sample, so mixture ratios can
    * be re-tuned without resampling churn.
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       ratesPpm: Map[String, Int],
                       defaultPpm: Int = 1000000): DataFrame = {
    require((defaultPpm +: ratesPpm.values.toSeq)
      .forall(p => p >= 0 && p <= 1000000), s"rates must be ppm in [0,1e6]")
    val rate = ratesPpm.toSeq.sortBy(_._1).foldLeft(lit(defaultPpm)) {
      case (acc, (stratum, ppm)) =>
        when(col(stratumCol) === stratum, lit(ppm)).otherwise(acc)
    }
    df.filter(sampleSlot(col(idCol)) < rate)
  }

  /** Token-budget sequence packing (concat-and-chunk, the streaming-
    * friendly packing used to build fixed-length training sequences):
    * within each `groupCol` shard, documents in deterministic
    * `orderCol` order are laid head-to-tail and cut into
    * `budgetTokens`-sized bins; each document is assigned to the bin
    * its first token lands in (`bin`), with its running start offset
    * (`cum_before`) exposed for the writer.
    *
    * Scale shape: ONE window cumsum per shard — packing is
    * embarrassingly parallel across shards and needs no global sort;
    * at 100 TB the shard column (source, path prefix, date...) is the
    * unit of parallelism, and bin-packing quality degrades only at
    * shard boundaries.
    */
  def packSequences(df: DataFrame, groupCol: String, orderCol: String,
                    tokens: Column, budgetTokens: Int): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = Window.partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("n_tok", tokens.cast("long"))
      .withColumn("cum_before",
        coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("bin", expr(s"cum_before div $budgetTokens"))
  }
}
