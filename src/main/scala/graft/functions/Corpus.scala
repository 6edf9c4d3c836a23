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
                    trainPct: Int = 80, valPct: Int = 10): DataFrame =
    leakFreeSplitFromComponents(docs, idCol,
      graft.operators.ConnectedComponents.run(
        docs.select(col(idCol).as("node")), pairs),
      trainPct, valPct)

  /** [[leakFreeSplit]] from an ALREADY-LABELED component relation
    * (`node`, `component`) — the stored-artifact form: at scale the
    * dedup pass writes the labeling once and every split/election/
    * cluster consumer joins it instead of re-running clustering.
    *
    * `comps` may be PARTIAL (edge-incident nodes only — what
    * [[graft.operators.ConnectedComponents.runBlocked]] emits): an
    * unlabeled doc is its own singleton component, exactly what the
    * full `run()` labeling assigns it, so no document is ever dropped
    * from the split. */
  def leakFreeSplitFromComponents(docs: DataFrame, idCol: String,
                                  comps: DataFrame, trainPct: Int = 80,
                                  valPct: Int = 10): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct <= 100,
      s"bad split percentages: train=$trainPct val=$valPct")
    // the own-id fallback (and the pmod slot) need a numeric id: a
    // string id would coerce the coalesce to STRING and turn the slot
    // NULL/throwing — same contract as the pair kernels, checked here
    // instead of failing deep in the job
    locally {
      import org.apache.spark.sql.types._
      require(Seq(ByteType, ShortType, IntegerType, LongType)
          .contains(docs.schema(idCol).dataType),
        s"leakFreeSplitFromComponents: id column '$idCol' must be an " +
        s"integral type (got ${docs.schema(idCol).dataType}); " +
        "dictionary-encode non-numeric ids upstream")
    }
    val slot = pmod(col("component"), lit(100))
    docs.join(comps, docs(idCol) === comps("node"), "left")
      .withColumn("component", coalesce(col("component"), docs(idCol)))
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

  /** Largest-feasible-corpus mixture allocation: given target mixture
    * weights (ppm) per stratum and the observed supply, compute the
    * biggest total corpus that honors the EXACT proportions without
    * over-drawing any stratum, and the per-stratum integer keep-rate
    * that [[stratifiedSample]] (same [[sampleSlot]] coin) then applies.
    * This is the "20% code, 30% web, ..." data-mixing step run as
    * arithmetic instead of trial-and-error: the scarcest stratum
    * (min nᵢ·10⁶/wᵢ) binds the total, everything else downsamples to
    * proportion. All math is 64-bit integer division — reproducible by
    * the DuckDB oracle with zero float-boundary risk.
    *
    * Returns one row per stratum with positive weight:
    * `(stratum, n_obs, w_ppm, target_n, rate_ppm)`.
    *
    * Scale shape: one corpus aggregation (count per stratum — map-side
    * partials, |strata| result rows), then a global window over those
    * |strata| rows to find the binding minimum. The window's single
    * partition holds a handful of rows — a dimension-table operation,
    * not a data-scale one; the corpus itself is touched exactly once.
    */
  def mixtureAllocation(df: DataFrame, stratumCol: String,
                        weightsPpm: Map[String, Long]): DataFrame = {
    require(weightsPpm.values.forall(_ > 0), "weights must be positive")
    require(weightsPpm.values.sum <= 1000000L,
      s"weights sum to ${weightsPpm.values.sum} ppm > 1e6")
    val w = weightsPpm.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (stratum, ppm)) =>
        when(col("stratum") === stratum, lit(ppm)).otherwise(acc)
    }
    df.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_obs"))
      .withColumn("w_ppm", w)
      .filter(col("w_ppm") > 0)
      .withColumn("t_max",
        min(expr("n_obs * 1000000 div w_ppm")).over(Window.partitionBy()))
      .withColumn("target_n", expr("t_max * w_ppm div 1000000"))
      .withColumn("rate_ppm", expr("target_n * 1000000 div n_obs"))
      .select("stratum", "n_obs", "w_ppm", "target_n", "rate_ppm")
  }

  /** Apply [[mixtureAllocation]]: keep each row iff its [[sampleSlot]]
    * clears its stratum's computed rate. Strata with zero weight are
    * dropped entirely (inner join against the allocation). The
    * allocation side is |strata| rows — broadcast, so the sample
    * itself is a map-side filter over one corpus scan. */
  def mixtureSample(df: DataFrame, idCol: String, stratumCol: String,
                    weightsPpm: Map[String, Long]): DataFrame = {
    val alloc = mixtureAllocation(df, stratumCol, weightsPpm)
      .select(col("stratum").as("_mix_stratum"),
              col("rate_ppm").as("_mix_rate_ppm"))
    df.join(broadcast(alloc), df(stratumCol) === col("_mix_stratum"))
      .filter(sampleSlot(col(idCol)) < col("_mix_rate_ppm"))
      .drop("_mix_stratum", "_mix_rate_ppm")
  }

  /** Deterministic global shuffle + sharding for training-data export:
    * `sort_key` is a 60-bit md5 of (id, salt) and `shard` its
    * hash-mod — together a reproducible pseudo-random permutation of
    * the corpus cut into `nShards` pieces. Ordering by
    * `(shard, sort_key)` is the shuffled read order a trainer
    * consumes; changing `salt` draws a fresh permutation, and appended
    * docs never move existing ones (the key is a pure per-row
    * function, no RNG state). DuckDB reproduces the exact permutation
    * from the same md5 formula.
    *
    * Scale shape: assignment is map-side (no shuffle at all);
    * [[writeShards]] materializes it with exactly ONE exchange —
    * `repartition(shard)` — plus a local in-partition sort, which at
    * 100 TB is the minimum data movement any global shuffle can do.
    */
  def shardAssign(df: DataFrame, idCol: String, nShards: Int,
                  salt: String): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    df.withColumn("sort_key", Dedup.md5Hash60(
        concat(col(idCol).cast("string"), lit(":"), lit(salt))))
      .withColumn("shard", pmod(col("sort_key"), lit(nShards.toLong)).cast("int"))
  }

  /** Materialize [[shardAssign]] as one parquet directory per shard,
    * rows in sort_key order within each file: one exchange, one local
    * sort, `nShards` output dirs a trainer can stream independently. */
  def writeShards(df: DataFrame, idCol: String, nShards: Int, salt: String,
                  outPath: String): Unit =
    shardAssign(df, idCol, nShards, salt)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "sort_key")
      .write.partitionBy("shard").mode("overwrite").parquet(outPath)

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
