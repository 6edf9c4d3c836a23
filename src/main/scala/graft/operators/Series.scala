package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-series operators over an event stream: forward fill,
  * overlapping-interval merge, and integer-exact outlier flagging.
  * All three are single-window-pass shapes — per key, ONE hash
  * shuffle on the key and ONE intra-partition sort; no self-joins,
  * no iteration — so they scale exactly like any windowed aggregate
  * (the reference's gaps-and-islands collapse, SURVEY §2.5, is the
  * same execution shape).
  */
object Series {

  /** Forward fill (last-observation-carried-forward): for every row,
    * the most recent non-null observation at or before it in
    * (`orderCols`) order within `keyCol`. The sparse observation
    * column rides a plain `last(ignoreNulls = true)` running window —
    * Spark keeps O(1) state per partition row, nothing buffers.
    */
  def forwardFill(df: DataFrame, keyCol: String, obsCol: String,
                  filledName: String, orderCols: Column*): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(filledName, last(col(obsCol), ignoreNulls = true).over(w))
  }

  /** Merge overlapping/touching intervals per key (the classic span
    * coalesce — for deduplicating annotated text spans, stitching
    * session ranges, compacting validity windows). `startCol`/`endCol`
    * are inclusive-start / exclusive-end numerics. A new island starts
    * where the start exceeds the running max end of all PRIOR
    * intervals; the island id is a running sum of those flags.
    * Returns one row per (key, island): start, end, n_merged.
    */
  def mergeIntervals(df: DataFrame, keyCol: String,
                     startCol: String, endCol: String,
                     tieBreak: Column): DataFrame = {
    val ord = Seq(col(startCol), tieBreak)
    val prior = Window.partitionBy(keyCol).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val run = Window.partitionBy(keyCol).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df
      .withColumn("_maxEnd", max(col(endCol)).over(prior))
      .withColumn("_new",
        when(col("_maxEnd").isNull || col(startCol) > col("_maxEnd"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("_new")).over(run))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col(startCol)).as("span_start"),
           max(col(endCol)).as("span_end"),
           count(lit(1)).as("n_merged"))
  }

  /** Integer-exact per-key outliers: rows whose value deviates from
    * the key's mean by more than `k` population standard deviations,
    * computed WITHOUT floats — (n·x − Σ)² > k²·(n·Σx² − Σ²) is the
    * k-sigma test multiplied through by n², so the same BIGINT
    * arithmetic reproduces bit-for-bit in any ANSI engine (the
    * float-boundary rule SEMANTICS.md pins for every oracle pair).
    * `valueCol` must already be integer-scaled (e.g. millis).
    * Keys with fewer than `minN` rows are skipped (a 2-row key calls
    * everything an outlier). One window pass, no ordering needed.
    */
  def sigmaOutliers(df: DataFrame, keyCol: String, valueCol: String,
                    k: Int, minN: Int): DataFrame = {
    val w = Window.partitionBy(keyCol)
    val x = col(valueCol)
    df
      .withColumn("_n", count(lit(1)).over(w))
      .withColumn("_s1", sum(x).over(w))
      .withColumn("_s2", sum(x * x).over(w))
      .filter(col("_n") >= minN)
      .withColumn("_dev", col("_n") * x - col("_s1"))
      .filter(col("_dev") * col("_dev") >
        lit(k.toLong * k) * (col("_n") * col("_s2") - col("_s1") * col("_s1")))
      .drop("_s1", "_s2", "_dev")
      .withColumnRenamed("_n", "n_key_rows")
  }

  /** Floor-at-zero running balance (inventory that cannot go
    * negative, a token bucket, a drawdown-reset equity curve):
    * `b_i = max(0, b_{i−1} + d_i)`. The recurrence looks inherently
    * sequential, but unrolls to closed form
    * `b_i = prefix_i − least(0, min_{j≤i} prefix_j)` — the balance is
    * the raw prefix sum re-based to its historical minimum (clamped at
    * 0). Two cumulative windows over ONE sort, fully parallel across
    * keys, integer-exact. Appends a `balance` column; `orderCols`
    * must be a total order within each key.
    */
  def cappedBalance(df: DataFrame, keyCol: String, orderCols: Seq[String],
                    deltaCol: String): DataFrame = {
    val run = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("_prefix", sum(deltaCol).over(run))
      .withColumn("_low", least(lit(0L), min("_prefix").over(run)))
      .withColumn("balance", col("_prefix") - col("_low"))
      .drop("_prefix", "_low")
  }
}
