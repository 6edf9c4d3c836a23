package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Integer-exact grouped statistics beyond plain aggregates. First
  * member: simple linear regression (OLS) per group from sufficient
  * statistics — the "trend per segment" query every analytics engine
  * grows eventually, here with a fixed-point surface a SQL oracle can
  * reproduce exactly.
  *
  * Beyond the reference; sits beside `Series` (windowed integer-exact
  * ops) in the numeric family.
  *
  * Scale shape: ONE hash aggregate computes (n, Σx, Σy, Σx², Σxy) with
  * map-side partials — no second pass over the data, no window, no
  * collect. The slope/intercept algebra runs on the one-row-per-group
  * result in DECIMAL(38,0):
  *   slope      = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  *   intercept  = (Σy·den − num·Σx) / (n·den)
  * emitted as floor-divided ppm / milli fixed-point with an explicit
  * sign factor, because Spark's `div` truncates toward zero while
  * other engines' `//` floors — on `abs` operands the two agree, so
  * `sign · (abs(num)·scale div abs(den))` is engine-portable.
  * Inputs must be integral (cast cents / counts upstream); decimals
  * keep the cross products exact up to ~1e38.
  */
object Stats {

  /** Per-group OLS fit of y on x. Emits the sufficient statistics
    * (n, sx, sy, sxx, sxy as BIGINT — exact at any tested scale) and
    * `slope_ppm` / `intercept_milli` fixed-point estimates; both are
    * NULL for degenerate groups (zero x-variance).
    */
  def linearFitGrouped(df: DataFrame, groupCols: Seq[String],
                       xCol: Column, yCol: Column): DataFrame = {
    val d = df.select(
      groupCols.map(col) ++ Seq(
        xCol.cast("decimal(38,0)").as("x"),
        yCol.cast("decimal(38,0)").as("y")): _*)
    d.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
           sum("x").as("sx"), sum("y").as("sy"),
           sum(expr("x * x")).as("sxx"),
           sum(expr("x * y")).as("sxy"))
      .withColumn("num", expr("n * sxy - sx * sy"))
      .withColumn("den", expr("n * sxx - sx * sx"))
      .select(
        groupCols.map(col) ++ Seq(
          col("n").cast("long").as("n"),
          col("sx").cast("long").as("sx"),
          col("sy").cast("long").as("sy"),
          col("sxx").cast("long").as("sxx"),
          col("sxy").cast("long").as("sxy"),
          expr("""case when den = 0 then null else
                    (case when (num < 0) != (den < 0) then -1 else 1 end)
                    * (abs(num) * 1000000 div abs(den)) end""")
            .as("slope_ppm"),
          expr("""case when den = 0 then null else
                    (case when ((sy * den - num * sx) < 0) != (den < 0)
                          then -1 else 1 end)
                    * (abs(sy * den - num * sx) * 1000 div abs(n * den)) end""")
            .as("intercept_milli")): _*)
  }

  /** Per-group median and median absolute deviation — the robust
    * location/scale pair (outlier-resistant alternative to mean/σ,
    * the robust cousin of `Series.sigmaOutliers`' threshold inputs).
    *
    * Integer-exact: "median" is the smallest value whose doubled
    * cumulative count reaches the group total (the `q_weighted_median`
    * crossing rule — no interpolation), applied twice: once to the
    * values, once to |value − median|. Each pass is one per-value
    * pre-aggregate (so the window walks DISTINCT values, not rows)
    * plus one cumulative window; the median table is group-cardinality
    * sized, so the join back is a broadcast at any data scale.
    */
  def medianAbsDev(df: DataFrame, groupCols: Seq[String],
                   valueCol: Column): DataFrame = {
    val d = df.select(groupCols.map(col) :+ valueCol.cast("long").as("v"): _*)

    // weighted crossing over (value, weight) rows — both passes run on
    // pre-aggregated per-value counts, never on raw rows. The
    // cumulative walk uses GlobalOrder's GROUPED running sum: with a
    // handful of groups a partitionBy window funnels the whole
    // distinct-value relation into that many tasks; the grouped form
    // stays P-way parallel. Totals are a G-row broadcast aggregate.
    def crossing(t: DataFrame, vc: String, out: String): DataFrame = {
      val totals = t.groupBy(groupCols.map(col): _*)
        .agg(sum("w").as("total"))
      GlobalOrder.withGroupedRunningSum(
          t, groupCols, Seq(col(vc)), col("w"), "cum")
        .join(broadcast(totals), groupCols)
        .filter(col("cum") * 2 >= col("total"))
        .groupBy(groupCols.map(col): _*)
        .agg(min(vc).as(out))
    }

    // ONE raw-data aggregation, materialized for both passes: the
    // deviation relation derives from the per-value counts (|v−med|
    // carries v's weight), so pass 2 re-aggregates ~distinct-values
    // rows, not the corpus
    val byVal = d.groupBy(groupCols.map(col) :+ col("v"): _*)
      .agg(count(lit(1)).as("w"))
      .localCheckpoint(eager = true)
    val med = crossing(byVal, "v", "median")
    val devW = byVal.join(broadcast(med), groupCols)
      .groupBy(groupCols.map(col) :+ abs(col("v") - col("median")).as("dev"): _*)
      .agg(sum("w").as("w"))
    crossing(devW, "dev", "mad").join(broadcast(med), groupCols)
      .select(groupCols.map(col) ++ Seq(col("median"), col("mad")): _*)
  }
}
