package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.expressions.MisraGriesAgg

/** Sketch aggregates for corpus-scale statistics (additive beyond the
  * reference — BASELINE.json north star). Built-in sketches Spark
  * already ships (`approx_count_distinct` HLL++, `percentile_approx`,
  * `count_min_sketch`) are used directly and spec-pinned in
  * ApproxAggSpec; this object holds the ones Spark lacks. */
object Sketches {

  /** Heavy-hitter (frequent-items) sketch: top tokens by approximate
    * count in ONE pass with `capacity` counters per partial aggregate
    * — see [[expressions.MisraGriesAgg]] for guarantees. Returns
    * `array<struct<token,est>>` ordered (est DESC, token ASC). */
  def heavyHitters(col: Column, capacity: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      MisraGriesAgg(org.apache.spark.sql.GraftSqlBridge.expression(col),
        capacity).toAggregateExpression())

  /** Bounded-heap per-group top-k — see [[expressions.TopKPairsAgg]]
    * for why this beats the `row_number` window idiom at scale.
    * Returns `array<struct<score,id>>`, score DESC / id ASC. */
  def topKPairs(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      expressions.TopKPairsAgg(
        org.apache.spark.sql.GraftSqlBridge.expression(score),
        org.apache.spark.sql.GraftSqlBridge.expression(id),
        k).toAggregateExpression())

  /** Mergeable per-group HyperLogLog distinct-count sketch — see
    * [[expressions.HllAgg]]. Returns
    * `struct<n_zero_registers,sum_rho,inv_scaled>` (integer-exact
    * state; estimate via [[hllEstimate]]). */
  def hllDistinct(key: Column, p: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      expressions.HllAgg(
        org.apache.spark.sql.GraftSqlBridge.expression(key), p)
        .toAggregateExpression())

  /** The standard HLL estimator over [[hllDistinct]]'s integer state:
    * alpha·m²/Σ2^-rho with the small-range linear-counting switch —
    * driver/consumer-side floats, deliberately OUTSIDE the oracle
    * surface (see [[expressions.HllAgg]] scaladoc). */
  def hllEstimate(nZeroRegisters: Long, invScaled: Long, p: Int): Double = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val invSum = invScaled.toDouble / Math.scalb(1.0, 61 - p)
    val raw = alpha * m * m / invSum
    if (raw <= 2.5 * m && nZeroRegisters > 0)
      m * math.log(m.toDouble / nZeroRegisters)
    else raw
  }

  /** HyperLogLog register table over `keyCol` strings, built on the
    * cross-engine md5-derived 60-bit hash ([[Dedup.md5Hash60]]) so the
    * SKETCH ITSELF is oracle-checkable — unlike
    * `approx_count_distinct`, whose internal HLL++ registers no other
    * engine can reproduce. Low `p` bits of the hash pick the register;
    * rho = leading-zero run of the remaining 60−p bits, plus one,
    * computed integer-only via `length(bin(w))` (both Spark and DuckDB
    * print binary without leading zeros). Returns (register, max_rho):
    * ≤ 2^p rows. The shuffle carries only 2^p partially-aggregated
    * max() cells per map task — the mergeable-sketch shape that makes
    * HLL the distributed distinct-count workhorse; the float estimate
    * (alpha·m²/Σ2^-rho) is a driver-side epilogue left to callers.
    */
  def hllRegisters(df: DataFrame, keyCol: String, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"p out of range: $p")
    val m = 1L << p
    val h = Dedup.md5Hash60(col(keyCol).cast("string"))
    // integer shift, NOT h/m: long `/` is double division in Spark and
    // loses exactness past 2^53 — h is 60-bit
    val w = shiftright(h, p) // the 60−p payload bits
    val rho = when(w === 0, lit(60 - p + 1).cast("long"))
      .otherwise(lit(60 - p + 1) - length(bin(w)).cast("long"))
    df.select(pmod(h, lit(m)).as("register"), rho.as("rho"))
      .groupBy("register").agg(max("rho").as("max_rho"))
  }

  /** Count-Min sketch + point estimates, oracle-exact: `depth`
    * independent rows of `width` counters, cell (j, b) = number of
    * input rows whose salted hash `md5Hash60(j || ':' || key) % width`
    * is b; the estimate for a key is the min over its `depth` cells
    * (overestimate-only, ε = e/width with probability 1−(1/e)^depth).
    * Scale shape: the per-key counts aggregate FIRST (one hash shuffle
    * on the key — needed for the truth column anyway), and the ×depth
    * explosion happens on the compressed per-key rows, so the sketch
    * build shuffles depth·|distinct keys| rows, not depth·|input|.
    * Returns (key, true_cnt, cm_est) per distinct key.
    */
  def countMinEstimates(df: DataFrame, keyCol: String,
                        depth: Int, width: Int): DataFrame = {
    val truth = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("true_cnt"))
    val salted = truth.select(col("key"), col("true_cnt"),
        explode(array((0 until depth).map(lit): _*)).as("j"))
      .withColumn("b", pmod(
        Dedup.md5Hash60(concat(col("j").cast("string"), lit(":"), col("key"))),
        lit(width.toLong)))
    val cells = salted.groupBy("j", "b").agg(sum("true_cnt").as("cell"))
    salted.join(cells, Seq("j", "b"))
      .groupBy("key")
      .agg(max("true_cnt").as("true_cnt"), min("cell").as("cm_est"))
  }
}
