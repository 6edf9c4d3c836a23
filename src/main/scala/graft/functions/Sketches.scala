package graft.functions

import org.apache.spark.sql.Column

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
}
