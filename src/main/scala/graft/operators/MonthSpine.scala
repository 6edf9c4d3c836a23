package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Month-spine dimension generator.
  *
  * The reference builds a 49-row first-of-month list on the driver with
  * joda-time and `spark.createDataFrame` (reference
  * HouseholdRetentionProcessing.scala:482-497). Spark-native form: a
  * single-row relation exploded through `sequence(start, stop, interval
  * 1 month)` — a codegen'd `Generator`, no driver loop, and Catalyst
  * folds it to a constant-size local relation that broadcasts for free
  * in the scaffold cross join (SURVEY.md S6/J2).
  */
object MonthSpine {

  /** `months+1` first-of-month DATE rows ending at `trunc(asOf, 'MM')`
    * inclusive — the reference's `[firstOfCurrentMonth - 4y,
    * firstOfCurrentMonth]` window (:486-491) generalized.
    */
  def spine(spark: SparkSession, asOf: java.time.LocalDate, months: Int): DataFrame = {
    val end = asOf.withDayOfMonth(1)
    val start = end.minusMonths(months.toLong)
    spark.range(1).select(
      explode(sequence(
        lit(java.sql.Date.valueOf(start)),
        lit(java.sql.Date.valueOf(end)),
        expr("interval 1 month"))).as("start_of_month"))
  }
}
