package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture shapes: SCD2 validity intervals from an event
  * log, and latest-per-key compaction with delete semantics.
  *
  * The reference's keyed upsert into `household_retention_history`
  * (reference HouseholdRetentionProcessing.scala:812-825 — overwrite
  * the per-person doc wholesale each run) is the degenerate "type 1"
  * form of this; SCD2 keeps the history the reference throws away.
  */
object ChangeCapture {

  /** SCD2 interval build: collapse consecutive identical states per
    * key, then emit [valid_from, valid_to) versions; the open interval
    * (`valid_to` NULL) is the current state.
    *
    * One shuffle: both windows share the same (partition, ordering), so
    * Catalyst plans a single exchange+sort and the filter between them
    * preserves the sort — `.explain` shows one Sort, two Window nodes.
    * `tieCol` makes the ordering total when timestamps collide.
    */
  def scd2(events: DataFrame, keyCol: String, stateCol: String,
           tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    events
      .select(col(keyCol), col(stateCol), col(tsCol), col(tieCol))
      .withColumn("prev_state", lag(col(stateCol), 1).over(w))
      .filter(col("prev_state").isNull || col("prev_state") =!= col(stateCol))
      .drop("prev_state")
      .withColumn("version", row_number().over(w))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col(stateCol).as("state"), col("version"),
              col(tsCol).as("valid_from"), col("valid_to"),
              col("valid_to").isNull.as("is_current"))
  }

  /** CDC compaction: the latest state per key, dropping keys whose
    * latest record is a delete.
    *
    * Deliberately an aggregate (`max_by` over a (ts, tie) struct), NOT
    * a `row_number() = 1` window: the aggregate partial-combines
    * map-side, so at 100 TB each executor ships one candidate row per
    * key instead of sorting every partition's full history — the
    * classic compaction read-path (Delta/Hudi snapshot read) shape.
    */
  def cdcLatest(events: DataFrame, keyCol: String, stateCol: String,
                tsCol: String, tieCol: String,
                deleteState: String): DataFrame = {
    val ord = struct(col(tsCol), col(tieCol))
    events
      .select(col(keyCol), col(stateCol), col(tsCol), col(tieCol))
      .groupBy(col(keyCol))
      .agg(max_by(col(stateCol), ord).as("state"),
           max(ord).as("last"))
      .filter(col("state") =!= lit(deleteState))
      .select(col(keyCol), col("state"), col("last")(tsCol).as("last_ts"))
  }
}
