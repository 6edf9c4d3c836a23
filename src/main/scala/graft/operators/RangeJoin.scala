package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned interval-overlap join — the standard rewrite that turns an
  * interval theta-join into an EQUI-join (the technique behind
  * Databricks' range-join hints and every genomics overlap joiner):
  * without it, Spark plans `l.start < r.end AND r.start < l.end` as a
  * BroadcastNestedLoopJoin (O(|L|·|R|) comparisons, undistributable
  * when neither side broadcasts). Each interval is exploded to the
  * fixed-width bins it touches; overlapping intervals necessarily
  * share the bin containing the overlap start, so joining on
  * (key, bin) + the exact predicate finds every pair once — the
  * dedup-free trick is to keep a candidate only when the overlap
  * START falls in the joined bin (each true pair survives in exactly
  * one bin, so no distinct pass over the candidate set is needed).
  *
  * Bin width is the fan-out/selectivity knob: intervals explode to
  * ~(len/width + 1) bins each, and a bin's candidates are its
  * residents' cross product — size it near the median interval
  * length. One shuffle per side, keyed by (key, bin).
  */
object RangeJoin {

  /** Pairs of overlapping half-open intervals `[start, end)`, equi-keyed
    * by `keyCol` first. `left`/`right` must carry (keyCol, idCol,
    * startCol, endCol) as BIGINT-comparable numerics; output is one row
    * per overlapping (left id, right id) pair with both ranges and the
    * overlap length.
    */
  def overlapJoin(left: DataFrame, right: DataFrame, keyCol: String,
                  idCol: String, startCol: String, endCol: String,
                  binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    def binned(df: DataFrame, side: String) = df.select(
        col(keyCol).as("k"),
        col(idCol).as(s"${side}_id"),
        col(startCol).as(s"${side}_start"),
        col(endCol).as(s"${side}_end"))
      .filter(col(s"${side}_start") < col(s"${side}_end"))
      .withColumn("bin", explode(sequence(
        expr(s"${side}_start div $binWidth"),
        // end is exclusive: the last touched bin holds end−1
        expr(s"(${side}_end - 1) div $binWidth"))))
    val l = binned(left, "l")
    val r = binned(right, "r")
    l.join(r, Seq("k", "bin"))
      .filter(col("l_start") < col("r_end") && col("r_start") < col("l_end"))
      // each overlapping pair meets in every shared bin; keep the one
      // bin that contains the overlap's first point — exactly one per
      // pair, no global distinct
      .filter(col("bin") === expr(s"greatest(l_start, r_start) div $binWidth"))
      .select(col("k").as(keyCol),
        col("l_id"), col("r_id"),
        col("l_start"), col("l_end"), col("r_start"), col("r_end"),
        (least(col("l_end"), col("r_end")) -
          greatest(col("l_start"), col("r_start"))).as("overlap_len"))
  }
}
