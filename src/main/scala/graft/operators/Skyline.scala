package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier, minimize both axes) per group — the
  * multi-objective "best tradeoffs" query: cheapest-for-its-size,
  * best-quality-for-its-cost, shortest-for-its-recency. Classic OLAP
  * operator (Börzsönyi et al., ICDE'01) that SQL engines express as a
  * quadratic NOT EXISTS self-join; this form is O(n log n) and
  * partition-parallel.
  *
  * Row r is dominated iff another row in its group is ≤ on both axes
  * and < on at least one. Equivalently, sorted by x:
  *   - some strictly-smaller-x row has y ≤ r.y   (min over x-range
  *     frame `(-∞, x−1]`), or
  *   - some equal-x row has y < r.y              (min over the x-peer
  *     frame — r survives iff it attains the peer minimum).
  * Two value-range window minima over ONE sort, exact duplicate
  * points all survive (no strict edge), ties need no arbitration.
  * Inputs must be integral (cast cents upstream) so the range frame
  * offsets are exact.
  */
object Skyline {

  /** Rows of `df` on the per-group Pareto frontier (both `xCol` and
    * `yCol` minimized). Pass `maximize`d axes negated upstream. */
  def pareto2d(df: DataFrame, groupCols: Seq[String],
               xCol: Column, yCol: Column): DataFrame = {
    val base = df.withColumn("_x", xCol.cast("long"))
      .withColumn("_y", yCol.cast("long"))
    val wPrev = Window.partitionBy(groupCols.map(col): _*).orderBy(col("_x"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wPeer = Window.partitionBy(groupCols.map(col): _*).orderBy(col("_x"))
      .rangeBetween(Window.currentRow, Window.currentRow)
    base
      .withColumn("_m_lt", min("_y").over(wPrev))
      .withColumn("_m_eq", min("_y").over(wPeer))
      .filter((col("_m_lt").isNull || col("_m_lt") > col("_y")) &&
              col("_m_eq") === col("_y"))
      .drop("_x", "_y", "_m_lt", "_m_eq")
  }
}
