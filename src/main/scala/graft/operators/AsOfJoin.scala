package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — an operator Spark has no
  * built-in for, composed scale-first instead of via a custom
  * SparkPlan: the naive formulation (non-equi join + groupBy-max per
  * left row) explodes to |left|×|matching right| intermediate rows; a
  * custom physical operator would work but isn't needed — the classic
  * union-and-carry rewrite expresses it with built-ins in ONE shuffle:
  *
  *  1. union left probes and right states, tagged;
  *  2. window per key ordered by (time, tag): `last(value,
  *     ignoreNulls)` carries the most recent right state forward;
  *  3. keep left rows, now annotated with the as-of state.
  *
  * Matches `l ASOF JOIN r ON l.key = r.key AND l.t >= r.t` (ties: a
  * right state AT the probe time wins, because right sorts before left
  * at equal times). Left rows with no earlier right state keep nulls
  * (left-outer semantics, like DuckDB's ASOF LEFT JOIN).
  */
object AsOfJoin {

  /** @param left       probe side; one output row per input row
    * @param right      state side; its `valueCols` are carried forward
    * @param keys       equi keys present on both sides
    * @param leftTime   probe time column on `left`
    * @param rightTime  state time column on `right` (same type)
    * @param valueCols  columns of `right` to attach (must not clash
    *                   with `left` column names)
    */
  def joinAsOf(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTime: String, rightTime: String,
               valueCols: Seq[String]): DataFrame = {
    val t = "_asof_t"
    val tag = "_asof_tag" // 0 = right/state, 1 = left/probe
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn(t, col(leftTime)).withColumn(tag, lit(1))
      .select((keys :+ t :+ tag).map(col) ++
        leftCols.filterNot(keys.contains).map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right
      .withColumn(t, col(rightTime)).withColumn(tag, lit(0))
      .select((keys :+ t :+ tag).map(col) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(t), col(tag))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = valueCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col(tag) === 1).drop(t, tag)
  }

  /** Forward as-of: the EARLIEST right state at-or-after each probe
    * (`l.t <= r.t`, ties match) — pandas `merge_asof
    * direction='forward'`. Same one-shuffle union-and-carry shape as
    * [[joinAsOf]], mirrored: right rows sort AFTER left rows at equal
    * times (so an exactly-simultaneous state matches), and the window
    * runs `first(ignoreNulls)` over the FOLLOWING frame instead of
    * `last` over the preceding one. */
  def joinAsOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTime: String, rightTime: String,
                      valueCols: Seq[String]): DataFrame = {
    val t = "_asof_t"
    val tag = "_asof_tag" // 1 = left/probe, 2 = right/state (right last)
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn(t, col(leftTime)).withColumn(tag, lit(1))
      .select((keys :+ t :+ tag).map(col) ++
        leftCols.filterNot(keys.contains).map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right
      .withColumn(t, col(rightTime)).withColumn(tag, lit(2))
      .select((keys :+ t :+ tag).map(col) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(t), col(tag))
      .rowsBetween(0, Window.unboundedFollowing)
    val carried = valueCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, first(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col(tag) === 1).drop(t, tag)
  }

  /** Nearest as-of: whichever right state is closer in time, the
    * at-or-before one (distance `t − rt`) or the strictly-after one
    * (`rt − t`); ties go BACKWARD (the at-or-before state) — pandas
    * `merge_asof direction='nearest'`. `leftTime`/`rightTime` must be
    * numeric (epoch units): the tie-break subtracts them. Still ONE
    * shuffle: both the carried-backward and carried-forward state ride
    * the same union sort (two window frames over one partitioning). */
  def joinAsOfNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTime: String, rightTime: String,
                      valueCols: Seq[String]): DataFrame = {
    val t = "_asof_t"
    val tag = "_asof_tag" // 0 = right/state, 1 = left/probe
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn(t, col(leftTime)).withColumn(tag, lit(1))
      .select((keys :+ t :+ tag).map(col) ++
        leftCols.filterNot(keys.contains).map(col) ++
        valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val r = right
      .withColumn(t, col(rightTime)).withColumn(tag, lit(0))
      .select((keys :+ t :+ tag).map(col) ++
        leftCols.filterNot(keys.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        valueCols.map(col): _*)
    // right sorts before left at equal t ⇒ the preceding frame sees
    // same-time states (distance 0, always wins) and the following
    // frame sees strictly-later ones only — exactly backward(≤)/
    // forward(>) of the nearest contract
    val ord = Window.partitionBy(keys.map(col): _*).orderBy(col(t), col(tag))
    val wPrev = ord.rowsBetween(Window.unboundedPreceding, 0)
    val wNext = ord.rowsBetween(0, Window.unboundedFollowing)
    val stateT = when(col(tag) === 0, col(t))
    val both = valueCols.foldLeft(
      l.unionByName(r)
        .withColumn("_p_t", last(stateT, ignoreNulls = true).over(wPrev))
        .withColumn("_n_t", first(stateT, ignoreNulls = true).over(wNext))) {
      (df, c) =>
        df.withColumn(s"_p_$c", last(col(c), ignoreNulls = true).over(wPrev))
          .withColumn(s"_n_$c", first(col(c), ignoreNulls = true).over(wNext))
    }
    val takePrev = col("_p_t").isNotNull &&
      (col("_n_t").isNull || (col(t) - col("_p_t")) <= (col("_n_t") - col(t)))
    val chosen = valueCols.foldLeft(both) { (df, c) =>
      df.withColumn(c, when(takePrev, col(s"_p_$c")).otherwise(col(s"_n_$c")))
    }
    chosen.filter(col(tag) === 1)
      .drop((Seq(t, tag, "_p_t", "_n_t") ++
        valueCols.flatMap(c => Seq(s"_p_$c", s"_n_$c"))): _*)
  }
}
