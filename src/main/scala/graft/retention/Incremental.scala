package graft.retention

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

case class HhEncounter(household_id: Long, admit_epoch_day: Int)

/** Keyed state: the distinct in-window admit dates (epoch days,
  * sorted). Bounded: dates are DATE-grain inside the scan window, so
  * ≤ ~1827 ints per household at the reference's 5-year lookback. */
case class HhState(days: List[Int], version: Long)

case class HhRange(household_id: Long, version: Long, retained: Boolean,
                   start_month: String, end_month: String)

/** Incremental (streaming) maintenance of the flagship retention
  * computation: encounters arrive as a stream, per-household state
  * holds the distinct admit dates, and every update re-derives that
  * household's collapsed ranges — the streaming dual of
  * `Retention.householdRanges`, built on `flatMapGroupsWithState`.
  *
  * The reference job re-runs the whole batch to refresh retention
  * (SURVEY.md §3); this operator updates ONLY the households that
  * received encounters, in one pass, with O(|window dates|) state per
  * household — at 100 TB/day of events the work per trigger is
  * proportional to the delta, not the corpus.
  *
  * Emission contract: each trigger emits the household's full current
  * range set tagged with a monotet version; downstream consumers (or
  * the keyed upsert sink, whose whole-array-replace semantics match
  * exactly) keep the highest version per household.
  */
object Incremental {

  /** Pure per-household range derivation — the same semantics as the
    * distributed pipeline (spec: SURVEY.md §0 retention semantics),
    * expressed as plain Scala over one household's admit days. Shared
    * by the streaming state function; differentially tested against
    * the batch pipeline. */
  def rangesFor(daysSorted: Seq[Int], cfg: RetentionConfig): Seq[(Boolean, LocalDate, LocalDate)] = {
    val asOfM = cfg.asOf.withDayOfMonth(1)
    val spine = (0 to cfg.windowMonths).map(i =>
      asOfM.minusMonths((cfg.windowMonths - i).toLong))
    val dates = daysSorted.map(d => LocalDate.ofEpochDay(d.toLong))
      .filter(d => !d.isBefore(cfg.asOf.minusYears(cfg.scanYears.toLong)) &&
                   !d.isAfter(cfg.asOf))
    val retainedMonths: Set[LocalDate] = dates.sliding(2).collect {
      case Seq(prev, cur)
          if !prev.isBefore(cur.minusDays(cfg.lookbackDays.toLong)) =>
        cur.withDayOfMonth(1)
    }.toSet
    // collapse consecutive same-state months
    spine.foldLeft(List.empty[(Boolean, LocalDate, LocalDate)]) {
      case ((st, s, _) :: tail, m) if st == retainedMonths(m) =>
        (st, s, m) :: tail
      case (acc, m) => (retainedMonths(m), m, m) :: acc
    }.reverse
  }

  /** Streaming transform: encounter events → per-household updated
    * range rows (Update mode; keep max `version` per household). */
  def updates(encounters: Dataset[HhEncounter], cfg: RetentionConfig)
      : Dataset[HhRange] = {
    import encounters.sparkSession.implicits._
    encounters.groupByKey(_.household_id)
      .flatMapGroupsWithState[HhState, HhRange](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (hh: Long, it: Iterator[HhEncounter], state: GroupState[HhState]) =>
          val prev = state.getOption.getOrElse(HhState(Nil, 0L))
          // prune below the scan horizon at update time — without this
          // the per-household list would accumulate every day ever
          // seen and the "bounded state" contract would quietly break
          // on a long-running stream
          val horizon = cfg.asOf.minusYears(cfg.scanYears.toLong).toEpochDay.toInt
          val merged =
            (prev.days ++ it.map(_.admit_epoch_day))
              .filter(_ >= horizon).distinct.sorted
          val next = HhState(merged, prev.version + 1)
          state.update(next)
          rangesFor(merged, cfg).map { case (st, s, e) =>
            HhRange(hh, next.version, st, s.toString, e.toString)
          }.iterator
      }
  }

  /** Latest emission per household from an Update-mode sink table. */
  def latest(emitted: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("household_id")
    emitted.withColumn("_maxv", max(col("version")).over(w))
      .filter(col("version") === col("_maxv"))
      .drop("_maxv", "version")
  }

  /** End-to-end streaming sink wiring: per microbatch, nest each
    * updated household's ranges and upsert them into the durable keyed
    * table — the streaming replacement for the reference's
    * run-the-whole-batch-then-bulk-upsert cycle. The upsert's
    * whole-row-replace semantics make each batch's write idempotent
    * per household, and its staged commit keeps the table consistent
    * if a microbatch dies mid-write. */
  def writeToKeyedSink(updates: Dataset[HhRange], sinkPath: String,
                       numBuckets: Int = 64)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.functions._
    updates.toDF().writeStream.outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val nested = latest(batch)
          .groupBy("household_id")
          .agg(array_sort(collect_list(struct(
            col("start_month"), col("end_month"), col("retained"))))
            .as("ranges"))
        graft.sources.KeyedUpsert.upsert(
          batch.sparkSession, sinkPath, nested, "household_id", numBuckets)
      }
  }
}
