package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ordering: `row_number` / `rank` / `ntile` /
  * running sums over a TOTAL order without the single-partition
  * WindowExec.
  *
  * `Window.orderBy(...)` with no partition spec requires
  * `SinglePartition` — Spark moves the ENTIRE input through one
  * exchange into one task and sorts it on one core. Invisible at
  * sf0.01; at 100 TB it is the first thing that stops finishing. This
  * operator computes the identical numbering the way a distributed
  * engine must:
  *
  *   1. `repartitionByRange(P, sortCols)` — Spark's own range
  *      partitioner (sampled split points) puts partition i's keys
  *      entirely before partition i+1's, equal keys co-located;
  *   2. the window runs per range-partition (`partitionBy` the
  *      materialized `spark_partition_id`), P-way parallel;
  *   3. a P-row offset table (rows/rank-base/value-sum per partition,
  *      prefix-summed — P rows, the one place a tiny unpartitioned
  *      window is the RIGHT tool) is broadcast back and added.
  *
  * No driver action: the offset table stays a (bounded) plan node.
  * The range-partitioned frame is pinned with an eager
  * `localCheckpoint` — it feeds both the offset aggregate and the
  * final join, and re-evaluating `repartitionByRange` would re-sample
  * split points (nondeterministic pid assignment between the two
  * consumers corrupts the offsets).
  *
  * Semantics notes:
  *   - ties: equal sort keys land in one range partition, so `rank`
  *     (and `row_number` under a total tiebreak — what every call
  *     site uses) matches the global-window value exactly;
  *   - sort direction / null ordering ride on the `Column`s
  *     themselves (`col.desc` etc.) and are interpreted identically
  *     by the range partitioner and the per-partition window;
  *   - `ntile(n)` is derived from the global row number with SQL
  *     NTILE's exact uneven-bucket rule (first `total mod n` buckets
  *     one row larger), so it is bit-compatible with both engines'
  *     NTILE at any total. */
object GlobalOrder {

  private val PID = "__go_pid"

  /** Row-count threshold below which the plain single-partition window
    * beats the distributed numbering: the distributed form pays a fixed
    * stage tax (range shuffle + pinning checkpoint + offset join,
    * ~1-1.5 s at local[32]) that only amortizes once the relation is
    * big enough that ONE task sorting it is the slower evil. Default
    * 1M: measured at sf1, a 1.5M-row double-ntile was already FASTER
    * distributed (2.62 s) than single-task (3.36 s), while the gated
    * post-aggregation relations (≤150k rows) sit far below either
    * bound. Conf-tunable per deployment. */
  def smallThreshold(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.get("spark.graft.globalorder.smallThreshold", "1000000").toLong

  /** Cardinality gate for the `*Auto` variants: a caller-supplied bound
    * decides statically (zero cost — use it when the bound is provable,
    * e.g. a post-aggregation keyed by a dimension); with no bound the
    * input is persisted and counted in ONE job — the count action
    * materializes the cache, BOTH branches read the cached blocks, and
    * (the part an eager checkpoint cannot replicate) any SIBLING plan
    * containing the same subtree hits the cache too, by the
    * CacheManager's plan match — callers like q_calibration's total
    * aggregate lean on exactly that (a localCheckpoint swap was
    * measured at 2.2-2.8× on the gated bench queries and reverted).
    * MEMORY_AND_DISK: storage-evictable and spilling, never an OOM
    * vector when the gate discovers the input is big.
    *
    * The unmatched persist WOULD accumulate one CacheManager entry per
    * invocation for the session lifetime (the ADVICE r10 leak), so the
    * gate keeps a small PER-SESSION FIFO of its pinned frames and
    * unpersists the oldest beyond [[GatePinCap]] — by then the owning
    * query has long materialized, and even a straggler merely
    * recomputes (unpersist never affects correctness). Per-session
    * (round-12): a JVM-global FIFO let one session's gates evict
    * another's still-warm pins (doubling work, not breaking anything)
    * and strongly retained up to 8 frames — and through them stopped
    * SparkContexts — for the process lifetime. Now pins from one
    * session never evict another session's, and every gate first
    * purges entries whose context has stopped (their blocks died with
    * the context; dropping the map entry releases the reference). */
  private[graft] val GatePinCap = 8
  /** Aggregate bound ACROSS sessions (round-13, ADVICE): sessions from
    * `spark.newSession()` share one LIVE context, so the isStopped
    * purge never fires for them — a server minting short-lived
    * sessions would otherwise hold GatePinCap frames per session
    * without bound. Beyond this total, the OLDEST session's oldest
    * pin is evicted (unpersist never affects correctness). */
  private[graft] val GlobalPinCap = GatePinCap * 4
  private val gatePins = new java.util.LinkedHashMap[
    org.apache.spark.sql.SparkSession, java.util.ArrayDeque[DataFrame]]()
  /** Test hook: the live pin FIFO for `spark` (copied). */
  private[graft] def gatePinSnapshot(
      spark: org.apache.spark.sql.SparkSession): Seq[DataFrame] =
    gatePins.synchronized {
      Option(gatePins.get(spark))
        .map(dq => dq.toArray(new Array[DataFrame](0)).toSeq)
        .getOrElse(Seq.empty)
    }
  private def gated(df: DataFrame, bound: Option[Long]): (DataFrame, Long) =
    bound match {
      case Some(n) => (df, n)
      case None =>
        val spark = df.sparkSession
        val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        gatePins.synchronized {
          // purge dead sessions: their cached blocks are already gone
          // (unpersist on a stopped context throws), and keeping the
          // entry would pin the stopped SparkContext on the heap
          gatePins.entrySet().removeIf(e => e.getKey.sparkContext.isStopped)
          var dq = gatePins.get(spark)
          if (dq == null) {
            dq = new java.util.ArrayDeque[DataFrame]()
            gatePins.put(spark, dq)
          }
          dq.addLast(p)
          // the eviction must never fail the CURRENT query — but
          // swallow only NonFatal, re-asserting interrupts
          def drop(old: DataFrame): Unit =
            try old.unpersist(false) catch {
              case ie: InterruptedException =>
                Thread.currentThread().interrupt()
              case scala.util.control.NonFatal(_) => ()
            }
          if (dq.size > GatePinCap) drop(dq.removeFirst())
          // aggregate cap across live sessions: evict oldest-session
          // pins first (insertion order = session age); empty deques
          // leave the map so a long-gone session stops occupying a slot
          var total = 0
          gatePins.values.forEach(d => total += d.size)
          while (total > GlobalPinCap) {
            val it = gatePins.entrySet().iterator()
            val oldest = it.next()
            drop(oldest.getValue.removeFirst())
            if (oldest.getValue.isEmpty) it.remove()
            total -= 1
          }
        }
        (p, p.count())
    }

  /** Range-partition on the sort order and pin partition ids. */
  private def ranged(df: DataFrame, sortCols: Seq[Column], parts: Int): DataFrame = {
    val p =
      if (parts > 0) parts
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    LoopCheckpoint(
      df.repartitionByRange(p, sortCols: _*)
        .withColumn(PID, spark_partition_id()))
  }

  /** Exclusive prefix of each aggregate per pid: P rows, broadcast
    * back as `__go_off0..__go_offN-1` (input order) — the ONE
    * definition of the prefix-offset table every numbering uses. */
  private def offsets(s: DataFrame, aggCols: Seq[Column]): DataFrame = {
    val named = aggCols.zipWithIndex.map { case (a, i) => a.as(s"__go_n$i") }
    val w = Window.orderBy(PID).rowsBetween(Window.unboundedPreceding, -1)
    aggCols.indices.foldLeft(
        s.groupBy(col(PID)).agg(named.head, named.tail: _*)) { (d, i) =>
      d.withColumn(s"__go_off$i",
        coalesce(sum(col(s"__go_n$i")).over(w), lit(0L)))
    }.select(col(PID) +: aggCols.indices.map(i => col(s"__go_off$i")): _*)
  }

  /** Global `row_number()` over `sortCols` as LongType column `out`.
    * Deterministic iff the sort is a total order (tiebreak to a key) —
    * the same contract as the window it replaces. */
  def withRowNumber(df: DataFrame, sortCols: Seq[Column], out: String,
                    parts: Int = 0): DataFrame = {
    val s = ranged(df, sortCols, parts)
    val w = Window.partitionBy(PID).orderBy(sortCols: _*)
    s.withColumn("__go_rn", row_number().over(w).cast("long"))
      .join(broadcast(offsets(s, Seq(count(lit(1))))), PID)
      .withColumn(out, col("__go_off0") + col("__go_rn"))
      .drop(PID, "__go_rn", "__go_off0")
  }

  /** Global `rank()` (gap semantics) over `sortCols`. Equal keys are
    * co-located by the range partitioner, so per-partition rank plus
    * the prior-partition row count is the global rank. */
  def withRank(df: DataFrame, sortCols: Seq[Column], out: String,
               parts: Int = 0): DataFrame = {
    val s = ranged(df, sortCols, parts)
    val w = Window.partitionBy(PID).orderBy(sortCols: _*)
    s.withColumn("__go_rk", rank().over(w).cast("long"))
      .join(broadcast(offsets(s, Seq(count(lit(1))))), PID)
      .withColumn(out, col("__go_off0") + col("__go_rk"))
      .drop(PID, "__go_rk", "__go_off0")
  }

  /** Global `ntile(n)` over `sortCols`: SQL NTILE's exact rule from
    * the global row number — base bucket size `total div n`, first
    * `total mod n` buckets get one extra row. */
  def withNtile(df: DataFrame, n: Int, sortCols: Seq[Column], out: String,
                parts: Int = 0): DataFrame = {
    require(n > 0, s"ntile bucket count must be positive, got $n")
    val numbered = withRowNumber(df, sortCols, "__go_grn", parts)
    // total row count re-aggregates the INPUT (scan + count, no sort)
    // rather than re-evaluating the numbered plan a second time
    val total = df.agg(count(lit(1)).as("__go_total"))
    numbered.crossJoin(broadcast(total))
      .withColumn(out, expr(
        s"""CASE
           |  WHEN __go_total < $n THEN __go_grn
           |  WHEN __go_grn <= (__go_total div $n + 1) * (__go_total % $n)
           |    THEN (__go_grn - 1) div (__go_total div $n + 1) + 1
           |  ELSE __go_total % $n
           |    + (__go_grn - 1 - (__go_total div $n + 1) * (__go_total % $n))
           |      div (__go_total div $n) + 1
           |END""".stripMargin))
      .drop("__go_grn", "__go_total")
  }

  /** Global running sum of `valueCol` over `sortCols`
    * (`rowsBetween(unboundedPreceding, currentRow)`): per-partition
    * running sum plus the prior partitions' value total. The window's
    * LongType overflow semantics are preserved (offsets sum in
    * BIGINT); widen `valueCol` upstream if the total needs it. */
  def withRunningSum(df: DataFrame, sortCols: Seq[Column], valueCol: Column,
                     out: String, parts: Int = 0): DataFrame =
    withRunningSums(df, sortCols, Seq((valueCol, out)), parts)

  /** Several global running sums over ONE sort order in ONE ranged
    * pass — chaining [[withRunningSum]] would re-pay the range
    * shuffle + pinning checkpoint once PER SUM over the identical
    * key (the q_ks_test shape: cumulative F and O counts over the
    * same pooled support). One per-partition window computes every
    * prefix; one P-row offset table carries every column's exclusive
    * total. */
  def withRunningSums(df: DataFrame, sortCols: Seq[Column],
                      sums: Seq[(Column, String)],
                      parts: Int = 0): DataFrame = {
    require(sums.nonEmpty, "need at least one (valueCol, out) sum")
    require(sums.map(_._2).distinct.size == sums.size,
      s"duplicate output names in sums: ${sums.map(_._2).mkString(", ")} — " +
        "the withColumn fold would silently clobber the earlier sum")
    sums.map(_._2).find(df.columns.contains).foreach { o =>
      throw new IllegalArgumentException(
        s"running-sum output name '$o' already exists in the input — " +
          "it would silently replace the input column; rename one")
    }
    val vcols = sums.zipWithIndex.map { case ((v, _), i) => v.as(s"__go_v$i") }
    val s = ranged(df.select(col("*") +: vcols: _*), sortCols, parts)
    val w = Window.partitionBy(PID).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = offsets(s, sums.indices.map(i => sum(col(s"__go_v$i"))))
    val prefixed = sums.indices.foldLeft(s) { (d, i) =>
      d.withColumn(s"__go_ps$i", sum(col(s"__go_v$i")).over(w))
    }
    val out = sums.zipWithIndex.foldLeft(
        prefixed.join(broadcast(offs), PID)) { case (d, ((_, o), i)) =>
      d.withColumn(o, col(s"__go_off$i") + col(s"__go_ps$i"))
    }
    out.drop(PID +: sums.indices.flatMap(i =>
      Seq(s"__go_v$i", s"__go_ps$i", s"__go_off$i")): _*)
  }

  // ------------------------------------------------------------------
  // Grouped variants — the LOW-CARDINALITY-partition window fix.
  //
  // `Window.partitionBy(g).orderBy(k)` parallelizes by GROUP: with 3
  // return flags or 5 order priorities over a fact table, the whole
  // relation moves into 3-5 tasks, each holding and sorting its
  // group single-threaded — the same non-finishing shape at 100 TB
  // as the unpartitioned window, one level down. These compute the
  // identical grouped numbering by range-partitioning on
  // (group ++ sort) — P-way parallel regardless of group count —
  // with per-(group, range-partition) prefix offsets broadcast back.
  // The offset table is ≤ G·P rows: intended for low-cardinality
  // groups (at high G the plain grouped window is already parallel
  // and is the right tool).
  // ------------------------------------------------------------------

  /** Exclusive per-group prefix of `agg` ordered by pid: ≤ G·P rows. */
  private def groupedOffsets(s: DataFrame, groupCols: Seq[String],
                             aggCol: Column): DataFrame = {
    s.groupBy(col(PID) +: groupCols.map(col): _*).agg(aggCol.as("__go_n"))
      .withColumn("__go_off",
        coalesce(sum("__go_n").over(
          Window.partitionBy(groupCols.map(col): _*).orderBy(PID)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(PID) +: groupCols.map(col) :+ col("__go_off"): _*)
  }

  /** `rank().over(Window.partitionBy(groupCols).orderBy(sortCols))`
    * without the per-group task collapse. Equal (group, key) rows are
    * co-located by the range partitioner, so per-partition rank plus
    * the group's prior-partition row count is the global grouped rank
    * (gap semantics preserved). */
  def withGroupedRank(df: DataFrame, groupCols: Seq[String],
                      sortCols: Seq[Column], out: String,
                      parts: Int = 0): DataFrame = {
    val s = ranged(df, groupCols.map(col) ++ sortCols, parts)
    val w = Window.partitionBy(col(PID) +: groupCols.map(col): _*)
      .orderBy(sortCols: _*)
    s.withColumn("__go_rk", rank().over(w).cast("long"))
      .join(broadcast(groupedOffsets(s, groupCols, count(lit(1)))),
        PID +: groupCols)
      .withColumn(out, col("__go_off") + col("__go_rk"))
      .drop(PID, "__go_rk", "__go_off")
  }

  /** `row_number()` per group over `sortCols`, distributed as
    * [[withGroupedRank]] (deterministic iff the sort totally orders
    * each group — the grouped window's own contract). */
  def withGroupedRowNumber(df: DataFrame, groupCols: Seq[String],
                           sortCols: Seq[Column], out: String,
                           parts: Int = 0): DataFrame = {
    val s = ranged(df, groupCols.map(col) ++ sortCols, parts)
    val w = Window.partitionBy(col(PID) +: groupCols.map(col): _*)
      .orderBy(sortCols: _*)
    s.withColumn("__go_rn", row_number().over(w).cast("long"))
      .join(broadcast(groupedOffsets(s, groupCols, count(lit(1)))),
        PID +: groupCols)
      .withColumn(out, col("__go_off") + col("__go_rn"))
      .drop(PID, "__go_rn", "__go_off")
  }

  // ------------------------------------------------------------------
  // Cardinality-gated `*Auto` variants.
  //
  // The distributed numbering is the correct DEFAULT — an
  // unpartitioned window is the first thing that stops finishing at
  // 100 TB — but it carries a fixed stage tax (~1-1.5 s at local[32])
  // that is pure loss when the numbered relation is PROVABLY small
  // (post-aggregation by a dimension key, distinct-value histograms).
  // These pick per input: at or below [[smallThreshold]] rows the
  // plain window runs (tiny relation, one task is fine — the exact
  // situation the P-row offset table itself relies on); above it the
  // distributed form engages unchanged. Both branches produce
  // bit-identical values and the same column types (LongType).
  //
  // `bound`: caller-supplied row-count bound when one is provable
  // (skips the gate entirely); `None` pins the input once and counts
  // the materialized blocks — both branches then consume the pinned
  // frame, so the gate costs one count over cached data, never a
  // recompute.
  // ------------------------------------------------------------------

  /** [[withRowNumber]] with the small-relation fast path. */
  def withRowNumberAuto(df: DataFrame, sortCols: Seq[Column], out: String,
                        bound: Option[Long] = None,
                        parts: Int = 0): DataFrame = {
    val (src, n) = gated(df, bound)
    if (n <= smallThreshold(df.sparkSession))
      src.withColumn(out,
        row_number().over(Window.orderBy(sortCols: _*)).cast("long"))
    else withRowNumber(src, sortCols, out, parts)
  }

  /** [[withRank]] with the small-relation fast path. */
  def withRankAuto(df: DataFrame, sortCols: Seq[Column], out: String,
                   bound: Option[Long] = None, parts: Int = 0): DataFrame = {
    val (src, n) = gated(df, bound)
    if (n <= smallThreshold(df.sparkSession))
      src.withColumn(out,
        rank().over(Window.orderBy(sortCols: _*)).cast("long"))
    else withRank(src, sortCols, out, parts)
  }

  /** [[withNtile]] with the small-relation fast path (built-in NTILE —
    * [[withNtile]] reproduces its exact uneven-bucket rule, so the two
    * branches agree bit-for-bit at every remainder class). */
  def withNtileAuto(df: DataFrame, n: Int, sortCols: Seq[Column],
                    out: String, bound: Option[Long] = None,
                    parts: Int = 0): DataFrame = {
    require(n > 0, s"ntile bucket count must be positive, got $n")
    val (src, total) = gated(df, bound)
    if (total <= smallThreshold(df.sparkSession))
      src.withColumn(out,
        ntile(n).over(Window.orderBy(sortCols: _*)).cast("long"))
    else withNtile(src, n, sortCols, out, parts)
  }

  /** [[withRunningSum]] with the small-relation fast path. */
  def withRunningSumAuto(df: DataFrame, sortCols: Seq[Column],
                         valueCol: Column, out: String,
                         bound: Option[Long] = None,
                         parts: Int = 0): DataFrame = {
    val (src, n) = gated(df, bound)
    if (n <= smallThreshold(df.sparkSession))
      src.withColumn(out, sum(valueCol).over(Window.orderBy(sortCols: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    else withRunningSum(src, sortCols, valueCol, out, parts)
  }

  /** [[withGroupedRowNumber]] with the small-relation fast path (the
    * plain grouped window — fine when the WHOLE relation is small,
    * regardless of group count). */
  def withGroupedRowNumberAuto(df: DataFrame, groupCols: Seq[String],
                               sortCols: Seq[Column], out: String,
                               bound: Option[Long] = None,
                               parts: Int = 0): DataFrame = {
    val (src, n) = gated(df, bound)
    if (n <= smallThreshold(df.sparkSession))
      src.withColumn(out, row_number().over(
        Window.partitionBy(groupCols.map(col): _*).orderBy(sortCols: _*))
        .cast("long"))
    else withGroupedRowNumber(src, groupCols, sortCols, out, parts)
  }

  /** Per-group running sum of `valueCol` over `sortCols`
    * (`rowsBetween(unboundedPreceding, currentRow)` within the
    * group), distributed as [[withGroupedRank]]. */
  def withGroupedRunningSum(df: DataFrame, groupCols: Seq[String],
                            sortCols: Seq[Column], valueCol: Column,
                            out: String, parts: Int = 0): DataFrame = {
    val s = ranged(df.withColumn("__go_v", valueCol),
      groupCols.map(col) ++ sortCols, parts)
    val w = Window.partitionBy(col(PID) +: groupCols.map(col): _*)
      .orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s.withColumn("__go_ps", sum("__go_v").over(w))
      .join(broadcast(groupedOffsets(s, groupCols, sum(col("__go_v")))),
        PID +: groupCols)
      .withColumn(out, col("__go_off") + col("__go_ps"))
      .drop(PID, "__go_v", "__go_ps", "__go_off")
  }
}
