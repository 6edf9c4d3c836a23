package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
  *   1. split points over the sort key are sampled ONCE (driver-side
  *      weighted reservoir — the same sketch Spark's own
  *      `RangePartitioner` runs eagerly when an RDD sort constructs
  *      its partitioner) and captured as LITERALS in the plan;
  *   2. every row's range id is a DETERMINISTIC O(log P) bisect
  *      expression over those literal bounds — re-evaluating the plan
  *      can never re-assign a row to a different range, which is what
  *      lets the two consumers below share nothing but the expression;
  *   3. the window runs per range (P-way parallel) over ONE hash
  *      shuffle, while the P-row offset table (rows/rank-base/value-sum
  *      per range, prefix-summed — P rows, the one place a tiny
  *      unpartitioned window is the RIGHT tool) aggregates map-side
  *      from the PRE-shuffle frame and is broadcast back.
  *
  * The earlier design materialized `repartitionByRange` +
  * `spark_partition_id()` behind an eager `localCheckpoint`, because
  * the SQL range exchange re-samples split points per execution and
  * the two consumers would otherwise disagree on pids. That pin was
  * the measured sf100 scale-killer (BASELINE round 13: two 150M-row
  * layouts' pins ≈ 45 GB of block churn, task OOM at the standard
  * heap). Literal bounds make the pid a pure function of the row, so
  * NOTHING needs pinning: the only full-width pass over the input is
  * the window's own shuffle write; the bounds sample and the offset
  * aggregate are key-column-pruned scans.
  *
  * Physical placement: ranges are mapped to shuffle partitions through
  * a driver-computed slot table — for range j a small int v_j with
  * `pmod(murmur3(v_j), P) = j` — so `repartition(P, place)` puts each
  * range in its OWN task (hash placement of P arbitrary ids into P
  * buckets would stack ~3 ranges on an unlucky task; the slot table
  * restores the range partitioner's balance without its sampling
  * re-execution). A spec pins the bijection against hash-function
  * drift.
  *
  * Strategy knob `spark.graft.globalorder.strategy`:
  *   - `bounds` (default) — the literal-bounds plan above. Requires a
  *     DETERMINISTIC input (every graft call site is): the input is
  *     evaluated once full-width (the shuffle) plus twice key-pruned
  *     (sample, offsets). Scan-rooted, cached, and checkpointed inputs
  *     re-evaluate for free; anything with a join/aggregate/window in
  *     its (cache-substituted) plan is pinned ONCE automatically —
  *     one-shot, released with the owning query — so nested
  *     numberings and aggregate inputs never re-run per consumer.
  *   - `checkpoint` — the legacy pinned range-exchange plan, kept for
  *     A/B measurement and for non-deterministic inputs.
  *
  * Semantics notes:
  *   - ties: equal sort keys get equal bisect pids (the comparison is
  *     null-safe equality on every column), so `rank` (and
  *     `row_number` under a total tiebreak — what every call site
  *     uses) matches the global-window value exactly;
  *   - sort direction / null ordering ride on the `Column`s
  *     themselves (`col.desc` etc.) and are honored by both the
  *     driver-side sample ordering and the bisect expression;
  *   - `ntile(n)` is derived from the global row number with SQL
  *     NTILE's exact uneven-bucket rule (first `total mod n` buckets
  *     one row larger), so it is bit-compatible with both engines'
  *     NTILE at any total. */
object GlobalOrder {

  private val PID = "__go_pid"
  private val PLACE = "__go_place"

  /** Row-count threshold below which the plain single-partition window
    * beats the distributed numbering: the distributed form pays a fixed
    * stage tax (bounds sample job + hash shuffle + offset join,
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
      // scan-rooted (or already cached/checkpointed) input: re-evaluation
      // is a column-pruned scan, so the gate needs NO pin — one count
      // job over the pruned scan (parquet row-group counts) decides the
      // branch, and whichever branch runs re-reads the scan for free.
      // Persisting here would be a REGRESSION at scale: MEMORY_AND_DISK
      // of a 150M-row fact projection is exactly the block churn the
      // round-14 literal-bounds rewrite deleted from the bounds path.
      // (Derived inputs keep the persist below — for them the pin IS
      // the cache the query's sibling aggregates hit, the round-11
      // measurement the q_abc_class call site records.)
      case None if reEvalCheap(df) => (df, df.count())
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

  // ------------------------------------------------------------------
  // Deterministic range assignment (the `bounds` strategy).
  // ------------------------------------------------------------------

  /** One sort key: the bare key column (direction stripped), its
    * requested output order, and its resolved type. */
  private case class SortSpec(key: Column, asc: Boolean, nullsFirst: Boolean,
                              dt: DataType)

  /** Strip `SortOrder` wrappers off the caller's sort columns and
    * resolve each key's type against `df` (one analysis pass, no job).
    * Bare columns default to asc-nulls-first — `orderBy`'s own rule. */
  private def sortSpecs(df: DataFrame, sortCols: Seq[Column]): Seq[SortSpec] = {
    val parts = sortCols.map { c =>
      GraftSqlBridge.sortOrderOf(c).getOrElse((c, true, true))
    }
    val dts = df.select(parts.map(_._1): _*).schema.map(_.dataType)
    parts.zip(dts).map { case ((k, asc, nf), dt) => SortSpec(k, asc, nf, dt) }
  }

  /** Key types the driver-side sample can order (external row values
    * implement Comparable). Anything else falls back to the
    * checkpoint strategy rather than guessing an ordering. */
  private def comparable(dt: DataType): Boolean = dt match {
    case _: NumericType | StringType | BooleanType | DateType |
         TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Driver-side output-order comparison of two sampled key rows. */
  private def keyOrdering(specs: Seq[SortSpec]): Ordering[Row] =
    new Ordering[Row] {
      def compare(a: Row, b: Row): Int = {
        var i = 0
        while (i < specs.length) {
          val sp = specs(i)
          val (x, y) = (a.get(i), b.get(i))
          val c =
            if (x == null && y == null) 0
            else if (x == null) { if (sp.nullsFirst) -1 else 1 }
            else if (y == null) { if (sp.nullsFirst) 1 else -1 }
            else {
              val n = x.asInstanceOf[Comparable[Any]].compareTo(y)
              if (sp.asc) n else -n
            }
          if (c != 0) return c
          i += 1
        }
        0
      }
    }

  /** Sample ≤ P−1 strictly increasing (in output order) split-point
    * key tuples: a per-partition reservoir over the key projection
    * (ONE key-pruned job — the same sketch an RDD `RangePartitioner`
    * collects when it is constructed), then weighted selection so
    * unevenly-sized input partitions don't bias the bounds. */
  private def sampleBounds(df: DataFrame, specs: Seq[SortSpec],
                           p: Int): Array[Row] = {
    val keys = df.select(specs.zipWithIndex.map {
      case (sp, i) => sp.key.as(s"__go_k$i") }: _*)
    val rdd = keys.rdd
    val nPart = math.max(1, rdd.getNumPartitions)
    val sampleSize = math.min(20.0 * p, 1e6)
    val perPart = math.max(1, math.ceil(3 * sampleSize / nPart).toInt)
    val sketch: Array[(Long, Array[Row])] =
      rdd.mapPartitionsWithIndex { (idx, it) =>
        // seeded per partition: the sample is collected once and its
        // values become plan literals, so determinism here is about
        // reproducible plans, not correctness
        val rng = new java.util.Random(0x9E3779B97F4A7C15L ^ idx.toLong)
        val res = new Array[Row](perPart)
        var n = 0L
        while (it.hasNext) {
          val r = it.next()
          if (n < perPart) res(n.toInt) = r
          else {
            val j = (rng.nextDouble() * (n + 1)).toLong
            if (j < perPart) res(j.toInt) = r
          }
          n += 1
        }
        Iterator.single((n, res.take(math.min(n, perPart.toLong).toInt)))
      }.collect()
    val ord = keyOrdering(specs)
    val totalRows = sketch.map(_._1).sum
    if (totalRows == 0) return Array.empty
    // weight each sampled row by the rows it represents, walk the
    // sorted sample emitting a bound every totalWeight/p
    val weighted = sketch.flatMap { case (cnt, rows) =>
      if (rows.isEmpty) Array.empty[(Row, Double)]
      else { val w = cnt.toDouble / rows.length; rows.map(r => (r, w)) }
    }.sortBy(_._1)(ord)
    val step = totalRows.toDouble / p
    val bounds = scala.collection.mutable.ArrayBuffer.empty[Row]
    var cum = 0.0
    var target = step
    var i = 0
    while (i < weighted.length && bounds.length < p - 1) {
      cum += weighted(i)._2
      if (cum >= target) {
        val cand = weighted(i)._1
        // equal keys must share a range: skip a candidate equal to the
        // previous bound instead of emitting an empty range
        if (bounds.isEmpty || ord.compare(cand, bounds.last) > 0) {
          bounds += cand
          target += step
        }
      }
      i += 1
    }
    bounds.toArray
  }

  private def litOf(v: Any, dt: DataType): Column =
    GraftSqlBridge.column(
      org.apache.spark.sql.catalyst.expressions.Literal.create(v, dt))

  /** `true` iff the row's key tuple sorts STRICTLY AFTER the literal
    * bound in output order — lexicographic over the sort columns,
    * null-safe per each column's null ordering. */
  private def afterBound(specs: Seq[SortSpec], bound: Row): Column =
    specs.zipWithIndex.foldRight(lit(false)) { case ((sp, i), rest) =>
      val v = bound.get(i)
      val eqC = if (v == null) sp.key.isNull else sp.key <=> litOf(v, sp.dt)
      val afterC =
        if (v == null) { if (sp.nullsFirst) sp.key.isNotNull else lit(false) }
        else {
          val cmp = if (sp.asc) sp.key > litOf(v, sp.dt)
                    else sp.key < litOf(v, sp.dt)
          // a null key compares null — resolve it to its sort position
          coalesce(cmp, lit(!sp.nullsFirst))
        }
      afterC || (eqC && rest)
    }

  /** Bisect the literal bounds: pid = number of bounds the key sorts
    * strictly after, as an O(log P)-deep nested-CASE tree (a flat
    * when-chain would pay P lexicographic comparisons per row). */
  private def bisectPid(specs: Seq[SortSpec], bounds: Array[Row]): Column = {
    def tree(lo: Int, hi: Int): Column =
      if (lo >= hi) lit(lo)
      else {
        val mid = (lo + hi) / 2
        when(afterBound(specs, bounds(mid)), tree(mid + 1, hi))
          .otherwise(tree(lo, mid))
      }
    tree(0, bounds.length).cast("int")
  }

  /** For each range j a small nonneg int v with
    * `pmod(murmur3(v, 42), p) = j` — the seed/mod pair
    * `repartition(p, intCol)`'s HashPartitioning applies — so placing
    * by v_j lands range j in physical partition j: one range per task,
    * no hash stacking. Driver cost: ~p tries per slot. */
  private[graft] def placeSlots(ranges: Int, p: Int): Array[Int] =
    Array.tabulate(ranges) { j =>
      var v = 0
      while ({
        val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashInt(v, 42)
        val m = h % p
        (if (m < 0) m + p else m) != j
      }) v += 1
      v
    }

  /** The range-assigned frames one numbering consumes.
    *
    * `win`: the shuffled frame the per-range window runs over —
    * partition the window by [[partCol]] (+ group columns), which the
    * physical partitioning provably clusters. `agg`: the frame the
    * P-row offset table aggregates from — PRE-shuffle in bounds mode
    * (map-side partial aggregation; the full input never moves for the
    * offsets), the pinned frame itself in checkpoint mode. Both carry
    * [[PID]], the monotone range id the offsets order and join by. */
  private case class Ranged(win: DataFrame, agg: DataFrame, partCol: String)

  private def strategy(spark: org.apache.spark.sql.SparkSession): String =
    spark.conf.get("spark.graft.globalorder.strategy", "bounds")

  /** Whether re-evaluating `df` is no worse than a (column-pruned)
    * scan: its CACHE-SUBSTITUTED plan holds only leaves (parquet
    * relations, checkpointed LogicalRDDs, InMemoryRelations) under
    * per-row operators. The bounds strategy evaluates its input three
    * times (key-pruned sample, the window's shuffle feed, the
    * key-pruned offset aggregate) — free over a scan or a cached
    * frame, but a join/aggregate/window input would re-run per
    * consumer, so [[ranged]] pins those once (one-shot, released with
    * the owning query by [[CheckpointScope]]).
    *
    * Also requires every node's expressions DETERMINISTIC: a
    * re-evaluable plan here is consumed by several jobs (sample,
    * shuffle feed, offsets — and in the *Auto gate, the count and
    * then whichever branch runs), and a nondeterministic
    * Project/Filter (rand(), sample-style predicates) would hand each
    * consumer a different row set. Those fall back to the persist/pin
    * path, which snapshots one row set for everyone (round-15 ADVICE;
    * every current call site is deterministic — this is a guard for
    * future callers). */
  private def reEvalCheap(df: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    df.queryExecution.withCachedData.collectFirst {
      case p if !p.isInstanceOf[LeafNode] && !p.isInstanceOf[Project] &&
                !p.isInstanceOf[Filter] && !p.isInstanceOf[SubqueryAlias] => p
      case p if !p.expressions.forall(_.deterministic) => p
    }.isEmpty
  }

  /** Assign deterministic range ids over the sort order. */
  private def ranged(df: DataFrame, sortCols: Seq[Column], parts: Int): Ranged = {
    val spark = df.sparkSession
    val p =
      if (parts > 0) parts
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val specs = sortSpecs(df, sortCols)
    if (strategy(spark) == "checkpoint" || !specs.forall(s => comparable(s.dt))) {
      // legacy pinned plan: the SQL range exchange re-samples split
      // points per execution, so the frame must be materialized for
      // its two consumers to agree on pids
      val s = LoopCheckpoint(
        df.repartitionByRange(p, sortCols: _*)
          .withColumn(PID, spark_partition_id()))
      Ranged(s, s, PID)
    } else {
      val src = if (reEvalCheap(df)) df else LoopCheckpoint.once(df)
      val bounds = sampleBounds(src, specs, p)
      val slots = placeSlots(bounds.length + 1, p)
      val tagged = src
        .withColumn(PID, bisectPid(specs, bounds))
        .withColumn(PLACE,
          element_at(typedLit(slots.toSeq), col(PID) + lit(1)))
      Ranged(tagged.repartition(p, col(PLACE)), tagged, PLACE)
    }
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
    val r = ranged(df, sortCols, parts)
    val w = Window.partitionBy(r.partCol).orderBy(sortCols: _*)
    r.win.withColumn("__go_rn", row_number().over(w).cast("long"))
      .join(broadcast(offsets(r.agg, Seq(count(lit(1))))), PID)
      .withColumn(out, col("__go_off0") + col("__go_rn"))
      .drop(PID, PLACE, "__go_rn", "__go_off0")
  }

  /** Global `rank()` (gap semantics) over `sortCols`. Equal keys share
    * a range (null-safe-equal bisect), so per-range rank plus the
    * prior ranges' row count is the global rank. */
  def withRank(df: DataFrame, sortCols: Seq[Column], out: String,
               parts: Int = 0): DataFrame = {
    val r = ranged(df, sortCols, parts)
    val w = Window.partitionBy(r.partCol).orderBy(sortCols: _*)
    r.win.withColumn("__go_rk", rank().over(w).cast("long"))
      .join(broadcast(offsets(r.agg, Seq(count(lit(1))))), PID)
      .withColumn(out, col("__go_off0") + col("__go_rk"))
      .drop(PID, PLACE, "__go_rk", "__go_off0")
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
    * shuffle once PER SUM over the identical key (the q_ks_test
    * shape: cumulative F and O counts over the same pooled support).
    * One per-partition window computes every prefix; one P-row offset
    * table carries every column's exclusive total. */
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
    val r = ranged(df.select(col("*") +: vcols: _*), sortCols, parts)
    val w = Window.partitionBy(r.partCol).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = offsets(r.agg, sums.indices.map(i => sum(col(s"__go_v$i"))))
    val prefixed = sums.indices.foldLeft(r.win) { (d, i) =>
      d.withColumn(s"__go_ps$i", sum(col(s"__go_v$i")).over(w))
    }
    val out = sums.zipWithIndex.foldLeft(
        prefixed.join(broadcast(offs), PID)) { case (d, ((_, o), i)) =>
      d.withColumn(o, col(s"__go_off$i") + col(s"__go_ps$i"))
    }
    out.drop(Seq(PID, PLACE) ++ sums.indices.flatMap(i =>
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
  // identical grouped numbering by range-assigning on
  // (group ++ sort) — P-way parallel regardless of group count —
  // with per-(group, range) prefix offsets broadcast back. The
  // offset table is ≤ G·P rows: intended for low-cardinality groups
  // (at high G the plain grouped window is already parallel and is
  // the right tool).
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
    * without the per-group task collapse. Equal (group, key) rows
    * share a range, so per-range rank plus the group's prior-range
    * row count is the global grouped rank (gap semantics preserved). */
  def withGroupedRank(df: DataFrame, groupCols: Seq[String],
                      sortCols: Seq[Column], out: String,
                      parts: Int = 0): DataFrame = {
    val r = ranged(df, groupCols.map(col) ++ sortCols, parts)
    val w = Window.partitionBy(col(r.partCol) +: groupCols.map(col): _*)
      .orderBy(sortCols: _*)
    r.win.withColumn("__go_rk", rank().over(w).cast("long"))
      .join(broadcast(groupedOffsets(r.agg, groupCols, count(lit(1)))),
        PID +: groupCols)
      .withColumn(out, col("__go_off") + col("__go_rk"))
      .drop(PID, PLACE, "__go_rk", "__go_off")
  }

  /** `row_number()` per group over `sortCols`, distributed as
    * [[withGroupedRank]] (deterministic iff the sort totally orders
    * each group — the grouped window's own contract). */
  def withGroupedRowNumber(df: DataFrame, groupCols: Seq[String],
                           sortCols: Seq[Column], out: String,
                           parts: Int = 0): DataFrame = {
    val r = ranged(df, groupCols.map(col) ++ sortCols, parts)
    val w = Window.partitionBy(col(r.partCol) +: groupCols.map(col): _*)
      .orderBy(sortCols: _*)
    r.win.withColumn("__go_rn", row_number().over(w).cast("long"))
      .join(broadcast(groupedOffsets(r.agg, groupCols, count(lit(1)))),
        PID +: groupCols)
      .withColumn(out, col("__go_off") + col("__go_rn"))
      .drop(PID, PLACE, "__go_rn", "__go_off")
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
  // (skips the gate entirely). `None` splits on the input's shape
  // (see gated()): a re-evaluable input — deterministic per-row
  // operators over leaves — takes the NO-PIN path (one bare count
  // over the pruned scan decides; whichever branch runs re-reads the
  // scan for free), while a derived input is pinned once and counted
  // (the pin doubles as the cache the query's sibling aggregates hit,
  // and both branches consume the pinned frame).
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

  /** [[withGroupedRank]] with the small-relation fast path. */
  def withGroupedRankAuto(df: DataFrame, groupCols: Seq[String],
                          sortCols: Seq[Column], out: String,
                          bound: Option[Long] = None,
                          parts: Int = 0): DataFrame = {
    val (src, n) = gated(df, bound)
    if (n <= smallThreshold(df.sparkSession))
      src.withColumn(out, rank().over(
        Window.partitionBy(groupCols.map(col): _*).orderBy(sortCols: _*))
        .cast("long"))
    else withGroupedRank(src, groupCols, sortCols, out, parts)
  }

  /** [[withRunningSums]] with the small-relation fast path (same
    * duplicate/collision validation on both branches; the plain window
    * computes every prefix in the one sort the distributed form pays a
    * range shuffle for). */
  def withRunningSumsAuto(df: DataFrame, sortCols: Seq[Column],
                          sums: Seq[(Column, String)],
                          bound: Option[Long] = None,
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
    val (src, n) = gated(df, bound)
    if (n <= smallThreshold(df.sparkSession)) {
      val w = Window.orderBy(sortCols: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      sums.foldLeft(src) { case (d, (v, o)) =>
        d.withColumn(o, sum(v).over(w)) }
    } else withRunningSums(src, sortCols, sums, parts)
  }

  /** [[withGroupedRunningSum]] with the small-relation fast path. */
  def withGroupedRunningSumAuto(df: DataFrame, groupCols: Seq[String],
                                sortCols: Seq[Column], valueCol: Column,
                                out: String, bound: Option[Long] = None,
                                parts: Int = 0): DataFrame = {
    val (src, n) = gated(df, bound)
    if (n <= smallThreshold(df.sparkSession))
      src.withColumn(out, sum(valueCol).over(
        Window.partitionBy(groupCols.map(col): _*).orderBy(sortCols: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    else withGroupedRunningSum(src, groupCols, sortCols, valueCol, out, parts)
  }

  /** Per-group running sum of `valueCol` over `sortCols`
    * (`rowsBetween(unboundedPreceding, currentRow)` within the
    * group), distributed as [[withGroupedRank]]. */
  def withGroupedRunningSum(df: DataFrame, groupCols: Seq[String],
                            sortCols: Seq[Column], valueCol: Column,
                            out: String, parts: Int = 0): DataFrame = {
    val r = ranged(df.withColumn("__go_v", valueCol),
      groupCols.map(col) ++ sortCols, parts)
    val w = Window.partitionBy(col(r.partCol) +: groupCols.map(col): _*)
      .orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    r.win.withColumn("__go_ps", sum("__go_v").over(w))
      .join(broadcast(groupedOffsets(r.agg, groupCols, sum(col("__go_v")))),
        PID +: groupCols)
      .withColumn(out, col("__go_off") + col("__go_ps"))
      .drop(PID, PLACE, "__go_v", "__go_ps", "__go_off")
  }
}
