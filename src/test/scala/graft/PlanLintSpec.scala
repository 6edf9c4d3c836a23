package graft

/** Suite-wide physical-plan lint: every SparkEntry query is PLANNED
  * (never executed) and screened for the operators that do not survive
  * a 100 TB deployment. This is the regression guard behind the
  * repo-wide claims "no cartesian products except broadcast-bounded
  * ones" and "no driver-side collect in any pipeline" — a new query
  * that sneaks in an unbounded product fails here, not in production.
  */
class PlanLintSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  /** The lint judges query STRUCTURE under default planning, so the
    * join-strategy confs it depends on are pinned for the duration —
    * other suites legitimately flip autoBroadcastJoinThreshold for
    * their own shuffle-join tests, and suite order must not change
    * what this lint sees. */
  private def withDefaultPlanner[A](body: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "10MB")
    try body finally spark.conf.set(key, prev)
  }

  test("no query plans an unbounded cartesian product") {
    withDefaultPlanner {
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      // CartesianProductExec = both sides non-broadcast: O(|A|·|B|)
      // shuffle-and-pair, the one join shape with no scale story.
      // BroadcastNestedLoopJoin is NOT flagged: every crossJoin in the
      // suite carries a broadcast()-bounded side (1-row aggregates,
      // bounded query sets, the 49-row month spine).
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unbounded cartesian product in: ${offenders.mkString(", ")}")
    }
  }

  // Cross joins whose bounded side the structural check below cannot
  // prove small, each verified by inspection (the bound is data-model
  // or construction knowledge, not plan shape):
  //   q_retention_tenant / q_retention_events — the 49-row (resp.
  //     3-month) month spine, built from a sequence (LocalRelation) but
  //     sometimes planned behind a project the collector misses;
  //   q_kmeans / q_sim_ann_kmeans — centroid frames: groupBy over k=8
  //     cluster labels, ≤ k rows by construction;
  //   q_sim_cosine_topk / q_sim_quant_topk / q_sim_ann_ivf — the
  //     bounded query set (a filtered id list ≤ 50 rows) broadcast
  //     against the corpus — the documented exact-scoring shape;
  //   q_runs_test — the 1-row median frame (window + rk = (n+1)/2
  //     filter yields exactly one row, but the plan can't know);
  //   q_retention_flagship / _nested / _collapsed — the 49-row month
  //     spine again, but when another suite has already materialized
  //     RetentionCore's shared cache the spine sits behind an
  //     InMemoryRelation and the structural markers are hidden.
  private val inspectedBounded = Set(
    "q_retention_tenant", "q_retention_events", "q_kmeans",
    "q_sim_ann_kmeans", "q_sim_cosine_topk", "q_sim_quant_topk",
    "q_sim_ann_ivf", "q_runs_test",
    "q_retention_flagship", "q_retention_nested", "q_retention_collapsed")

  test("every cross join carries a provably- or inspected-bounded side") {
    withDefaultPlanner {
    val suspicious = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val df = fn(spark, dir)
      val plan = df.queryExecution.optimizedPlan
      import org.apache.spark.sql.catalyst.plans.logical._
      val bad = plan.collect {
        case j: Join if j.joinType.sql == "CROSS" ||
            j.condition.isEmpty =>
          // In optimizedPlan EliminateResolvedHint has already folded
          // ResolvedHint nodes into Join.hint, so a broadcast() bound
          // must be read off the join itself, not a child hint node.
          val hinted = Seq(j.hint.leftHint, j.hint.rightHint)
            .flatten.exists(_.strategy.isDefined)
          val sides = Seq(j.left, j.right)
          // provably small: a no-grouping-key aggregate (1 row), a
          // literal relation, or a LIMIT
          val bounded = hinted || sides.exists { s =>
            s.collectFirst {
              case a: Aggregate if a.groupingExpressions.isEmpty => ()
              case _: LocalRelation => ()
              case _: GlobalLimit => ()
            }.isDefined
          }
          if (bounded || inspectedBounded(name)) None else Some(name)
      }.flatten
      bad
    }.distinct
    assert(suspicious.isEmpty,
      s"cross join without a bounded side in: ${suspicious.mkString(", ")}" +
        " — broadcast a provably-small frame or add an inspected entry" +
        " with its bound")
    }
  }

  // Global-sort windows (empty partitionBy) whose input the structural
  // check cannot prove small, each verified by inspection:
  //   q_spearman — exact Spearman needs a unique global rank per ROW
  //     (value, key tiebreak); ties don't collapse to distinct values.
  //     The documented 100-TB path is a range-partitioned sort + per-
  //     partition offset rank; the one-task window is the honest exact
  //     form for the cross-engine oracle.
  //   q_range_boundaries — the window ranks a 1/97 systematic SAMPLE
  //     (o_orderkey % 97 filter); input is bounded by the sampling
  //     rate, which a structural check can't see through a Filter.
  //   q_neg_sample — global dense-index assignment over documents so
  //     negative draws can hit a contiguous [0, n) space; scale path
  //     is a precomputed dense id map (or zipWithIndex at build time).
  //   q_scan_pruning — ntile(64) SIMULATES two file layouts to measure
  //     min/max pruning; a layout-audit measurement query, not a
  //     production pipeline stage.
  private val inspectedGlobalWindow: Set[String] = Set(
    "q_spearman", "q_range_boundaries", "q_neg_sample", "q_scan_pruning")

  test("no global window over a raw (un-aggregated, unbounded) relation") {
    withDefaultPlanner {
    import org.apache.spark.sql.catalyst.plans.logical._
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.optimizedPlan
      val bad = plan.collect {
        // A Window with no partition keys serializes the whole input
        // through ONE task — acceptable only when the input is provably
        // collapsed first (an Aggregate: DISTINCT values or grouped
        // rollup), literal, or LIMIT-bounded.
        case w: Window if w.partitionSpec.isEmpty =>
          val bounded = w.child.collectFirst {
            case _: Aggregate => ()
            case _: LocalRelation => ()
            case _: GlobalLimit => ()
            // the GlobalOrder.*Auto gate: the input was persisted,
            // MEASURED (count gate), and only then routed to the
            // single-partition window — the cache's actual size is the
            // proof. At a bigger sf the same query flips to the
            // distributed branch and this window disappears, so the
            // lint stays consistent at any scale.
            case m: org.apache.spark.sql.execution.columnar.InMemoryRelation
                if m.computeStats().sizeInBytes <= (256L << 20) => ()
            // same gate since round 11: the pin is an eager
            // localCheckpoint (CacheManager-leak fix), whose LogicalRDD
            // stats LoopCheckpoint rewrites to the blocks' ACTUAL
            // stored size — the same measured-size proof
            case l: org.apache.spark.sql.execution.LogicalRDD
                if l.computeStats().sizeInBytes <= (256L << 20) => ()
          }.isDefined
          if (bounded || inspectedGlobalWindow(name)) None else Some(name)
      }.flatten
      bad
    }.distinct
    assert(offenders.isEmpty,
      s"global (no-partitionBy) window over raw input in: " +
        s"${offenders.mkString(", ")} — pre-aggregate to DISTINCT" +
        " values first, or add an inspected entry with its bound")
    }
  }

  /** Physical plan with the AQE wrapper peeled off: under adaptive
    * execution `executedPlan` is a single AdaptiveSparkPlanExec node
    * and `.collect` never descends into it — a traversal over the
    * wrapper silently inspects NOTHING (which made the double-exchange
    * check below vacuous until this helper). `inputPlan` is the full
    * pre-adaptive physical plan, the one default planning produced. */
  private def physicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.execution.SparkPlan =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.inputPlan
      case p => p
    }

  test("no back-to-back shuffle on identical partitioning (double exchange)") {
    withDefaultPlanner {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val plan = physicalPlan(fn(spark, dir))
      val doubled = plan.collect {
        case e: ShuffleExchangeExec =>
          // an Exchange whose subtree re-shuffles the same keys right
          // below it (through at most narrow projections) paid one
          // shuffle for nothing
          val childEx = e.child.collectFirst {
            case c: ShuffleExchangeExec => c }
          childEx.exists { c =>
            e.outputPartitioning.toString == c.outputPartitioning.toString }
      }
      if (doubled.contains(true)) Some(name) else None
    }.distinct
    assert(offenders.isEmpty,
      s"double shuffle on the same partitioning in: " +
        s"${offenders.mkString(", ")}")
    }
  }

  // Shuffled joins with a bounded-looking side, each verified by
  // inspection (bounded marker present but broadcasting would be wrong
  // or the planner's call is already right):
  private val inspectedShuffledBounded: Set[String] = Set()

  /** "This side's OUTPUT is provably bounded": the bound must hold at
    * the join input, so only walk through cardinality-non-increasing
    * unary nodes (project/filter/sort/exchange/window); Generate and
    * Expand multiply rows, joins can too — a bounded relation buried
    * below either proves nothing about the side. */
  private def boundedSide(
      p: org.apache.spark.sql.execution.SparkPlan): Boolean = p match {
    case _: org.apache.spark.sql.execution.GlobalLimitExec => true
    case _: org.apache.spark.sql.execution.LocalTableScanExec => true
    case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec =>
      a.groupingExpressions.isEmpty || boundedSide(a.child)
    case _: org.apache.spark.sql.execution.GenerateExec => false
    case _: org.apache.spark.sql.execution.ExpandExec => false
    // object nodes can emit ANY number of rows per input (flatMap /
    // mapPartitions / flatMapGroups) — a bound below them proves
    // nothing; match by name so the list survives node renames
    case u if u.nodeName.contains("MapPartitions") ||
              u.nodeName.contains("FlatMap") => false
    case u if u.children.size == 1 => boundedSide(u.children.head)
    case _ => false
  }

  private def shuffledBoundedJoins(
      plan: org.apache.spark.sql.execution.SparkPlan): Boolean = {
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    plan.collect {
      case j: SortMergeJoinExec
        if boundedSide(j.left) || boundedSide(j.right) => ()
      case j: ShuffledHashJoinExec
        if boundedSide(j.left) || boundedSide(j.right) => ()
    }.nonEmpty
  }

  test("broadcast lint positive control: a LIMIT-side shuffled join IS caught") {
    // guards against the vacuous-traversal failure mode the AQE wrapper
    // caused for the double-exchange check: force a shuffled join with
    // a provably bounded side and assert the detector fires on it
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      import org.apache.spark.sql.functions.col
      val big = spark.range(10000).toDF("k")
      val small = spark.range(10000).toDF("k").limit(5)
      assert(shuffledBoundedJoins(physicalPlan(big.join(small, "k"))),
        "detector missed a shuffled join with a LIMIT side")
      assert(!shuffledBoundedJoins(physicalPlan(
        big.join(big.filter(col("k") > 5000).toDF("k2"),
          col("k") === col("k2")))),
        "detector false-positived on two unbounded sides")
    } finally spark.conf.set(key, prev)
  }

  test("no shuffled join whose one side is provably bounded (broadcast it)") {
    withDefaultPlanner {
    // The third scale-killer class: a SortMergeJoin/ShuffledHashJoin
    // shuffles BOTH sides — paying a full shuffle of the big side to
    // join against a relation the plan itself proves tiny (a LIMIT, a
    // literal relation, a no-grouping-key aggregate). That side should
    // ride a broadcast instead. The planner usually gets this right
    // from stats; this lint catches the cases where lineage (e.g. a
    // checkpoint barrier) or a stray shuffle hint hides the bound.
    val offenders = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      if (shuffledBoundedJoins(physicalPlan(fn(spark, dir))) &&
          !inspectedShuffledBounded(name)) Some(name) else None
    }.distinct
    assert(offenders.isEmpty,
      s"shuffled join with a provably-bounded side in: " +
        s"${offenders.mkString(", ")} — broadcast() the bounded side" +
        " or add an inspected entry with its justification")
    }
  }
}
