package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.plans.{AsOfJoinExec, AsOfJoinNative}

/** The custom physical as-of join vs the union-and-carry rewrite — two
  * independent formulations of the same contract, compared on random
  * data (plus plan-shape and null-semantics pins). */
class AsOfJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  test("native operator matches the union-and-carry rewrite on random data") {
    val rnd = new Random(42)
    val probes = (1 to 400).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, rnd.nextInt()))
      .toDF("k", "t", "payload")
    val states = (1 to 150).map(_ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(1000).toLong,
       rnd.nextInt(100).toLong)).toDF("k", "st", "sv")
      .dropDuplicates("k", "st") // unique (key, time) ⇒ deterministic ties
    val native = AsOfJoinNative.joinAsOf(
        probes, states, Seq("k"), "t", "st", Seq("st", "sv"))
      .collect().map(_.toSeq).toSeq
    val rewrite = AsOfJoin.joinAsOf(
        probes, states, Seq("k"), "t", "st", Seq("st", "sv"))
      .select("k", "t", "payload", "st", "sv")
      .collect().map(_.toSeq).toSeq
    assert(native.sortBy(_.toString) == rewrite.sortBy(_.toString))
    assert(native.size == 400) // one output row per probe row
  }

  test("null keys and null times never match; missing state gives nulls") {
    val probes = Seq((Some(1L), Some(10L)), (None, Some(10L)),
                     (Some(1L), None), (Some(9L), Some(10L)))
      .toDF("k", "t")
    val states = Seq((Some(1L), Some(5L), "a"), (Some(1L), None, "bad"),
                     (None, Some(1L), "bad2"))
      .toDF("k", "st", "sv")
    val got = AsOfJoinNative.joinAsOf(
        probes, states, Seq("k"), "t", "st", Seq("sv"))
      .as[(Option[Long], Option[Long], Option[String])].collect().toSet
    assert(got == Set(
      (Some(1L), Some(10L), Some("a")), // real match
      (None, Some(10L), None),          // null probe key
      (Some(1L), None, None),           // null probe time
      (Some(9L), Some(10L), None)))     // no state for key
  }

  test("tolerance bounds staleness (merge_asof semantics)") {
    val probes = Seq((1L, 100L), (1L, 150L), (1L, 500L), (2L, 100L))
      .toDF("k", "t")
    val states = Seq((1L, 90L, "fresh"), (2L, 10L, "stale"))
      .toDF("k", "st", "sv")
    val got = AsOfJoinNative.joinAsOf(
        probes, states, Seq("k"), "t", "st", Seq("sv"), tolerance = Some(60L))
      .as[(Long, Long, Option[String])].collect().toSet
    assert(got == Set(
      (1L, 100L, Some("fresh")),  // 10 ticks old, within 60
      (1L, 150L, Some("fresh")),  // 60 ticks old, at the bound (<=)
      (1L, 500L, None),           // 410 ticks old → too stale
      (2L, 100L, None)))          // 90 ticks old → too stale
    // without tolerance all four match their latest state
    val all = AsOfJoinNative.joinAsOf(
        probes, states, Seq("k"), "t", "st", Seq("sv"))
      .as[(Long, Long, Option[String])].collect()
    assert(all.forall(_._3.isDefined))
  }

  test("tolerance differentially matches rewrite + post-filter on random data") {
    val rnd = new Random(99)
    val probes = (1 to 300).map(_ =>
      (rnd.nextInt(15).toLong, rnd.nextInt(1000).toLong)).toDF("k", "t")
    val states = (1 to 120).map(_ =>
      (rnd.nextInt(15).toLong, rnd.nextInt(1000).toLong,
       rnd.nextInt(100).toLong)).toDF("k", "st", "sv")
      .dropDuplicates("k", "st")
    val tol = 75L
    val native = AsOfJoinNative.joinAsOf(
        probes, states, Seq("k"), "t", "st", Seq("st", "sv"), Some(tol))
      .select("k", "t", "st", "sv")
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    // independent formulation: plain as-of, then null out stale matches
    val viaRewrite = AsOfJoin.joinAsOf(
        probes, states, Seq("k"), "t", "st", Seq("st", "sv"))
      .select(col("k"), col("t"),
              when(col("t") - col("st") <= tol, col("st")).as("st"),
              when(col("t") - col("st") <= tol, col("sv")).as("sv"))
      .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(native == viaRewrite)
  }

  test("unused value columns are pruned through the custom node") {
    val probes = (1L to 50L).map(i => (i % 5, i)).toDF("k", "t")
    val states = (1L to 20L).map(i => (i % 5, i * 3, i, s"wide_$i"))
      .toDF("k", "st", "sv", "unused_wide")
    val df = AsOfJoinNative.joinAsOf(
        probes, states, Seq("k"), "t", "st", Seq("sv", "unused_wide"))
      .select("k", "t", "sv") // unused_wide never read
    val optimized = df.queryExecution.optimizedPlan
    val nodes = optimized.collect {
      case aj: graft.plans.AsOfJoinPlan => aj.rightValues.map(_.name) }
    assert(nodes.nonEmpty && nodes.head == Seq("sv"), optimized.toString)
    assert(df.count() == 50)
  }

  test("extreme key skew (60% of both sides on one key) streams with zero spill") {
    // One key holds 60% of BOTH sides — the shape that makes a buffering
    // join (or the union-and-carry rewrite's window sort) hold the whole
    // hot key in memory. The merge exec holds O(1) state per partition
    // (one copied value row), so the hot partition must stream: total
    // spill across the native run is asserted to be exactly zero.
    val sc = spark.sparkContext
    val n = 200000L
    def skewKey = when(col("id") % 5 < 3, lit(0L))
      .otherwise(pmod(col("id"), lit(96)) + 1)
    val probes = spark.range(n).select(skewKey.as("k"),
      ((col("id") * 7919L) % 1000000L).as("t"), col("id").as("payload"))
    val states = spark.range(n).select(skewKey.as("k"),
      ((col("id") * 104729L) % 1000000L).as("st"))
      .dropDuplicates("k", "st") // unique (key, time) ⇒ deterministic ties
      .withColumn("sv", col("k") * 1000000L + col("st"))
    def fingerprint(df: org.apache.spark.sql.DataFrame): Seq[Any] =
      df.agg(count(lit(1)), count(col("sv")), sum(col("sv")), sum(col("st")))
        .collect()(0).toSeq
    // independent formulation first, listener-free
    val viaRewrite = fingerprint(AsOfJoin.joinAsOf(
      probes, states, Seq("k"), "t", "st", Seq("st", "sv")))
    val spilled = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    }
    sc.addSparkListener(listener)
    try {
      val native = fingerprint(AsOfJoinNative.joinAsOf(
        probes, states, Seq("k"), "t", "st", Seq("st", "sv")))
      org.apache.spark.GraftTestBridge.waitUntilListenerBusEmpty(sc)
      assert(native == viaRewrite, s"skewed differential: $native vs $viaRewrite")
      assert(native.head == n) // one output row per probe row
      assert(spilled.get() == 0L,
        s"skewed as-of merge spilled ${spilled.get()} bytes")
    } finally sc.removeSparkListener(listener)
  }

  test("plan shape: merge exec over two exchanges, no union blow-up") {
    val probes = (1L to 50L).map(i => (i % 5, i, i * 2)).toDF("k", "t", "p")
    val states = (1L to 20L).map(i => (i % 5, i * 3, i)).toDF("k", "st", "sv")
    val df = AsOfJoinNative.joinAsOf(
      probes, states, Seq("k"), "t", "st", Seq("sv"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin ["), plan.take(1500)) // exec node prints sans "Exec"
    assert(!plan.contains("Union"), "must not plan via union-and-carry")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2,
           "each side shuffles exactly once:\n" + plan.take(1500))
  }
}
