package graft

import org.apache.spark.sql.functions._

import graft.operators.{BloomJoin, ChangeCapture, Cohort, Funnel}

/** Behavioral analytics + change capture + bloom-join pruning. */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  // (user, type, ts) — u1 completes the funnel in order; u2 clicks
  // BEFORE viewing (click must not count — strict ordering); u3 views
  // only; u4 completes with an earlier decoy purchase before the view.
  private lazy val funnelEvents = Seq(
    (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
    (2L, "click", 100L), (2L, "view", 200L),
    (3L, "view", 100L),
    (4L, "purchase", 50L), (4L, "view", 100L), (4L, "click", 150L),
    (4L, "purchase", 250L)
  ).toDF("user_id", "event_type", "ts")

  test("funnel enforces strict step ordering and earliest-chain times") {
    val out = Funnel.funnel(funnelEvents, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("step_idx")
      .as[(Int, String, Long, Long)].collect().toSeq
    // step 1: u1,u2,u3,u4 all view; step 2: u1,u4 (u2's click precedes
    // its view); step 3: u1 (lag 200), u4 (decoy purchase at 50 is
    // before t2=150, only 250 qualifies ⇒ lag 150)
    assert(out == Seq(
      (1, "view", 4L, 0L),
      (2, "click", 2L, 100L + 50L),
      (3, "purchase", 2L, 200L + 150L)))
  }

  test("funnel of a single step is the per-type first-touch count") {
    val out = Funnel.funnel(funnelEvents, "user_id", "event_type", "ts",
        Seq("purchase")).as[(Int, String, Long, Long)].collect().toSeq
    assert(out == Seq((1, "purchase", 2L, 0L)))
  }

  test("cohort grid buckets by first-seen month with integer offsets") {
    val acts = Seq(
      (1L, "2023-01-15"), (1L, "2023-03-02"),       // cohort 2023-01
      (2L, "2023-01-20"),                           // cohort 2023-01
      (3L, "2023-12-31"), (3L, "2024-01-01")        // year boundary
    ).toDF("k", "d").select($"k", to_date($"d").as("d"))
    val grid = Cohort.retentionGrid(acts, "k", "d")
      .as[(java.sql.Date, Int, Long, Long)].collect()
      .map(t => (t._1.toString, t._2, t._3, t._4)).toSet
    assert(grid == Set(
      ("2023-01-01", 0, 2L, 2L),   // u1+u2 in their cohort month
      ("2023-01-01", 2, 1L, 1L),   // u1 again in March
      ("2023-12-01", 0, 1L, 1L),
      ("2023-12-01", 1, 1L, 1L)))  // Dec→Jan crosses the year
  }

  test("scd2 collapses consecutive duplicate states and flags current") {
    val ev = Seq(
      (1L, "a", 10L, 1L), (1L, "a", 20L, 2L), (1L, "b", 30L, 3L),
      (1L, "a", 40L, 4L),   // back to a ⇒ NEW version, not merged
      (2L, "x", 10L, 5L)
    ).toDF("k", "state", "ts", "id")
    val out = ChangeCapture.scd2(ev, "k", "state", "ts", "id")
      .as[(Long, String, Int, Long, Option[Long], Boolean)]
      .collect().toSet
    assert(out == Set(
      (1L, "a", 1, 10L, Some(30L), false),
      (1L, "b", 2, 30L, Some(40L), false),
      (1L, "a", 3, 40L, None, true),
      (2L, "x", 1, 10L, None, true)))
  }

  test("scd2 plans ONE exchange+sort for both windows") {
    val ev = funnelEvents.withColumn("id", col("ts"))
    val plan = ChangeCapture.scd2(ev, "user_id", "event_type", "ts", "id")
      .queryExecution.executedPlan.toString
    assert("(?i)Exchange".r.findAllIn(plan).size == 1, plan)
    assert("(?i)\\bSort\\b".r.findAllIn(plan).size == 1, plan)
  }

  test("cdcLatest keeps the newest state and drops deleted keys") {
    val ev = Seq(
      (1L, "v1", 10L, 1L), (1L, "v2", 20L, 2L),
      (2L, "v1", 10L, 3L), (2L, "DEL", 20L, 4L),   // latest is delete
      (3L, "DEL", 10L, 5L), (3L, "v9", 20L, 6L),   // resurrected
      (4L, "a", 10L, 7L), (4L, "b", 10L, 8L)       // ts tie → id wins
    ).toDF("k", "state", "ts", "id")
    val out = ChangeCapture.cdcLatest(ev, "k", "state", "ts", "id", "DEL")
      .as[(Long, String, Long)].collect().toSet
    assert(out == Set((1L, "v2", 20L), (3L, "v9", 20L), (4L, "b", 10L)))
  }

  test("cdcLatest aggregate matches the row_number window formulation") {
    val ev = (1 to 2000).map { i =>
      (i % 37L, s"s${i % 11}", (i % 13).toLong, i.toLong)
    }.toDF("k", "state", "ts", "id")
    val agg = ChangeCapture.cdcLatest(ev, "k", "state", "ts", "id", "s0")
      .as[(Long, String, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("k").orderBy($"ts".desc, $"id".desc)
    val win = ev.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1 && $"state" =!= "s0")
      .select($"k", $"state", $"ts").as[(Long, String, Long)]
      .collect().toSet
    assert(agg == win)
  }

  test("bloom-prefiltered join is exact and prunes at the scan") {
    // spark.range (not a LocalRelation): ConvertToLocalRelation would
    // otherwise fold the bloom Filter into the optimized plan, hiding
    // the node this test asserts on.
    val probe = spark.range(1, 20001)
      .select(($"id" % 997).as("pk"), $"id".as("x"))
    val dim = (0L until 997L by 100L).map(k => (k, s"d$k")).toDF("dk", "name")
    val plain = probe.join(dim, $"pk" === $"dk")
      .select($"pk", $"x", $"name").as[(Long, Long, String)].collect().toSet
    val pre = BloomJoin.prefilteredJoin(probe, dim, "pk", "dk",
        expectedItems = 1024)
      .select($"pk", $"x", $"name").as[(Long, Long, String)].collect().toSet
    assert(pre == plain)
    val plan = BloomJoin.prefilteredJoin(probe, dim, "pk", "dk",
        expectedItems = 1024)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan)
  }

  test("funnel supports repeated step types (view → view = two views)") {
    val ev = Seq((1L, "v", 10L), (1L, "v", 20L),
                 (2L, "v", 10L),
                 (3L, "v", 10L), (3L, "v", 10L)) // simultaneous ⇒ no 2nd
      .toDF("user_id", "event_type", "ts")
    val out = Funnel.funnel(ev, "user_id", "event_type", "ts", Seq("v", "v"))
      .orderBy("step_idx").as[(Int, String, Long, Long)].collect().toSeq
    assert(out == Seq((1, "v", 3L, 0L), (2, "v", 1L, 10L)))
  }

  test("bloom join treats null probe keys exactly like the plain join") {
    val probe = Seq(Some(1L), None, Some(2L), None, Some(99L))
      .toDF("pk").select($"pk", monotonically_increasing_id().as("row"))
    val dim = Seq((1L, "a"), (2L, "b")).toDF("dk", "name")
    val plain = probe.join(dim, $"pk" === $"dk")
      .select($"pk", $"name").as[(Long, String)].collect().toSet
    val pre = BloomJoin.prefilteredJoin(probe, dim, "pk", "dk", 64)
      .select($"pk", $"name").as[(Long, String)].collect().toSet
    assert(pre == plain && plain == Set((1L, "a"), (2L, "b")))
  }

  test("bloom filter actually rejects most non-matching keys") {
    val dim = (0L until 100L).map(k => (k, k)).toDF("dk", "y")
    val bytes = BloomJoin.bloomBytes(dim, "dk", 1024, 0.01)
    val probe = (100000L to 110000L).toDF("pk")
    val passed = probe
      .filter(BloomJoin.mightContain($"pk", bytes)).count()
    // 10k foreign keys at fpp 0.01 ⇒ expect ~100 survivors, allow 5×
    assert(passed < 500, s"bloom passed $passed of 10001 foreign keys")
  }
}
