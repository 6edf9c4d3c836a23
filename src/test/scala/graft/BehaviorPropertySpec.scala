package graft

import scala.util.Random

import graft.operators.{ChangeCapture, Funnel}

/** Differential tests of the behavioral operators against independent
  * driver-side reference models (plain Scala loops — no Spark, no
  * SQL), on randomized event streams. Complements the DuckDB oracle:
  * the oracle shares the relational formulation, these models share
  * nothing but the spec.
  */
class BehaviorPropertySpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("a", "b", "c")

  /** Spec, implemented naively per user: walk ts-sorted events, take
    * the first step-k event strictly after the step-(k-1) time. */
  private def refFunnel(events: Seq[(Long, String, Long)])
      : Map[Int, (Long, Long)] =
    events.groupBy(_._1).values.map { evs =>
      val sorted = evs.sortBy(e => (e._3, e._2))
      val times = sorted.foldLeft(Vector.empty[Long]) { (acc, e) =>
        val k = acc.length
        if (k < steps.length && e._2 == steps(k) &&
            (k == 0 || e._3 > acc(k - 1))) acc :+ e._3 else acc
      }
      times
    }.foldLeft(Map.empty[Int, (Long, Long)].withDefaultValue((0L, 0L))) {
      (m, times) =>
        times.indices.foldLeft(m) { (m2, i) =>
          val (u, lag) = m2(i + 1)
          m2.updated(i + 1, (u + 1, lag + (times(i) - times(0))))
        }
    }

  test("funnel matches the naive per-user walk on random event streams") {
    val rnd = new Random(42)
    for (trial <- 1 to 4) {
      val events = Seq.fill(800) {
        (rnd.nextInt(30).toLong, steps(rnd.nextInt(3)),
         rnd.nextInt(50).toLong * 7)   // coarse ts grid forces ties
      }
      val got = Funnel.funnel(events.toDF("user_id", "event_type", "ts"),
          "user_id", "event_type", "ts", steps)
        .as[(Int, String, Long, Long)].collect()
        .map(t => t._1 -> ((t._3, t._4))).toMap
      val want = refFunnel(events)
      (1 to 3).foreach { k =>
        assert(got(k) == want(k), s"trial $trial step $k: $got vs $want")
      }
    }
  }

  /** Naive SCD2: sort, drop consecutive duplicates, pair with next. */
  private def refScd2(events: Seq[(Long, String, Long, Long)])
      : Set[(Long, String, Int, Long, Option[Long], Boolean)] =
    events.groupBy(_._1).flatMap { case (k, evs) =>
      val sorted = evs.sortBy(e => (e._3, e._4))
      val changed = sorted.foldLeft(Vector.empty[(String, Long)]) { (acc, e) =>
        if (acc.nonEmpty && acc.last._1 == e._2) acc else acc :+ (e._2 -> e._3)
      }
      changed.zipWithIndex.map { case ((st, ts), i) =>
        val to = if (i + 1 < changed.length) Some(changed(i + 1)._2) else None
        (k, st, i + 1, ts, to, to.isEmpty)
      }
    }.toSet

  test("scd2 matches the naive walk on random event streams") {
    val rnd = new Random(7)
    for (trial <- 1 to 4) {
      val events = Seq.tabulate(600) { i =>
        (rnd.nextInt(25).toLong, s"s${rnd.nextInt(4)}",
         rnd.nextInt(40).toLong * 3, i.toLong) // ties broken by id
      }
      val got = ChangeCapture.scd2(
          events.toDF("k", "state", "ts", "id"), "k", "state", "ts", "id")
        .as[(Long, String, Int, Long, Option[Long], Boolean)]
        .collect().toSet
      assert(got == refScd2(events), s"trial $trial")
    }
  }

  test("cdcLatest matches the naive walk incl. all-deleted keys") {
    val rnd = new Random(13)
    val events = Seq.tabulate(600) { i =>
      (rnd.nextInt(25).toLong, s"s${rnd.nextInt(4)}",
       rnd.nextInt(40).toLong, i.toLong)
    }
    val got = ChangeCapture.cdcLatest(
        events.toDF("k", "state", "ts", "id"), "k", "state", "ts", "id", "s0")
      .as[(Long, String, Long)].collect().toSet
    val want = events.groupBy(_._1).flatMap { case (k, evs) =>
      val last = evs.maxBy(e => (e._3, e._4))
      if (last._2 == "s0") None else Some((k, last._2, last._3))
    }.toSet
    assert(got == want)
  }
}
