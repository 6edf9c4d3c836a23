package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("picks most recent state at-or-before; null when none") {
    val probes = Seq((1L, 10L), (1L, 20L), (1L, 5L), (2L, 100L))
      .toDF("k", "t")
    val states = Seq((1L, 10L, "a"), (1L, 15L, "b"), (2L, 200L, "z"))
      .toDF("k", "st", "v")
    val got = AsOfJoin.joinAsOf(probes, states, Seq("k"), "t", "st", Seq("v"))
      .select("k", "t", "v").as[(Long, Long, Option[String])]
      .collect().toSet
    assert(got == Set(
      (1L, 10L, Some("a")),   // tie: state AT probe time wins
      (1L, 20L, Some("b")),   // most recent earlier state
      (1L, 5L, None),         // nothing at-or-before
      (2L, 100L, None)))      // state exists but later
  }

  test("forward picks earliest state at-or-after; null when none") {
    val probes = Seq((1L, 10L), (1L, 20L), (1L, 5L), (2L, 300L))
      .toDF("k", "t")
    val states = Seq((1L, 10L, "a"), (1L, 15L, "b"), (2L, 200L, "z"))
      .toDF("k", "st", "v")
    val got = AsOfJoin.joinAsOfForward(
        probes, states, Seq("k"), "t", "st", Seq("v"))
      .select("k", "t", "v").as[(Long, Long, Option[String])]
      .collect().toSet
    assert(got == Set(
      (1L, 10L, Some("a")),   // tie: simultaneous state matches
      (1L, 20L, None),        // nothing at-or-after
      (1L, 5L, Some("a")),    // earliest later state
      (2L, 300L, None)))
  }

  test("nearest picks the closer state, ties backward; differential vs brute force") {
    val rnd = new scala.util.Random(3)
    val probes = (1 to 300).map(_ => ((rnd.nextInt(5) + 1).toLong,
      rnd.nextInt(1000).toLong)).distinct
    val states = (1 to 80).map(i => ((rnd.nextInt(5) + 1).toLong,
      rnd.nextInt(1000).toLong, i.toLong))
      .groupBy(s => (s._1, s._2)).map(_._2.head).toSeq // unique (k, st)
    val got = AsOfJoin.joinAsOfNearest(
        probes.toDF("k", "t"), states.toDF("k", "st", "v"),
        Seq("k"), "t", "st", Seq("st", "v"))
      .select("k", "t", "st").as[(Long, Long, Option[Long])]
      .collect().map { case (k, t, st) => ((k, t), st) }.toMap
    probes.foreach { case (k, t) =>
      val cand = states.filter(_._1 == k)
      val want = if (cand.isEmpty) None else {
        val best = cand.minBy { case (_, st, _) =>
          // distance, tie → backward (at-or-before beats after)
          (math.abs(st - t), if (st <= t) 0 else 1)
        }
        Some(best._2)
      }
      assert(got((k, t)) == want, s"probe ($k, $t)")
    }
  }
}
