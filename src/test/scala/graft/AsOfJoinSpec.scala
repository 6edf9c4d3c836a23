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
}
