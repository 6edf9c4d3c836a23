package graft

import scala.util.Random

import graft.operators.GapsAndIslands

/** Property tests for the run-length collapse (SURVEY.md §5): collapse
  * then re-expand is the identity; ranges partition the domain;
  * adjacent runs differ in state. */
class GapsAndIslandsSpec extends SparkSpec {
  import spark.implicits._

  test("collapse ∘ expand = id on random state sequences") {
    val rnd = new Random(42)
    (1 to 20).foreach { caseId =>
      val groups = 1 + rnd.nextInt(4)
      val rows = for {
        g <- 0 until groups
        i <- 0 until (1 + rnd.nextInt(30))
      } yield (s"g$g", i, rnd.nextBoolean())
      val df = rows.toDF("grp", "pos", "state")
      val collapsed = GapsAndIslands.collapse(df, Seq("grp"), "pos", "state")
        .collect()
      // re-expand each range and compare to input
      val expanded = collapsed.flatMap { r =>
        (r.getAs[Int]("range_start") to r.getAs[Int]("range_end"))
          .map(p => (r.getAs[String]("grp"), p, r.getAs[Boolean]("state")))
      }.toSet
      assert(expanded == rows.toSet, s"case $caseId mismatch")
      // adjacent runs alternate state within each group
      collapsed.groupBy(_.getAs[String]("grp")).foreach { case (_, rs) =>
        val sorted = rs.sortBy(_.getAs[Int]("range_start"))
        sorted.sliding(2).foreach {
          case Array(a, b) =>
            assert(a.getAs[Int]("range_end") + 1 == b.getAs[Int]("range_start"))
            assert(a.getAs[Boolean]("state") != b.getAs[Boolean]("state"))
          case _ =>
        }
      }
    }
  }

  test("single-element runs collapse to width-1 ranges") {
    val df = Seq(("g", 1, true), ("g", 2, false), ("g", 3, true))
      .toDF("grp", "pos", "state")
    val out = GapsAndIslands.collapse(df, Seq("grp"), "pos", "state")
      .orderBy("range_start").collect()
    assert(out.length == 3)
    out.foreach(r => assert(
      r.getAs[Int]("range_start") == r.getAs[Int]("range_end")))
  }
}
