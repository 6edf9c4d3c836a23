package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.GapsAndIslands

/** ScalaCheck-generated round-trip property for the gaps-and-islands
  * collapse: expand(collapse(x)) == x for arbitrary per-key state
  * sequences — the algebraic law behind the retention range semantics
  * (SURVEY.md §5). */
class CollapsePropertySpec extends SparkSpec {
  import spark.implicits._

  private val caseGen: Gen[Map[String, List[Boolean]]] = for {
    nKeys <- Gen.choose(1, 12)
    states <- Gen.listOfN(nKeys, Gen.nonEmptyListOf(Gen.oneOf(true, false)))
  } yield states.zipWithIndex.map { case (s, i) => s"k$i" -> s.take(30) }.toMap

  test("expand ∘ collapse = identity on generated state sequences") {
    (0 until 8).foreach { caseId =>
      val data = caseGen(Gen.Parameters.default, Seed(1000L + caseId)).get
      val rows = data.toSeq.flatMap { case (k, states) =>
        states.zipWithIndex.map { case (st, pos) => (k, pos, st) }
      }
      val df = rows.toDF("k", "pos", "st")
      val collapsed = GapsAndIslands.collapse(df, Seq("k"), "pos", "st")
        .as[(String, Boolean, Int, Int)].collect()
      // ranges must tile [0, n) per key without overlap, alternate
      // state, and re-expand to the original sequence
      val expanded = collapsed.flatMap { case (k, st, s, e) =>
        (s to e).map(pos => (k, pos, st))
      }.toSet
      assert(expanded == rows.toSet, s"case $caseId")
      data.foreach { case (k, states) =>
        val runs = collapsed.filter(_._1 == k).sortBy(_._3)
        assert(runs.head._3 == 0 && runs.last._4 == states.length - 1)
        runs.sliding(2).foreach {
          case Array(a, b) =>
            assert(a._4 + 1 == b._3 && a._2 != b._2, s"case $caseId key $k")
          case _ =>
        }
      }
    }
  }
}
