package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{ConnectedComponents, LabelPropagation}

/** Deterministic synchronous LPA: a hand-traced barbell (where
  * communities and components genuinely differ), a brute-force
  * differential on random graphs, and the synchronous-update contract
  * (round k uses only round k−1 labels).
  */
class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  /** Reference implementation: in-memory synchronous LPA with the same
    * min-label tie-break, over canonical (u < v) edges. */
  private def bruteLpa(edges: Seq[(Long, Long)], rounds: Int)
      : Map[Long, Long] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to rounds) {
      labels = adj.map { case (n, nbrs) =>
        val votes = nbrs.groupBy(labels).view.mapValues(_.size)
        // max count, ties to the smallest label
        n -> votes.toSeq.maxBy { case (lbl, c) => (c, -lbl) }._1
      }
    }
    labels
  }

  test("edge contract: reversed and self-loop rows fail loudly in both " +
       "LabelPropagation and RandomWalk; canonical input passes") {
    def msgOf(e: Throwable): String =
      String.valueOf(e.getMessage) +
        String.valueOf(Option(e.getCause).map(_.getMessage).getOrElse(""))
    val reversed = Seq((1L, 2L), (3L, 2L)).toDF("u", "v") // 3 > 2
    val selfLoop = Seq((1L, 2L), (2L, 2L)).toDF("u", "v")
    val seeds = Seq(1L).toDF("s")
    for (bad <- Seq(reversed, selfLoop)) {
      val e1 = intercept[Exception] {
        LabelPropagation.run(bad, "u", "v", rounds = 1).collect()
      }
      assert(msgOf(e1).contains("canonical u < v"), msgOf(e1))
      val e2 = intercept[Exception] {
        graft.operators.RandomWalk.deterministicWalks(
          bad, "u", "v", seeds, "s", 1, 1).collect()
      }
      assert(msgOf(e2).contains("canonical u < v"), msgOf(e2))
    }
    // canonical edges sail through (the guard costs nothing valid rows)
    assert(LabelPropagation.run(
      Seq((1L, 2L), (2L, 3L)).toDF("u", "v"), "u", "v", 1).count() == 3)
  }

  test("barbell: two triangles over one bridge become TWO communities " +
       "where connected components merge them into one") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
                    (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("u", "v")
    val got = LabelPropagation.run(edges, "u", "v", rounds = 3)
      .as[(Long, Long)].collect().toMap
    // hand-traced: the left triangle settles on 1, the right on 3
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
                      4L -> 3L, 5L -> 3L, 6L -> 3L))
    assert(got.values.toSet.size == 2)
    val cc = ConnectedComponents.run(
        edges.select(col("u").as("id")).unionByName(
          edges.select(col("v").as("id"))).distinct(),
        edges)
      .as[(Long, Long)].collect().toMap
    assert(cc.values.toSet.size == 1, "CC merges the barbell")
  }

  test("differential vs brute-force synchronous LPA on random graphs, " +
       "rounds 1 through 3") {
    val rnd = new Random(11)
    for (trial <- 1 to 3) {
      val n = 40
      val edges = (1 to 120).map { _ =>
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val df = edges.toDF("u", "v")
      for (r <- 1 to 3) {
        val got = LabelPropagation.run(df, "u", "v", r)
          .as[(Long, Long)].collect().toMap
        val want = bruteLpa(edges, r)
        assert(got == want, s"trial $trial rounds $r")
      }
    }
  }

  test("synchronous semantics: round 2 votes use round-1 labels, not " +
       "freshly updated ones (a path's label wave moves one hop/round)") {
    // path 1-2-3-4-5: after ONE round every node adopts its smallest
    // neighbor — an async sweep from the left would flood label 1
    // through the whole path in a single pass
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val r1 = LabelPropagation.run(edges, "u", "v", 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }
}
