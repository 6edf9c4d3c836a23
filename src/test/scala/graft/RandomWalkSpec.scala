package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.RandomWalk

/** Deterministic walks: every hop is a real edge, the draw matches a
  * brute-force evaluation of the same hash, and the corpus is
  * regenerable (bit-identical across runs). */
class RandomWalkSpec extends SparkSpec {
  import spark.implicits._

  private val P = 1000000007L
  private def pri(seed: Long, walkNo: Long, t: Long, v: Long): Long =
    (((seed * 31 + walkNo) % P) * 1315423911L % P +
      t * 2654435761L % P + ((v % P) * 2246822519L) % P) % P

  private def bruteWalks(edges: Seq[(Long, Long)], seeds: Seq[Long],
                         walks: Int, steps: Int)
      : Set[(Long, Long, Long, Long)] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val out = scala.collection.mutable.Set.empty[(Long, Long, Long, Long)]
    for (s <- seeds; w <- 0 until walks) {
      var node = s
      out += ((s, w.toLong, 0L, node))
      var t = 1
      var alive = adj.contains(node)
      while (t <= steps && alive) {
        adj.get(node) match {
          case Some(nbrs) =>
            node = nbrs.minBy(v => (pri(s, w.toLong, t.toLong, v), v))
            out += ((s, w.toLong, t.toLong, node))
          case None => alive = false
        }
        t += 1
      }
    }
    out.toSet
  }

  test("walks match brute-force hash draws and never leave the graph") {
    val rnd = new Random(5)
    val n = 30
    val edges = (1 to 80).map { _ =>
      val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    val df = edges.toDF("u", "v")
    val seeds = Seq(0L, 3L, 7L, 11L).toDF("s")
    val got = RandomWalk.deterministicWalks(df, "u", "v", seeds, "s", 2, 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == bruteWalks(edges, Seq(0L, 3L, 7L, 11L), 2, 3))
    // every consecutive (step, step+1) pair is a real edge
    val sym = (edges ++ edges.map(e => (e._2, e._1))).toSet
    val byWalk = got.groupBy(r => (r._1, r._2))
      .values.map(_.toSeq.sortBy(_._3).map(_._4))
    byWalk.foreach { path =>
      path.sliding(2).foreach {
        case Seq(a, b) => assert(sym((a, b)), s"$a -> $b is not an edge")
        case _ => ()
      }
    }
  }

  test("regenerable: two invocations are bit-identical") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("u", "v")
    val seeds = Seq(1L, 4L).toDF("s")
    val a = RandomWalk.deterministicWalks(edges, "u", "v", seeds, "s", 3, 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = RandomWalk.deterministicWalks(edges, "u", "v", seeds, "s", 3, 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
  }

  test("skipGramPairs matches brute-force window pairing on random walks") {
    val rnd = new Random(13)
    val n = 25
    val edges = (1 to 60).map { _ =>
      val a = rnd.nextInt(n).toLong; val b = rnd.nextInt(n).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    val walks = RandomWalk.deterministicWalks(
      edges.toDF("u", "v"), "u", "v", Seq(0L, 2L, 5L).toDF("s"), "s", 2, 4)
    val rows = walks.as[(Long, Long, Long, Long)].collect()
    for (w <- 1 to 3) {
      val got = RandomWalk.skipGramPairs(walks, w)
        .as[(Long, Long, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      val want = rows.groupBy(r => (r._1, r._2)).values.flatMap { wk =>
        val path = wk.toSeq.sortBy(_._3)
        for {
          i <- path.indices; j <- path.indices
          if j > i && j <= i + w
        } yield (math.min(path(i)._4, path(j)._4),
                 math.max(path(i)._4, path(j)._4))
      }.groupBy(identity).view.mapValues(_.size.toLong).toMap
      assert(got == want, s"window $w")
      assert(got.nonEmpty)
    }
  }

  test("duplicate seed rows do not inflate step-0 multiplicity") {
    val edges = Seq((1L, 2L)).toDF("u", "v")
    val seeds = Seq(1L, 1L, 1L).toDF("s") // same seed delivered thrice
    val got = RandomWalk.deterministicWalks(edges, "u", "v", seeds, "s", 1, 2)
      .collect()
    // exactly one row per (walk, step): 1 walk × 3 positions
    assert(got.length == 3)
  }

  test("an isolated seed contributes its step-0 row and nothing else") {
    val edges = Seq((1L, 2L)).toDF("u", "v")
    val seeds = Seq(1L, 99L).toDF("s") // 99 has no edges
    val got = RandomWalk.deterministicWalks(edges, "u", "v", seeds, "s", 1, 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got.filter(_._1 == 99L) == Set((99L, 0L, 0L, 99L)))
    // the connected walk bounces 1-2-1
    assert(got.filter(_._1 == 1L) ==
      Set((1L, 0L, 0L, 1L), (1L, 0L, 1L, 2L), (1L, 0L, 2L, 1L)))
  }
}
