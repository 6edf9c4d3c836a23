package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.operators.{Allocation, Bfs, KCore, MarketBasket}

/** Randomized differential tests of the round-5 session-3 operators
  * against independent driver-side reference models (plain Scala — no
  * Spark, no SQL). Complements the DuckDB oracles, which share the
  * relational formulation; these models share nothing but the spec.
  */
class SessionOpsPropertySpec extends SparkSpec {
  import spark.implicits._

  test("apportionment invariants hold on random weight vectors") {
    val rnd = new Random(1)
    for (trial <- 1 to 5) {
      val n = 2 + rnd.nextInt(20)
      val weights = (0 until n).map(i => (s"k$i", rnd.nextInt(1000).toLong))
      val budget = 1 + rnd.nextInt(100000)
      val total = weights.map(_._2).sum
      if (total > 0) {
        val got = Allocation.largestRemainder(
          weights.toDF("k", "w"), "k", "w", budget.toLong)
          .select("k", "quota").as[(String, Long)].collect().toMap
        assert(got.values.sum === budget.toLong, s"trial $trial sum")
        weights.foreach { case (k, w) =>
          val exact = w.toDouble * budget / total
          assert(got(k) >= math.floor(exact).toLong &&
                 got(k) <= math.ceil(exact).toLong,
            s"trial $trial key $k quota ${got(k)} vs exact $exact")
        }
      }
    }
  }

  test("bounded BFS equals Floyd-style reference distances on random graphs") {
    val rnd = new Random(2)
    for (trial <- 1 to 3) {
      val n = 3 + rnd.nextInt(25)
      val edges = (1 to n * 2).map(_ => (rnd.nextInt(n), rnd.nextInt(n)))
        .filter { case (u, v) => u != v }
      val sources = Seq(0, 1)
      val hops = 1 + rnd.nextInt(4)
      // reference: BFS over an adjacency map
      val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
        .map { case (k, vs) => k -> vs.map(_._2).toSet }
      var dist = sources.map(_ -> 0).toMap
      var frontier = sources.toSet
      for (h <- 1 to hops) {
        val next = frontier.flatMap(adj.getOrElse(_, Set.empty))
          .diff(dist.keySet)
        dist ++= next.map(_ -> h)
        frontier = next
      }
      val got = Bfs.boundedDistances(edges.toDF("u", "v"),
          sources.toDF("node"), hops)
        .as[(Int, Int)].collect().toMap
      assert(got === dist, s"trial $trial (n=$n hops=$hops)")
    }
  }

  test("bounded Bellman-Ford equals reference min-cost within hop budget") {
    val rnd = new Random(5)
    for (trial <- 1 to 3) {
      val n = 4 + rnd.nextInt(15)
      val edges = (1 to n * 2)
        .map(_ => (rnd.nextInt(n), rnd.nextInt(n), (1 + rnd.nextInt(9)).toLong))
        .filter(e => e._1 != e._2)
      val rounds = 1 + rnd.nextInt(3)
      // reference: DP over hop count on the symmetric min-cost adjacency
      val sym = (edges ++ edges.map(e => (e._2, e._1, e._3)))
        .groupBy(e => (e._1, e._2)).map { case (k, es) => k -> es.map(_._3).min }
      var best = Map(0 -> 0L)
      for (_ <- 1 to rounds) {
        val relaxed = best.toSeq.flatMap { case (u, c) =>
          sym.collect { case ((`u`, v), w) => v -> (c + w) } }
        best = (best.toSeq ++ relaxed).groupBy(_._1)
          .map { case (k, cs) => k -> cs.map(_._2).min }
      }
      val got = graft.operators.Bfs.boundedMinCost(
          edges.toDF("u", "v", "cost"), Seq(0).toDF("node"), rounds)
        .as[(Int, Long)].collect().toMap
      assert(got === best, s"trial $trial (n=$n rounds=$rounds)")
    }
  }

  test("k-core survivors all meet the threshold inside the survivor graph") {
    val rnd = new Random(3)
    for (trial <- 1 to 3) {
      val n = 10 + rnd.nextInt(30)
      val edges = (1 to n * 3).map(_ => (rnd.nextInt(n), rnd.nextInt(n)))
        .filter { case (u, v) => u != v }
      val k = 2 + rnd.nextInt(3)
      // enough rounds to reach the fixpoint on a graph this size
      val out = KCore.peel(edges.toDF("u", "v"), k, rounds = n)
        .as[(Int, Long)].collect().toMap
      // at the fixpoint every survivor's degree within the survivor
      // set is ≥ k, and it must equal the reference peel
      out.values.foreach(d => assert(d >= k, s"trial $trial deg $d < $k"))
      var surv = (edges.flatMap(e => Seq(e._1, e._2))).toSet
      var changed = true
      val canon = edges.filter(e => e._1 != e._2)
        .map(e => (e._1 min e._2, e._1 max e._2)).toSet
      while (changed) {
        val deg = canon.toSeq.filter(e => surv(e._1) && surv(e._2))
          .flatMap(e => Seq(e._1, e._2)).groupBy(identity)
          .map { case (x, xs) => x -> xs.size }
        val keep = surv.filter(x => deg.getOrElse(x, 0) >= k)
        changed = keep != surv
        surv = keep
      }
      assert(out.keySet === surv, s"trial $trial survivor set")
    }
  }

  test("pair rules equal brute-force counts on random baskets") {
    val rnd = new Random(4)
    val items = (1 to 300).map(_ => (rnd.nextInt(40), s"it${rnd.nextInt(12)}"))
    val got = MarketBasket.pairRules(items.toDF("b", "i"), "b", "i", 0L)
      .select("item_a", "item_b", "pair_cnt")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val sets = items.distinct.groupBy(_._1).values.map(_.map(_._2).toSet)
    val want = sets.flatMap(s =>
        s.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (p, ps) => p -> ps.size.toLong }
    assert(got === want)
  }
}
