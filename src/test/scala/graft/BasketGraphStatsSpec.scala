package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{Allocation, Bfs, KCore, MarketBasket, Skyline, Stats}

/** Contracts for the round-5 batch: market-basket rules, bounded BFS,
  * largest-remainder apportionment, grouped integer-exact OLS. */
class BasketGraphStatsSpec extends SparkSpec {
  import spark.implicits._

  // ---- MarketBasket -------------------------------------------------

  test("pairRules matches a brute-force pair count and the rule algebra") {
    val items = Seq(
      (1, "a"), (1, "b"), (1, "c"),
      (2, "a"), (2, "b"),
      (3, "a"), (3, "c"),
      (4, "b"), (4, "b"), // duplicate item in a basket — must dedupe
      (5, "a")
    ).toDF("basket", "item")
    val out = MarketBasket.pairRules(items, "basket", "item", 0L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap

    // brute force: {a,b} in baskets 1,2; {a,c} in 1,3; {b,c} in 1
    assert(out.keySet === Set(("a", "b"), ("a", "c"), ("b", "c")))
    val ab = out(("a", "b"))
    assert(ab.getAs[Long]("pair_cnt") === 2L)
    assert(ab.getAs[Long]("cnt_a") === 4L) // a in 1,2,3,5
    assert(ab.getAs[Long]("cnt_b") === 3L) // b in 1,2,4
    assert(ab.getAs[Long]("conf_ab_ppm") === 2L * 1000000 / 4)
    assert(ab.getAs[Long]("conf_ba_ppm") === 2L * 1000000 / 3)
    // lift = pair·n_baskets·1e6 / (cnt_a·cnt_b) = 2·5·1e6/12
    assert(ab.getAs[Long]("lift_ppm") === 10000000L / 12)
  }

  test("pairRules support gate is relative to the basket count") {
    val items = (1 to 100).flatMap { b =>
      Seq((b, "x"), (b, "y")) ++ (if (b <= 4) Seq((b, "z")) else Nil)
    }.toDF("basket", "item")
    // {x,y} support 100%, {x,z}/{y,z} support 4% — a 5% gate keeps one
    val kept = MarketBasket.pairRules(items, "basket", "item", 50000L)
      .select("item_a", "item_b").as[(String, String)].collect().toSet
    assert(kept === Set(("x", "y")))
  }

  // ---- Bfs ----------------------------------------------------------

  test("boundedDistances walks a path graph one hop per round") {
    // path 0-1-2-...-9 plus an isolated edge 100-101
    val edges = ((0 to 8).map(i => (i, i + 1)) :+ (100, 101)).toDF("u", "v")
    val dist = Bfs.boundedDistances(edges, Seq(0).toDF("node"), 4)
      .as[(Int, Int)].collect().toMap
    assert(dist === Map(0 -> 0, 1 -> 1, 2 -> 2, 3 -> 3, 4 -> 4))
  }

  test("boundedDistances: multi-source min, symmetric closure, hop cap 0") {
    // reverse-oriented edges must still be walkable
    val edges = Seq((1, 0), (2, 1), (3, 2), (9, 3)).toDF("u", "v")
    val dist = Bfs.boundedDistances(edges, Seq(0, 9).toDF("node"), 2)
      .as[(Int, Int)].collect().toMap
    // 3 is 1 hop from 9 (not 3 hops from 0); 2 is 2 hops from both
    assert(dist === Map(0 -> 0, 9 -> 0, 1 -> 1, 3 -> 1, 2 -> 2))
    val only = Bfs.boundedDistances(edges, Seq(0).toDF("node"), 0)
      .as[(Int, Int)].collect().toMap
    assert(only === Map(0 -> 0))
  }

  // ---- CoOccurrence guard -------------------------------------------

  test("co-occurrence fails loudly on a hub basket instead of exploding") {
    val ok = (1 to 50).map(i => (1, i)) ++ Seq((2, 1), (2, 2))
    // 50-item basket passes a maxBasket of 50…
    assert(graft.operators.CoOccurrence
      .weighted(ok.toDF("b", "i"), "b", "i", maxBasket = 50)
      .count() > 0)
    // …and fails a maxBasket of 49 with the diagnostic, not silence
    val e = intercept[Exception] {
      graft.operators.CoOccurrence
        .weighted(ok.toDF("b", "i"), "b", "i", maxBasket = 49)
        .count()
    }
    assert(e.getMessage.contains("CoOccurrence") ||
      Option(e.getCause).exists(_.getMessage.contains("CoOccurrence")))
  }

  // ---- KCore --------------------------------------------------------

  test("peel at k=2 dissolves a path but preserves a cycle") {
    val path = (0 to 6).sliding(2).map(p => (p(0), p(1))).toSeq.toDF("u", "v")
    // each round strips both endpoints: 7 → 5 → 3 → 1 → no edges left
    assert(KCore.peel(path, 2, 3).isEmpty)
    val cycle = ((0 to 5).sliding(2).map(p => (p(0), p(1))).toSeq :+ (5, 0))
      .toDF("u", "v")
    val kept = KCore.peel(cycle, 2, 3).as[(Int, Long)].collect().toMap
    assert(kept === (0 to 5).map(_ -> 2L).toMap)
  }

  test("peel removes a pendant vertex but keeps the clique it hangs off") {
    val clique = for { i <- 0 to 3; j <- 0 to 3 if i < j } yield (i, j)
    val edges = (clique :+ (3, 99)).toDF("u", "v")
    val kept = KCore.peel(edges, 3, 2).as[(Int, Long)].collect().toMap
    // 99 (deg 1) peels in round 1; the K4 members keep degree 3
    assert(kept === Map(0 -> 3L, 1 -> 3L, 2 -> 3L, 3 -> 3L))
  }

  // ---- Allocation ---------------------------------------------------

  test("largestRemainder: hand-checked Hamilton example") {
    val w = Seq(("a", 5L), ("b", 3L), ("c", 1L)).toDF("src", "wt")
    val q = Allocation.largestRemainder(w, "src", "wt", 10L)
      .select("k", "quota").as[(String, Long)].collect().toMap
    // exact shares 50/9, 30/9, 10/9 → bases 5,3,1 (sum 9); the one
    // leftover unit goes to the largest remainder (a: 5/9)
    assert(q === Map("a" -> 6L, "b" -> 3L, "c" -> 1L))
  }

  test("largestRemainder: quotas always sum to the budget, off by ≤1 from exact") {
    val w = Seq(("s1", 7L), ("s2", 7L), ("s3", 7L), ("s4", 2L), ("s0", 0L))
      .toDF("src", "wt")
    val rows = Allocation.largestRemainder(w, "src", "wt", 101L).collect()
    assert(rows.map(_.getAs[Long]("quota")).sum === 101L)
    rows.foreach { r =>
      val exact = r.getAs[Long]("weight") * 101.0 / 23.0
      val quota = r.getAs[Long]("quota")
      assert(quota >= math.floor(exact) && quota <= math.ceil(exact),
        s"$r vs exact $exact")
    }
    // remainder ties (three identical weights) break by key order
    val m = rows.map(r => r.getString(0) -> r.getAs[Long]("quota")).toMap
    assert(m("s1") >= m("s2") && m("s2") >= m("s3"))
    assert(m("s0") === 0L)
  }

  // ---- Skyline ------------------------------------------------------

  test("pareto2d equals brute-force dominance on random points") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.tabulate(400)(i =>
      (if (i % 2 == 0) "g1" else "g2", i.toLong,
       rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val df = pts.toDF("g", "id", "x", "y")
    val got = Skyline.pareto2d(df, Seq("g"), col("x"), col("y"))
      .select("id").as[Long].collect().toSet
    val want = pts.filter { case (g, _, x, y) =>
      !pts.exists { case (g2, _, x2, y2) =>
        g2 == g && x2 <= x && y2 <= y && (x2 < x || y2 < y) }
    }.map(_._2).toSet
    assert(got === want)
    // duplicate frontier points must BOTH survive
    val dup = Seq(("g", 1L, 0L, 5L), ("g", 2L, 0L, 5L), ("g", 3L, 1L, 9L))
      .toDF("g", "id", "x", "y")
    assert(Skyline.pareto2d(dup, Seq("g"), col("x"), col("y"))
      .select("id").as[Long].collect().toSet === Set(1L, 2L))
  }

  // ---- Stats --------------------------------------------------------

  test("linearFitGrouped matches the float OLS fit on a known line") {
    // y = 3x + 7 exactly, plus a noisy group with a negative trend
    val d = ((1 to 20).map(x => ("exact", x.toLong, 3L * x + 7)) ++
             Seq(("neg", 1L, 100L), ("neg", 2L, 80L), ("neg", 3L, 61L),
                 ("neg", 4L, 39L))).toDF("g", "x", "y")
    val out = Stats.linearFitGrouped(d, Seq("g"), col("x"), col("y"))
      .collect().map(r => r.getString(0) -> r).toMap

    assert(out("exact").getAs[Long]("slope_ppm") === 3000000L)
    assert(out("exact").getAs[Long]("intercept_milli") === 7000L)

    // float reference for the negative group
    val xs = Seq(1.0, 2.0, 3.0, 4.0); val ys = Seq(100.0, 80.0, 61.0, 39.0)
    val n = xs.size
    val slope = (n * xs.zip(ys).map { case (a, b) => a * b }.sum -
                 xs.sum * ys.sum) / (n * xs.map(a => a * a).sum -
                 xs.sum * xs.sum)
    val icept = (ys.sum - slope * xs.sum) / n
    val got = out("neg")
    assert(math.abs(got.getAs[Long]("slope_ppm") - slope * 1e6) <= 1.0)
    assert(math.abs(got.getAs[Long]("intercept_milli") - icept * 1e3) <= 1.0)
    assert(got.getAs[Long]("slope_ppm") < 0)
  }

  test("medianAbsDev: crossing-rule median and MAD on a hand-walked set") {
    // values 1,1,2,4,10: cum·2 crosses at 2 → median 2; deviations
    // 1,1,0,2,8: crossing at 1 → MAD 1. Even-count groups take the
    // LOWER median (crossing rule, no interpolation): [1,3] → 1.
    val d = (Seq(1L, 1L, 2L, 4L, 10L).map(("a", _)) ++
             Seq(("b", 1L), ("b", 3L))).toDF("g", "v")
    val out = Stats.medianAbsDev(d, Seq("g"), col("v"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").getAs[Long]("median") === 2L)
    assert(out("a").getAs[Long]("mad") === 1L)
    assert(out("b").getAs[Long]("median") === 1L)
    assert(out("b").getAs[Long]("mad") === 0L) // devs 0,2 → crossing at 0
  }

  test("groupedWeightedCrossing: differential vs the window crossing " +
       "on randomized weighted values, several ratios") {
    val r = new scala.util.Random(42)
    // clustered values so buckets get uneven mass, plus a wide outlier
    // tail so the histogram range is much larger than the clusters
    val rows = (0 until 4000).map { i =>
      val g = s"g${i % 4}"
      val v = if (r.nextInt(50) == 0) r.nextInt(1000000).toLong
              else (r.nextInt(20) * 97).toLong
      (g, v, 1L + r.nextInt(5).toLong)
    }
    val d = rows.toDF("g", "v", "w").repartition(6)
    for ((k, m) <- Seq((2L, 1L), (20L, 1L), (20L, 19L), (1L, 1L), (5L, 0L))) {
      val got = Stats.groupedWeightedCrossing(
          d, Seq("g"), "v", "w", k, m, "x")
        .collect().map(r => r.getString(0) -> r.getAs[Long]("x")).toMap
      val want = rows.groupBy(_._1).map { case (g, rs) =>
        val byV = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum)
          .toSeq.sortBy(_._1)
        val tot = byV.map(_._2).sum
        var cum = 0L
        g -> byV.collectFirst {
          case (v, w) if { cum += w; cum * k >= tot * m } => v
        }.get
      }
      assert(got == want, s"crossing k=$k m=$m")
    }
  }

  test("groupedWeightedCrossing: all-equal values and one-row groups") {
    val d = Seq(("a", 7L, 3L), ("a", 7L, 9L), ("b", -5L, 1L))
      .toDF("g", "v", "w")
    val out = Stats.groupedWeightedCrossing(d, Seq("g"), "v", "w", 2, 1, "x")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("x")).toMap
    assert(out == Map("a" -> 7L, "b" -> -5L))
  }

  test("groupedWeightedCrossing fails loudly on negative weights " +
       "instead of returning a silently wrong quantile") {
    val d = Seq(("a", 1L, 4L), ("a", 2L, -1L), ("a", 3L, 4L))
      .toDF("g", "v", "w")
    val e = intercept[Exception] {
      Stats.groupedWeightedCrossing(d, Seq("g"), "v", "w", 2, 1, "x")
        .collect()
    }
    assert(e.getMessage.contains("negative weight") ||
           Option(e.getCause).exists(_.getMessage.contains("negative weight")))
  }

  test("linearFitGrouped: zero x-variance group yields NULL fit, stats intact") {
    val d = Seq(("c", 5L, 1L), ("c", 5L, 9L)).toDF("g", "x", "y")
    val r = Stats.linearFitGrouped(d, Seq("g"), col("x"), col("y")).head()
    assert(r.isNullAt(r.fieldIndex("slope_ppm")))
    assert(r.isNullAt(r.fieldIndex("intercept_milli")))
    assert(r.getAs[Long]("n") === 2L && r.getAs[Long]("sx") === 10L)
  }
}
