package graft

import org.apache.spark.sql.functions._

import graft.operators.ConnectedComponents

/** Stress the path-doubling code path directly: dedup graphs are
  * near-cliques (diameter 1-2), so the self-join/pointer-jumping loop
  * is barely exercised by the dedup specs. A long PATH graph is the
  * adversarial shape — neighbor propagation alone needs O(n) rounds;
  * pointer jumping must collapse it in O(log n).
  */
class ConnectedComponentsSpec extends SparkSpec {

  test("10k-node path converges in <= log2(n)+c rounds with correct labels") {
    import spark.implicits._
    val n = 10000L
    val nodes = spark.range(n).toDF("id")
    // one path: 0-1-2-...-9999 (diameter n-1)
    val edges = spark.range(n - 1)
      .select(col("id").as("u"), (col("id") + 1).as("v"))
    val (comps, rounds) = ConnectedComponents.runCounted(nodes, edges)
    // seed = min(self, neighbors), then each round multiplies the
    // labelled-prefix length by ~3 (neighbor + label-of-label): the
    // bound below is log2(n)+4 with slack for the final confirm round
    val bound = (math.log(n.toDouble) / math.log(2.0)).ceil.toInt + 4
    assert(rounds <= bound, s"$rounds rounds for n=$n (bound $bound)")
    val labels = comps.as[(Long, Long)].collect()
    assert(labels.length == n)
    assert(labels.forall(_._2 == 0L), "all path nodes reach min label 0")
  }

  test("integer pagerank: floor, mass bound, hub ranking, partition-invariant") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // star graph: hub 0 ↔ leaves 1..20, plus an isolated edge 100↔101
    val base = ((1L to 20L).map(l => (0L, l)) ++ Seq((100L, 101L))).toDF("u", "v")
    val edges = base.union(base.select(col("v"), col("u")))
    val pr = graft.operators.PageRank.integerPageRank(edges, 3)
      .as[(Long, Long)].collect().toMap
    assert(pr.values.forall(_ >= 150000L), "teleport floor violated")
    // dangling-free graph: total mass stays ≤ initial (23 nodes × 1e6)
    assert(pr.size == 23 && pr.values.sum <= 23L * 1000000L)
    assert(pr(0L) > pr(1L) * 5, s"hub must dominate leaves: $pr")
    assert((1L to 20L).map(pr).distinct.size == 1, "leaves must tie exactly")
    val pr2 = graft.operators.PageRank.integerPageRank(
      edges.repartition(7), 3).as[(Long, Long)].collect().toMap
    assert(pr2 == pr, "integer arithmetic must be partition-invariant")
  }

  test("two disjoint paths + singletons label independently") {
    import spark.implicits._
    val nodes = spark.range(250).toDF("id")
    // path A: 0..99, path B: 100..199; 200..249 isolated
    val edges = spark.range(99).select(col("id").as("u"), (col("id") + 1).as("v"))
      .union(spark.range(99).select((col("id") + 100).as("u"), (col("id") + 101).as("v")))
    val (comps, rounds) = ConnectedComponents.runCounted(nodes, edges)
    val m = comps.as[(Long, Long)].collect().toMap
    assert((0L until 100L).forall(m(_) == 0L))
    assert((100L until 200L).forall(m(_) == 100L))
    assert((200L until 250L).forall(i => m(i) == i), "singletons self-label")
    assert(rounds <= 11, s"$rounds rounds for 100-node paths")
  }

  test("runBlocked matches the propagation loop on random blocked graphs") {
    import spark.implicits._
    val r = new scala.util.Random(11)
    // 6 blocks, random chains/cliques inside each — edges NEVER cross
    // blocks (the caller contract runBlocked exploits)
    val edges = (0 until 6).flatMap { b =>
      val ids = (0 until 60).map(i => b * 1000L + i)
      (1 to 120).map { _ =>
        (s"blk$b", ids(r.nextInt(ids.length)), ids(r.nextInt(ids.length)))
      }
    }.toDF("k", "u", "v").filter(col("u") =!= col("v")).repartition(9)
    val got = ConnectedComponents.runBlocked(edges, "k", "u", "v")
      .as[(Long, Long)].collect().toMap
    val nodes = edges.select(col("u").as("id"))
      .union(edges.select(col("v").as("id"))).distinct()
    val want = ConnectedComponents.run(nodes, edges.select("u", "v"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
    assert(got.nonEmpty && got.values.toSet.size > 1)
  }

  test("runBlocked raises loudly above the node bound") {
    import spark.implicits._
    val edges = (0L until 50L).map(i => ("hot", i, i + 1)).toDF("k", "u", "v")
    val e = intercept[org.apache.spark.SparkException] {
      ConnectedComponents.runBlocked(edges, "k", "u", "v", maxNodes = 10)
        .count()
    }
    assert(e.getMessage.contains("exceeds") ||
      Option(e.getCause).exists(_.getMessage.contains("exceeds")))
  }
}
