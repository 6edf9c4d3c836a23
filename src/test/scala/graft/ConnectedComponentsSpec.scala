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
}
