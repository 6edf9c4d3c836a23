package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a candidate-pair graph — the clustering
  * step that turns near-dup PAIRS (MinHash/SimHash/embedding candidates,
  * `graft.functions.Dedup`) into duplicate GROUPS, so a pipeline can
  * keep one representative per component. The reference has nothing
  * like it; a training-data dedup pipeline is incomplete without it
  * (pairs alone can't answer "which rows do I drop" once duplicates
  * chain: a~b, b~c ⇒ {a,b,c}).
  *
  * Algorithm: distributed min-label propagation with pointer jumping.
  * Every node starts labeled with itself; each round a node's label
  * becomes the min of (its label, its neighbors' labels, its label's
  * label). The neighbor step alone converges in O(diameter) rounds;
  * the label-of-label join is path doubling, which collapses chains in
  * O(log n) rounds — the same convergence shape as the alternating
  * large-star/small-star MapReduce formulation (Kiveris et al., "
  * Connected Components in MapReduce and Beyond", SoCC'14), expressed
  * as plain self-joins.
  *
  * Scale shape: per round, ONE hash shuffle of the (node, label) set
  * by node (the union's groupBy) plus broadcast-or-shuffled joins of
  * labels against edges — every structure is keyed by node id, no
  * collect, no per-component state. `localCheckpoint` after each round
  * truncates lineage so round k doesn't re-execute rounds 1..k-1
  * (iterative DataFrame loops otherwise compound plans
  * exponentially). Dedup graphs are near-clique clusters with tiny
  * diameter, so the loop typically exits after 2-3 rounds.
  */
object ConnectedComponents {

  /** Compute components. `nodes`: single-column node universe (rows
    * not present in any edge become singleton components). `edges`:
    * two columns (undirected, self-loops/duplicates fine). Returns
    * (node, component) with component = min node id reachable.
    */
  def run(nodes: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame =
    runCounted(nodes, edges, maxIter)._1

  /** As [[run]], also returning the number of propagation rounds the
    * loop took to converge — the observable that pins the O(log n)
    * path-doubling contract (a path graph of n nodes must converge in
    * ~log₂(n) rounds, not O(n) neighbor-only rounds; asserted by
    * ConnectedComponentsSpec). */
  def runCounted(nodes: DataFrame, edges: DataFrame,
                 maxIter: Int = 25): (DataFrame, Int) = {
    val e = edges.toDF("u", "v").filter(col("u") =!= col("v"))
    // repartition by u AFTER the distinct (which clusters by (u,v)):
    // the per-round viaEdge join needs hashpartitioning(u), and the
    // checkpoint preserves the layout — one shuffle now instead of one
    // per round on the edge side
    // LoopCheckpoint (not raw localCheckpoint): the edge relation is
    // consumed by EVERY round, so it must honor the reliable-mode conf
    // on clusters — losing its executor-local blocks mid-loop would
    // kill the job as surely as losing a loop-carried frame
    val sym = LoopCheckpoint(
      e.union(e.select(col("v").as("u"), col("u").as("v"))).distinct()
        .repartition(col("u")))
    // Only edge-incident nodes iterate; isolated nodes are singleton
    // components by definition and would otherwise ride along through
    // every per-round shuffle (in a dedup graph, duplicates are a few
    // percent of the corpus — the iterating set shrinks 10-100×).
    // Seed label = min(self, direct neighbors) in ONE aggregation: for
    // clique-shaped dedup clusters this is already the fixpoint, so
    // the loop usually runs a single confirming round.
    var labels = LoopCheckpoint(
      sym.groupBy("u").agg(min(col("v")).as("_mv"))
        .select(col("u").as("node"),
                least(col("u"), col("_mv")).as("label")))
    val edgeNodes = labels.select("node")
    var iter = 0
    var done = false
    val nullOld = lit(null).cast(labels.schema("label").dataType)
    // One propagation round over a (node, label, _old) frame. The _old
    // column carries each node's pre-ITERATION label through the
    // aggregation (every node has exactly one; max() recovers it, the
    // edge/ptr branches contribute null) — the convergence check then
    // reads the checkpointed result directly instead of paying a
    // join+shuffle job per round.
    //
    // Three pointer-jump levels per round: label⁴(node). Labels are
    // monotone (label(x) ≤ x), so each extra jump dominates pointwise —
    // same union width, one more tiny join, and chain distance shrinks
    // ~4× per round instead of 2× (log₄ rounds on path graphs;
    // spec-pinned). Measured at sf0.1 on the 1k-chain path fixture:
    // 2 jumps 7.0 s, 3 jumps 4.5 s, 4 jumps 4.9 s — the 4th jump's
    // per-round join costs more than the round it saves.
    def propagate(cur: DataFrame): DataFrame = {
      val viaEdge = sym
        .join(cur.select(col("node").as("u"), col("label")), "u")
        .select(col("v").as("node"), col("label"))
      val ptr = cur.select(col("node").as("label"),
                           col("label").as("plabel"))
      def jump(df: DataFrame): DataFrame = df.join(ptr, "label")
        .select(col("node"), col("plabel").as("label"))
      val viaPtr = jump(jump(jump(cur.select("node", "label"))))
      cur.union(viaEdge.withColumn("_old", nullOld))
        .union(viaPtr.withColumn("_old", nullOld))
        .groupBy("node").agg(min("label").as("label"), max("_old").as("_old"))
    }
    // rolling release: round r's labels are dead once round r+1's cut
    // is durable (the initial `labels` frame is NOT rolled — edgeNodes
    // still reads it for the singleton anti-join after the loop)
    val roll = new LoopCheckpoint.Rolling
    while (!done && iter < maxIter) {
      // one round per materialization: an unrolled 2-rounds-per-
      // checkpoint variant was measured SLOWER at local scale (the
      // deeper 8-stage DAG outweighs the saved checkpoint/probe jobs)
      val seeded = labels.select(col("node"), col("label"),
                                 col("label").as("_old"))
      val next = roll.next(propagate(seeded))
      done = next.filter(col("label") =!= col("_old")).isEmpty
      labels = next.select("node", "label")
      iter += 1
    }
    // never return silently-wrong labels: with pointer jumping,
    // maxIter=25 covers any graph with < 2^25-step label chains, so
    // hitting the cap means something is broken, not "close enough"
    if (!done) throw new IllegalStateException(
      s"connected components did not converge in $maxIter rounds")
    val singletons = nodes.toDF("node").distinct()
      .join(edgeNodes, Seq("node"), "left_anti")
      .select(col("node"), col("node").as("component"))
    (labels.select(col("node"), col("label").as("component"))
      .unionByName(singletons), iter)
  }

  /** Components of a BLOCKED pair graph: every edge lies inside one
    * block (a dedup label, an LSH bucket, a tenant) — the caller's
    * contract, typically enforced upstream by a hub guard. Then no
    * component spans blocks, so the global O(log n)-round propagation
    * loop collapses to ONE shuffle: group the edges by block key and
    * run union-find inside the block's own task. Returns
    * (node, component) for edge-incident nodes only (like the loop,
    * singletons are the caller's anti-join — [[run]] unions them in).
    *
    * The in-task state is O(block nodes), which is exactly what the
    * upstream guard bounds; `maxNodes` re-asserts it loudly here so a
    * mis-use without a guard fails instead of OOMing an executor. */
  def runBlocked(edges: DataFrame, keyCol: String, uCol: String,
                 vCol: String, maxNodes: Int = 200000): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    edges.select(col(keyCol).cast("string").as("k"),
                 col(uCol).cast("long"), col(vCol).cast("long"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        // union-find with path compression + union by size; component
        // label = min node id, matching the propagation loop exactly
        val parent = scala.collection.mutable.LongMap.empty[Long]
        val size = scala.collection.mutable.LongMap.empty[Long]
        def find(x0: Long): Long = {
          var x = x0
          while (parent(x) != x) {
            parent(x) = parent(parent(x)); x = parent(x)
          }
          x
        }
        def add(x: Long): Unit =
          if (!parent.contains(x)) {
            parent(x) = x; size(x) = 1L
            if (parent.size > maxNodes) throw new IllegalStateException(
              s"runBlocked: block '$key' exceeds $maxNodes nodes — " +
              "bound the block upstream (hub guard) before clustering")
          }
        it.foreach { case (_, u, v) =>
          add(u); add(v)
          val (ru, rv) = (find(u), find(v))
          if (ru != rv) {
            val (big, small) =
              if (size(ru) >= size(rv)) (ru, rv) else (rv, ru)
            parent(small) = big; size(big) += size(small)
          }
        }
        val minOf = scala.collection.mutable.LongMap.empty[Long]
        parent.keysIterator.foreach { n =>
          val r = find(n)
          minOf(r) = math.min(minOf.getOrElse(r, Long.MaxValue), n)
        }
        parent.keysIterator.map(n => (n, minOf(find(n)))).toArray.iterator
      }
      .toDF("node", "component")
  }
}
