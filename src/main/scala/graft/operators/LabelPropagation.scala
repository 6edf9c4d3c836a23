package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic synchronous label propagation — community detection
  * over an undirected graph (the near-linear community pass of
  * Raghavan et al. 2007, made reproducible).
  *
  * Classic LPA breaks ties randomly and updates asynchronously; both
  * are nondeterministic, which a cross-engine-verified library cannot
  * ship. This variant pins both choices:
  *
  *   - SYNCHRONOUS rounds: every node adopts the most frequent label
  *     among its neighbors' PREVIOUS-round labels (a fixed number of
  *     rounds, the `q_kmeans`/PageRank recipe — the oracle unrolls
  *     the same rounds);
  *   - ties broken toward the SMALLEST label (the component-min
  *     convention [[ConnectedComponents]] uses).
  *
  * Contrast with [[ConnectedComponents]]: components merge everything
  * reachable; propagation stops where a label stops being the local
  * majority, so dense cores keep their own labels inside one sparse
  * component — the community structure dedup clustering deliberately
  * ignores.
  *
  * Scale shape (per round): one equi-join of the label relation onto
  * the symmetrized edges (shuffle on node id) and two
  * map-side-combinable aggregations — (node, label) counts, then the
  * per-node argmax as `max(struct(cnt, -label))`, which needs NO sort
  * and no per-node window. Work per round is O(|E|) shuffled rows;
  * per-node state after the first aggregate is bounded by the node's
  * DISTINCT neighbor-label count ≤ degree (AQE's skew split handles
  * hub nodes like any aggregation). Labels are pinned per round with
  * [[LoopCheckpoint]] — the lineage-compounding rule every iterative
  * operator here follows.
  *
  * Input contract: `edges` holds each undirected edge ONCE in
  * canonical (u < v) form with integral node ids (the
  * [[graft.operators.CoOccurrence]] / `coEdgesFor` shape); duplicate
  * or bidirectional rows would double-count neighbor votes. The
  * canonical form is ENFORCED by [[EdgeContract.canonical]] — a
  * reversed or self-loop row fails loudly (map-side `raise_error`,
  * zero extra pass) instead of silently skewing votes.
  */
object LabelPropagation {

  def run(edges: DataFrame, uCol: String, vCol: String,
          rounds: Int): DataFrame = {
    require(rounds >= 1, s"need at least one round, got $rounds")
    val e = EdgeContract.canonical(edges, uCol, vCol, "LabelPropagation")
    val sym = LoopCheckpoint(
      e.unionByName(e.select(col("v").as("u"), col("u").as("v"))))
    // init: every edge-incident node is its own label (nodes without
    // edges have no neighbor votes to receive — callers union them
    // back as singletons if the consumer needs totality)
    var labels = sym.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
    val roll = new LoopCheckpoint.Rolling // round r dead once r+1 lands
    for (_ <- 1 to rounds) {
      val votes = sym
        .join(labels.withColumnRenamed("node", "u"), "u")
        .groupBy(col("v").as("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      // argmax with min-label tie-break, sort-free: struct comparison
      // is lexicographic, so max(struct(cnt, -label)) is (max count,
      // then min label) — map-side combinable where a row_number
      // window would sort every node's vote list
      labels = roll.next(
        votes.groupBy("node")
          .agg(max(struct(col("cnt"), (-col("label")).as("neg"))).as("m"))
          .select(col("node"), (-col("m.neg")).as("label")))
    }
    labels
  }
}
