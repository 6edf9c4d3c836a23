package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic random-walk corpus generation — the walk-sampling
  * stage of DeepWalk/node2vec-style graph-embedding pipelines (walks
  * become "sentences" a sequence model trains on), made reproducible
  * so the cross-engine gate can check it.
  *
  * True random walks draw the next hop uniformly; a training pipeline
  * needs the corpus to be REGENERABLE (resumable shards, audit, the
  * same leak-free-split guarantees as any other training table), so
  * the draw here is a hash: at step t, walk (seed, walk_no) moves to
  * the neighbor minimizing
  *
  *   pri(v) = ( ((seed·31 + walk_no) mod P)·1315423911 mod P
  *             + t·2654435761 mod P
  *             + ((v mod P)·2246822519 mod P) ) mod P,  P = 10⁹+7
  *
  * (pure BIGINT arithmetic both engines evaluate identically — the
  * [[graft.QueryHelpers.sampleSlot]] convention; ties broken toward
  * the smaller neighbor id). Distinct (seed, walk_no, t) triples give
  * independent-looking draws; the walk still never leaves the graph
  * (every hop is a real edge) and hub neighbors are picked ∝ nothing —
  * each neighbor equally likely across hash space, the uniform
  * DeepWalk kernel. Magnitude bound: every product is capped by the
  * interleaved `mod P` at (P−1)·2246822519 ≈ 2.2·10¹⁸ < 2⁶³, so the
  * arithmetic is overflow-free for ids up to ~3·10¹⁷ (the seed·31
  * term) — DuckDB errors on BIGINT overflow where the JVM wraps, so
  * the oracle keeps the bound enforced.
  *
  * Scale shape (per step): one equi-join of the frontier (|seeds| ×
  * `walksPerSeed` rows) onto the symmetrized adjacency — shuffle
  * keyed on the current node — then a map-side-combinable
  * `min(struct(pri, v))` argmin per walk. No sort, no window, no
  * driver action; the frontier is pinned per step with
  * [[LoopCheckpoint]]. Work per step is Σ degree(frontier), the same
  * cost as one BFS round over the frontier.
  *
  * Input contract: canonical (u < v) undirected edges with integral
  * ids, each edge once (the `coEdgesFor` shape) — enforced by
  * [[EdgeContract.canonical]] (loud map-side failure on reversed or
  * self-loop rows; a violated contract would bias every step's
  * neighbor argmin).
  */
object RandomWalk {

  /** `walksPerSeed` walks of `steps` hops from every seed node.
    * Returns (seed, walk_no, step, node) — step 0 is the seed itself;
    * one row per visited position, the walk-corpus layout a
    * sequence-model tokenizer consumes. */
  def deterministicWalks(edges: DataFrame, uCol: String, vCol: String,
                         seeds: DataFrame, seedCol: String,
                         walksPerSeed: Int, steps: Int): DataFrame = {
    require(walksPerSeed >= 1 && steps >= 1,
      s"need walksPerSeed >= 1 and steps >= 1, got $walksPerSeed/$steps")
    val e = EdgeContract.canonical(edges, uCol, vCol, "RandomWalk")
    val sym = LoopCheckpoint(
      e.unionByName(e.select(col("v").as("u"), col("u").as("v"))))
    var cur = seeds
      .select(col(seedCol).cast("long").as("seed"))
      .distinct() // a duplicated seed would double step-0 rows while
                  // later steps' per-walk argmin collapses to one —
                  // inconsistent multiplicity no consumer expects
      .crossJoin(broadcast( // walksPerSeed rows by construction
        seeds.sparkSession.range(walksPerSeed).select(
          col("id").cast("long").as("walk_no"))))
      .withColumn("node", col("seed"))
    var all = cur.withColumn("step", lit(0L))
    for (t <- 1 to steps) {
      val next = cur
        .join(sym.withColumnRenamed("u", "node"), "node")
        .withColumn("pri", expr(
          s"(((seed * 31 + walk_no) % 1000000007) * 1315423911" +
          s" % 1000000007 + $t * 2654435761 % 1000000007" +
          " + ((v % 1000000007) * 2246822519) % 1000000007)" +
          " % 1000000007"))
        .groupBy("seed", "walk_no")
        .agg(min(struct(col("pri"), col("v"))).as("m"))
        .select(col("seed"), col("walk_no"), col("m.v").as("node"))
      cur = LoopCheckpoint(next)
      all = all.unionByName(cur.withColumn("step", lit(t.toLong)))
    }
    all.select("seed", "walk_no", "step", "node")
  }

  /** Skip-gram co-visit pairs from a walk corpus — the step that
    * turns walks into embedding-model training pairs (DeepWalk §4.2:
    * every node pair within `window` positions of each other inside
    * one walk is a (center, context) example). Pairs are canonical
    * (u ≤ v, both orientations of a co-visit collapse to one row)
    * with their corpus-wide count — the weighted-pair table an SGNS
    * or matrix-factorization trainer consumes.
    *
    * Scale shape: a self-join keyed on (seed, walk_no) — each walk
    * holds ≤ steps+1 rows, so the per-key pair volume is bounded by
    * (steps+1)·window regardless of corpus size — then one
    * map-side-combinable count. */
  def skipGramPairs(walks: DataFrame, window: Int): DataFrame = {
    require(window >= 1, s"need window >= 1, got $window")
    val a = walks.select(col("seed"), col("walk_no"),
      col("step").as("step_a"), col("node").as("node_a"))
    val b = walks.select(col("seed"), col("walk_no"),
      col("step").as("step_b"), col("node").as("node_b"))
    a.join(b, Seq("seed", "walk_no"))
      .filter(col("step_b") > col("step_a") &&
              col("step_b") <= col("step_a") + window)
      .select(least(col("node_a"), col("node_b")).as("u"),
              greatest(col("node_a"), col("node_b")).as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("n_covisits"))
  }
}
