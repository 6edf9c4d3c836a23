package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Co-occurrence edge derivation: "items sharing a basket" → weighted
  * undirected edges (u < v), the input graph for [[Triangles]],
  * [[Bfs]], [[KCore]], link prediction and market-basket analysis.
  *
  * Shape: ONE shuffle groups each basket's distinct items into a
  * sorted array (`collect_set` dedupes inside the aggregation buffer —
  * no separate distinct pass), pairs explode map-side via array HOFs
  * (C(b,2) per basket, bounded when baskets are bounded), and one more
  * shuffle counts pairs. The alternative — distinct + self equi-join
  * on the basket key — costs a third shuffle and a join for the same
  * rows; this form is strictly cheaper and is the one that survives
  * 100 TB, because the only data-dependent blow-up is the per-basket
  * pair count, which the basket-size bound caps.
  */
object CoOccurrence {

  /** C(b,2) blow-up guard: the operator's scale contract is BOUNDED
    * baskets, and silently exploding a hub basket (a token shared by
    * a million documents, a user in every session) into 5·10¹¹ pairs
    * is exactly the failure mode that kills a 100-TB run hours in.
    * The check rides the existing pass as a codegen'd conditional —
    * `raise_error` only evaluates on violation, so there is no extra
    * job and no cost on the happy path. Callers with genuinely hub-
    * heavy domains should threshold upstream (df caps, stopgrams) —
    * that is a semantic decision the operator must not make silently.
    */
  private def guarded(sets: DataFrame, maxBasket: Int): DataFrame =
    sets.withColumn("items",
      when(size(col("items")) > maxBasket,
        expr(s"raise_error(concat('CoOccurrence: basket ', basket, " +
             s"' has ', size(items), ' items (max $maxBasket); " +
             "bound or pre-filter hub baskets'))"))
        .otherwise(col("items")))

  /** Weighted edges (u, v, w) with u < v; w = number of shared
    * baskets. Fails loudly on any basket above `maxBasket` items
    * (see [[guarded]]). */
  def weighted(items: DataFrame, basketCol: String,
               itemCol: String, maxBasket: Int = 100000): DataFrame =
    guarded(sets(items, basketCol, itemCol), maxBasket)
      .select(explode(expr(
        "flatten(transform(items, (x, i) -> " +
        "transform(slice(items, i + 2, size(items)), " +
        "y -> named_struct('u', x, 'v', y))))")).as("p"))
      .groupBy(col("p.u").as("u"), col("p.v").as("v"))
      .agg(count(lit(1)).as("w"))

  /** Edges (u, v) with u < v appearing in ≥ `minCount` baskets. */
  def edges(items: DataFrame, basketCol: String,
            itemCol: String, minCount: Long): DataFrame =
    weighted(items, basketCol, itemCol)
      .filter(col("w") >= minCount)
      .select("u", "v")

  /** One row per basket with its sorted distinct item array. */
  def sets(items: DataFrame, basketCol: String,
           itemCol: String): DataFrame =
    items.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .filter(col("basket").isNotNull && col("item").isNotNull)
      .groupBy("basket").agg(array_sort(collect_set(col("item"))).as("items"))
}

/** Triangle counting over an undirected graph — the standard graph
  * health/community statistic (clustering coefficient numerator), and
  * a building block for motif-based near-dup analysis on candidate
  * graphs. Beyond the reference (which has no graph ops); sits beside
  * [[PageRank]] and [[ConnectedComponents]] in the graph family.
  *
  * Algorithm: degree-ordered wedge join (the MapReduce-classic of
  * Suri & Vassilvitskii, "Counting Triangles and the Curse of the
  * Last Reducer", WWW'11). Orient every edge from the lower-ranked
  * endpoint to the higher-ranked one, rank = (degree, id); then each
  * triangle is counted exactly once, and — the scale point — wedges
  * are generated at their LOWEST-degree vertex, so a hub with degree d
  * produces O(d) oriented out-edges instead of O(d²) wedges. Both
  * steps are plain equi-joins: wedge generation self-joins oriented
  * edges on the source, closure checks wedge endpoints against the
  * oriented edge set. No iteration, three shuffles total regardless
  * of graph size.
  */
object Triangles {

  /** Canonicalized edge set (u < v), per-node degree table, and the
    * triangle list (a, b1, b2) — shared by [[count]] and
    * [[clusteringCoefficient]]. */
  private def core(edges: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val e = edges.toDF("u", "v").filter(col("u") =!= col("v"))
    val canon = e.select(least(col("u"), col("v")).as("u"),
                         greatest(col("u"), col("v")).as("v")).distinct()
    val deg = canon.select(col("u").as("node"))
      .union(canon.select(col("v").as("node")))
      .groupBy("node").agg(org.apache.spark.sql.functions.count(lit(1)).as("deg"))
    // total order: lexicographic (deg, node) — ties broken by id so
    // orientation is acyclic (a DAG), which is what makes each
    // triangle appear once. Compared as tuples directly: a global
    // row_number() rank would serialize all nodes through ONE window
    // partition, the exact bottleneck this operator exists to avoid.
    val oriented = canon
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("a"),
        when(col("du") < col("dv") ||
             (col("du") === col("dv") && col("u") < col("v")),
          col("v")).otherwise(col("u")).as("b"))
    // wedges at the lowest-ranked vertex; the id-order guard b1 < b2
    // emits each unordered endpoint pair once, in exactly the
    // id-canonical (u < v) form the edge set already has — so triangle
    // closure is a semi-join straight against `canon`
    val o1 = oriented.select(col("a"), col("b").as("b1"))
    val o2 = oriented.select(col("a"), col("b").as("b2"))
    val wedges = o1.join(o2, "a").filter(col("b1") < col("b2"))
    val tri = wedges.join(
      canon.select(col("u").as("b1"), col("v").as("b2")),
      Seq("b1", "b2"), "left_semi")
    (canon, deg, tri)
  }

  /** `edges`: two numeric columns, undirected (duplicates/self-loops/
    * either orientation tolerated). Returns one row:
    * (n_nodes, n_edges, n_triangles) over the canonicalized graph.
    */
  def count(edges: DataFrame): DataFrame = {
    val (canon, deg, tri) = core(edges)
    deg.agg(org.apache.spark.sql.functions.count(lit(1)).as("n_nodes"))
      .crossJoin(canon.agg(org.apache.spark.sql.functions.count(lit(1)).as("n_edges")))
      .crossJoin(tri.agg(org.apache.spark.sql.functions.count(lit(1)).as("n_triangles")))
  }

  /** Per-node triangle participation and local clustering coefficient
    * (integer parts-per-million: 10⁶ · 2·t / (deg·(deg−1)), the
    * float-free form a SQL oracle reproduces exactly). Every triangle
    * (a, b1, b2) credits all three corners — one explode of the
    * triangle list, one count keyed by node. Degree-1 nodes have no
    * possible wedge: coeff is 0 by convention.
    */
  def clusteringCoefficient(edges: DataFrame): DataFrame = {
    val (_, deg, tri) = core(edges)
    val corners = tri.select(explode(array(col("a"), col("b1"), col("b2")))
      .as("node"))
    val triPerNode = corners.groupBy("node")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_tri"))
    deg.join(triPerNode, Seq("node"), "left")
      .withColumn("n_tri", coalesce(col("n_tri"), lit(0L)))
      .select(col("node"), col("deg"), col("n_tri"),
        when(col("deg") < 2, lit(0L)).otherwise(
          expr("n_tri * 2000000 div (deg * (deg - 1))")).as("coeff_ppm"))
  }
}
