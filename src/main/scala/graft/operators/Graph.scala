package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Co-occurrence edge derivation: "items sharing a basket" → weighted
  * undirected edges (u < v), the input graph for [[Triangles]],
  * [[Bfs]], [[KCore]], link prediction and market-basket analysis.
  *
  * Shape: ONE shuffle groups each basket's distinct items into a
  * sorted array (`collect_set` dedupes inside the aggregation buffer —
  * no separate distinct pass), then — round-12, the q_kcore edge-stage
  * lever, every variant measured at sf10 on identical input —
  *
  *   - INTEGRAL items in [0, 2³¹): pairs explode map-side as ONE
  *     PACKED BIGINT per pair (u·2³² + v — the sorted array gives
  *     u < v for free), and one more shuffle counts packed keys. The
  *     previous `named_struct` HOF emission paid interpreted
  *     per-element struct allocation on every one of the Σ C(b,2)
  *     pairs — 134.1 s vs 28.5 s at sf10 (min-of-2, 357k edges
  *     identical). Range outside [0, 2³¹) fails loudly (O(1) check on
  *     the sorted array's ends) pointing at [[weightedGeneric]].
  *   - STRING items: pairs explode map-side as ONE separator-joined
  *     string per pair (round-14 — the q_assoc_rules sf100 lever: the
  *     posting self-join this replaces sort-merged two corpus-sized
  *     posting sides per execution, and that sort spilled at decade 3;
  *     a NUL-joined concat is a single UTF8 byte-copy per pair, no
  *     join, no sort, and the pair count aggregation collapses to the
  *     distinct-pair domain map-side). Items containing U+0000 fail
  *     loudly (the separator would be ambiguous) pointing at
  *     [[weightedGeneric]].
  *   - any other item type: [[weightedGeneric]] — postings re-derived
  *     map-side from the SAME basket-keyed exchange (explode of the
  *     aggregated sets, so the self-join on `basket` reuses the
  *     existing hash partitioning: zero extra shuffles) and pair
  *     counts aggregated off the join. 32.0 s vs 134.1 s at sf10.
  *
  * Either way the only data-dependent blow-up is the per-basket pair
  * count, which the basket-size bound caps — the property that
  * survives 100 TB.
  */
object CoOccurrence {

  private val Pack = 4294967296L // 2^32
  private val MaxItem = 2147483647L // 2^31 - 1

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
  private[operators] def guarded(sets: DataFrame, maxBasket: Int): DataFrame =
    sets.withColumn("items",
      when(size(col("items")) > maxBasket,
        expr(s"raise_error(concat('CoOccurrence: basket ', basket, " +
             s"' has ', size(items), ' items (max $maxBasket); " +
             "bound or pre-filter hub baskets'))"))
        .otherwise(col("items")))

  /** Weighted edges (u, v, w) with u < v; w = number of shared
    * baskets. Fails loudly on any basket above `maxBasket` items
    * (see [[guarded]]) and — on the packed integral path — on any
    * item outside [0, 2³¹) (use [[weightedGeneric]] for full-range or
    * non-numeric ids). Output u/v keep the input item type. */
  def weighted(items: DataFrame, basketCol: String,
               itemCol: String, maxBasket: Int = 100000): DataFrame = {
    import org.apache.spark.sql.types._
    val itemType = items.schema(itemCol).dataType
    val joinPath = itemType match {
      case ByteType | ShortType | IntegerType | LongType | StringType => false
      case _ => true
    }
    if (joinPath) weightedGeneric(items, basketCol, itemCol, maxBasket)
    else pairCountsFromSets(guarded(sets(items, basketCol, itemCol), maxBasket))
  }

  /** Unordered in-basket pair counts `(u, v, w)` with `u < v`, emitted
    * MAP-SIDE off already-aggregated sorted sets (the [[sets]] shape:
    * `basket`, `items`) — the no-join, no-sort pair stage both
    * [[weighted]] and [[MarketBasket]] run. The emission encodes each
    * pair as ONE flat value so the per-pair cost inside the
    * (interpreted) higher-order transform is a primitive op, never a
    * struct allocation, and the following count aggregation collapses
    * to the distinct-pair domain before its exchange:
    *
    *   - integral items: packed BIGINT `u·2³² | v` (bitwise — no ANSI
    *     overflow checks in the hot path); ids outside [0, 2³¹) fail
    *     loudly via an O(1) check on the sorted array's ends;
    *   - string items: `concat(u, NUL, v)` — one UTF8 byte-copy per
    *     pair; items containing U+0000 fail loudly (ambiguous split).
    *
    * Output `u`/`v` keep the element type. */
  def pairCountsFromSets(s: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val elemType = s.schema("items").dataType
      .asInstanceOf[ArrayType].elementType
    elemType match {
      case ByteType | ShortType | IntegerType | LongType =>
        val g = s.withColumn("items",
          // O(1) range guard on the SORTED array's two ends — outside
          // [0, 2^31) the packed key would collide/overflow silently,
          // exactly the class of corruption that must fail loudly
          when(element_at(col("items"), 1) < 0L ||
               element_at(col("items"), -1) > MaxItem,
            expr("raise_error(concat('CoOccurrence: item ids in " +
              "basket ', basket, ' outside [0, 2^31) — the packed-pair " +
              "path cannot represent them; use weightedGeneric'))"))
            .otherwise(col("items")))
        g.select(explode(expr(
            s"flatten(transform(items, (x, i) -> " +
            s"transform(slice(items, i + 2, size(items)), " +
            s"y -> shiftleft(bigint(x), 32) | bigint(y))))")).as("p"))
          .groupBy("p").agg(count(lit(1)).as("w"))
          .select(expr("shiftright(p, 32)").cast(elemType).as("u"),
                  expr(s"p & ${Pack - 1}").cast(elemType).as("v"), col("w"))
      case StringType =>
        val Sep = "\u0000"
        val g = s.withColumn("items",
          when(exists(col("items"), x => instr(x, Sep) > 0),
            expr("raise_error(concat('CoOccurrence: an item string in " +
              "basket ', basket, ' contains U+0000 — the concat pair " +
              "path cannot separate it; use weightedGeneric'))"))
            .otherwise(col("items")))
        g.select(explode(flatten(transform(col("items"), (x, i) =>
            transform(slice(col("items"), i + lit(2), size(col("items"))),
              y => concat(x, lit(Sep), y))))).as("p"))
          .groupBy("p").agg(count(lit(1)).as("w"))
          .select(substring_index(col("p"), Sep, 1).as("u"),
                  substring_index(col("p"), Sep, -1).as("v"), col("w"))
      case _ =>
        // non-flat-encodable element type: posting self-join off the
        // sets (the basket-keyed exchange is already behind us)
        val posting = s.select(col("basket"), explode(col("items")).as("item"))
        posting.as("a").join(posting.as("b"),
            col("a.basket") === col("b.basket") &&
              col("a.item") < col("b.item"))
          .groupBy(col("a.item").as("u"), col("b.item").as("v"))
          .agg(count(lit(1)).as("w"))
    }
  }

  /** [[weighted]] for arbitrary item types (strings, negative or full-
    * range 64-bit ids): postings exploded map-side from the aggregated
    * sets — the self-join on `basket` reuses the sets aggregation's
    * hash partitioning, so this costs the SAME two exchanges as the
    * packed path, only with row-pair join machinery in between. */
  def weightedGeneric(items: DataFrame, basketCol: String,
                      itemCol: String, maxBasket: Int = 100000): DataFrame = {
    val posting = guarded(sets(items, basketCol, itemCol), maxBasket)
      .select(col("basket"), explode(col("items")).as("item"))
    posting.as("a").join(posting.as("b"),
        col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("u"), col("b.item").as("v"))
      .agg(count(lit(1)).as("w"))
  }

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
