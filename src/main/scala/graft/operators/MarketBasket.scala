package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent item-pair mining and association-rule scoring over keyed
  * baskets — the classic market-basket co-occurrence analysis, and (for
  * an LLM-data pipeline) the primitive behind "which sources / tags /
  * topics co-occur in the same document cluster" diagnostics.
  *
  * Beyond the reference (which has no co-occurrence analytics); sits
  * beside [[Triangles]] / link-prediction in the co-occurrence family.
  *
  * Scale shape: ONE shuffle builds per-basket sorted item sets
  * ([[CoOccurrence.sets]]), materialized once for the three consumers;
  * pairs then explode map-side (C(b, 2) per basket — bounded when
  * baskets are bounded: orders, sessions, documents-with-tags all
  * are). No self-join, no all-pairs product: a basket with b items
  * emits b(b−1)/2 rows, and the support filter runs before the
  * (tiny, item-domain-sized) dimension joins. All rule scores are
  * integer fixed-point (ppm) so a SQL oracle reproduces them
  * bit-for-bit; the score arithmetic runs in DECIMAL(38,0) so counts
  * up to ~1e15 baskets cannot overflow.
  */
object MarketBasket {

  /** Frequent unordered item pairs with support/confidence/lift.
    *
    * `items`: one row per (basket, item) occurrence (duplicates fine —
    * de-duplicated internally). Returns one row per unordered pair
    * `(item_a < item_b)` whose relative support is at least
    * `minSupportPpm` (parts-per-million of all baskets), with:
    *   - `pair_cnt`, `cnt_a`, `cnt_b`: basket counts
    *   - `conf_ab_ppm` = 10⁶·P(b|a), `conf_ba_ppm` = 10⁶·P(a|b)
    *   - `lift_ppm` = 10⁶·P(a,b)/(P(a)·P(b))
    * all floor-divided in decimal, so exactly reproducible.
    */
  def pairRules(items: DataFrame, basketCol: String, itemCol: String,
                minSupportPpm: Long): DataFrame = {
    // one corpus shuffle builds the per-basket sorted item sets; the
    // three consumers (basket count, item counts, pair counts) read
    // the materialized sets, not the source
    val sets = CoOccurrence.sets(items, basketCol, itemCol)
      .localCheckpoint(eager = true)
    CheckpointScope.register(sets) // released with the owning query
    val totals = sets.agg(count(lit(1)).as("n_baskets"))
    val itemCnt = sets.select(explode(col("items")).as("item"))
      .groupBy("item").agg(count(lit(1)).as("item_cnt"))
    // pairs via the posting self-join off the materialized sets
    // (round-12, the CoOccurrence lesson measured at sf10: the struct
    // HOF emission pays an interpreted named_struct allocation per
    // C(b,2) pair — 37.2 s vs the join's 23.1 s on the same input;
    // string items can't take the packed-BIGINT path, so the join
    // form is the generic winner). The sorted-set explode keeps the
    // checkpointed sets' partitioning, and a.item < b.item preserves
    // the canonical item_a < item_b emission
    val posting = sets.select(col("basket"), explode(col("items")).as("item"))
    val pairs = posting.as("a").join(posting.as("b"),
        col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("pair_cnt"))
    pairs
      .crossJoin(broadcast(totals))
      // relative support gate — scale-invariant, applied before the
      // dimension joins so infrequent pairs never reach them
      .filter(col("pair_cnt") * lit(1000000L) >=
              lit(minSupportPpm) * col("n_baskets"))
      .join(itemCnt.select(col("item").as("item_a"), col("item_cnt").as("cnt_a")),
            "item_a")
      .join(itemCnt.select(col("item").as("item_b"), col("item_cnt").as("cnt_b")),
            "item_b")
      .select(col("item_a"), col("item_b"), col("pair_cnt"),
        col("cnt_a"), col("cnt_b"),
        expr("cast(pair_cnt as decimal(38,0)) * 1000000 div cnt_a")
          .as("conf_ab_ppm"),
        expr("cast(pair_cnt as decimal(38,0)) * 1000000 div cnt_b")
          .as("conf_ba_ppm"),
        expr("cast(pair_cnt as decimal(38,0)) * n_baskets * 1000000 " +
             "div (cast(cnt_a as decimal(38,0)) * cnt_b)").as("lift_ppm"))
  }
}
