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
  * Scale shape: pair generation is a self equi-join on the basket key,
  * so the shuffle is on `basket` and the blow-up per basket is
  * C(items, 2) — bounded when baskets are bounded (orders, sessions,
  * documents-with-tags all are). No all-pairs product ever forms: a
  * basket with b items emits b(b−1)/2 rows, and the support filter
  * runs before the (tiny, item-domain-sized) dimension joins. All
  * rule scores are integer fixed-point (ppm) so a SQL oracle
  * reproduces them bit-for-bit; the score arithmetic runs in
  * DECIMAL(38,0) so counts up to ~1e15 baskets cannot overflow.
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
    val it = items.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .filter(col("basket").isNotNull && col("item").isNotNull)
      .distinct()
    val totals = it.agg(countDistinct(col("basket")).as("n_baskets"))
    val itemCnt = it.groupBy("item").agg(count(lit(1)).as("item_cnt"))
    val pairs = it.as("a").join(it.as("b"),
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
