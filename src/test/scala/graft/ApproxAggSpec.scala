package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates — the sketches a 100 TB pipeline reaches for
  * when exact distinct/percentile shuffles are too expensive
  * (HyperLogLog++ and a quantile sketch, both single-pass,
  * partial-aggregable, fixed-size state). No DuckDB oracle: sketch
  * internals are engine-specific, so the contract tested is the error
  * bound against the exact answer. */
class ApproxAggSpec extends SparkSpec {
  import spark.implicits._

  val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct (HLL++) within rsd of exact") {
    val orders = Tables.load(spark, dir, "orders")
    val (approx, exact) = orders
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("a"),
           countDistinct(col("o_custkey")).as("e"))
      .as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
           s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact percentile") {
    val li = Tables.load(spark, dir, "lineitem")
    val row = li.agg(
      expr("approx_percentile(l_extendedprice, array(0.1, 0.5, 0.9), 1000)")
        .as("ap"),
      expr("percentile(l_extendedprice, array(0.1, 0.5, 0.9))").as("ep"),
      min(col("l_extendedprice")), max(col("l_extendedprice"))).head()
    val ap = row.getSeq[Double](0)
    val ep = row.getSeq[Double](1)
    ap.zip(ep).foreach { case (a, e) =>
      assert(math.abs(a - e) / e < 0.05, s"approx=$a exact=$e")
    }
    // monotone and inside the domain
    assert(ap == ap.sorted)
    assert(ap.head >= row.getDouble(2) && ap.last <= row.getDouble(3))
  }

  test("HLL sketches merge across groups like partial aggregation") {
    // sketch-of-union == union-of-sketches is what makes HLL partial-
    // aggregable (map-side combine at scale); check the grouped+summed
    // estimate stays near the global exact count
    val orders = Tables.load(spark, dir, "orders")
    val global = orders.select(countDistinct(col("o_custkey")))
      .as[Long].head()
    val regrouped = orders
      .groupBy(pmod(col("o_orderkey"), lit(16)))
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("d"))
      .agg(max(col("d")))
      .as[Long].head()
    // each shard sees a near-complete custkey set at this SF, so the
    // max per-shard estimate must be ≤ ~global (sanity of merge path)
    assert(regrouped <= (global * 1.05).toLong)
  }
}
