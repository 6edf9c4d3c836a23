package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GlobalOrder

/** Differential contracts for the distributed global-order operator:
  * every numbering must equal the single-partition window's value on
  * randomized data (ties, desc order, uneven ntile remainders), and
  * the executed plan must contain NO SinglePartition exchange over the
  * data — the scale-killer the operator exists to remove. */
class GlobalOrderSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(n: Int, seed: Long) = {
    val r = new scala.util.Random(seed)
    // duplicate-heavy value domain so ties cross range boundaries
    (0 until n).map(i => (i.toLong, r.nextInt(40).toLong))
      .toDF("k", "v").repartition(7)
  }

  test("withRowNumber matches the global window under a total tiebreak") {
    val df = fixture(5000, 1)
    val got = GlobalOrder.withRowNumber(df, Seq(col("v"), col("k")), "rn", 8)
      .select("k", "rn").as[(Long, Long)].collect().toMap
    val want = df.withColumn("rn",
        row_number().over(Window.orderBy(col("v"), col("k"))).cast("long"))
      .select("k", "rn").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("withRank matches global rank gaps on tie-heavy data, desc order") {
    val df = fixture(3000, 2)
    val got = GlobalOrder.withRank(df, Seq(col("v").desc), "rk", 8)
      .select("k", "rk").as[(Long, Long)].collect().toMap
    val want = df.withColumn("rk",
        rank().over(Window.orderBy(col("v").desc)).cast("long"))
      .select("k", "rk").as[(Long, Long)].collect().toMap
    assert(got == want)
    assert(got.values.toSet.size < 45, "fixture must actually have ties")
  }

  test("withNtile matches NTILE for every remainder class") {
    for (n <- Seq(1, 4, 7, 64); rows <- Seq(3, 64, 257)) {
      val df = fixture(rows, n * 1000L + rows)
      val got = GlobalOrder.withNtile(df, n, Seq(col("v"), col("k")), "t", 5)
        .select("k", "t").as[(Long, Long)].collect().toMap
      val want = df.withColumn("t",
          ntile(n).over(Window.orderBy(col("v"), col("k"))).cast("long"))
        .select("k", "t").as[(Long, Long)].collect().toMap
      assert(got == want, s"ntile($n) over $rows rows")
    }
  }

  test("withRunningSum matches the global cumulative window") {
    val df = fixture(4000, 3)
    val got = GlobalOrder.withRunningSum(
        df, Seq(col("v"), col("k")), col("v") * 3 + 1, "cum", 8)
      .select("k", "cum").as[(Long, Long)].collect().toMap
    val want = df.withColumn("cum",
        sum(col("v") * 3 + 1).over(Window.orderBy(col("v"), col("k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "cum").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("withRunningSums: N sums in one pass equal N chained windows") {
    val df = fixture(4000, 3)
    val got = GlobalOrder.withRunningSums(
        df, Seq(col("v"), col("k")),
        Seq((col("v") * 3 + 1, "c1"), (lit(1L), "c2"),
            (when(col("v") % 2 === 0, col("v")).otherwise(lit(0L)), "c3")), 8)
      .select("k", "c1", "c2", "c3").as[(Long, Long, Long, Long)]
      .collect().map { case (k, a, b, c) => k -> (a, b, c) }.toMap
    val w = Window.orderBy(col("v"), col("k"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("c1", sum(col("v") * 3 + 1).over(w))
      .withColumn("c2", sum(lit(1L)).over(w))
      .withColumn("c3",
        sum(when(col("v") % 2 === 0, col("v")).otherwise(lit(0L))).over(w))
      .select("k", "c1", "c2", "c3").as[(Long, Long, Long, Long)]
      .collect().map { case (k, a, b, c) => k -> (a, b, c) }.toMap
    assert(got == want)
  }

  test("no SinglePartition exchange in the data path") {
    val df = fixture(2000, 4)
    val out = GlobalOrder.withRowNumber(df, Seq(col("v"), col("k")), "rn", 8)
    out.count() // execute so AQE finalizes
    val plan = out.queryExecution.executedPlan.toString
    // the P-row offset table may legitimately single-partition; the
    // DATA window must not — assert no window node sits above a
    // SinglePartition exchange by checking the only single-partition
    // exchanges feed broadcast (offset) subtrees
    val windowOnSingle = "Exchange SinglePartition".r
      .findAllMatchIn(plan).size
    val broadcasts = "BroadcastExchange".r.findAllMatchIn(plan).size
    assert(windowOnSingle <= broadcasts,
      s"data-path SinglePartition exchange present:\n$plan")
    // and the baseline global window DOES trip the detector
    val bad = df.withColumn("rn",
      row_number().over(Window.orderBy(col("v"), col("k"))))
    bad.count()
    assert(bad.queryExecution.executedPlan.toString
      .contains("Exchange SinglePartition"),
      "positive control: global window must show SinglePartition")
  }

  // grouped fixture: FEW groups (the case the grouped variants exist
  // for), tie-heavy values, groups interleaved so every group spans
  // many range partitions
  private def grouped(n: Int, seed: Long) = {
    val r = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, s"g${r.nextInt(3)}", r.nextInt(40).toLong)
    }.toDF("k", "g", "v").repartition(7)
  }

  test("withGroupedRank matches the grouped window on tie-heavy data") {
    val df = grouped(5000, 6)
    val got = GlobalOrder.withGroupedRank(
        df, Seq("g"), Seq(col("v")), "rk", 8)
      .select("k", "rk").as[(Long, Long)].collect().toMap
    val want = df.withColumn("rk",
        rank().over(Window.partitionBy("g").orderBy(col("v"))).cast("long"))
      .select("k", "rk").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("withGroupedRowNumber matches under a total in-group tiebreak") {
    val df = grouped(4000, 7)
    val got = GlobalOrder.withGroupedRowNumber(
        df, Seq("g"), Seq(col("v").desc, col("k")), "rn", 8)
      .select("k", "rn").as[(Long, Long)].collect().toMap
    val want = df.withColumn("rn",
        row_number().over(Window.partitionBy("g")
          .orderBy(col("v").desc, col("k"))).cast("long"))
      .select("k", "rn").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("withGroupedRunningSum matches the grouped cumulative window") {
    val df = grouped(4000, 8)
    val got = GlobalOrder.withGroupedRunningSum(
        df, Seq("g"), Seq(col("v"), col("k")), col("v") * 3 + 1, "cum", 8)
      .select("k", "cum").as[(Long, Long)].collect().toMap
    val want = df.withColumn("cum",
        sum(col("v") * 3 + 1).over(Window.partitionBy("g")
          .orderBy(col("v"), col("k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("k", "cum").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("grouped variants handle a single-group and a one-row group") {
    val df = Seq((1L, "a", 5L), (2L, "a", 5L), (3L, "a", 1L), (4L, "b", 9L))
      .toDF("k", "g", "v").repartition(3)
    val rk = GlobalOrder.withGroupedRank(df, Seq("g"), Seq(col("v")), "rk", 4)
      .select("k", "rk").as[(Long, Long)].collect().toMap
    assert(rk == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("empty input yields empty output for every numbering") {
    val df = fixture(100, 5).filter(col("v") < -1)
    assert(GlobalOrder.withRowNumber(df, Seq(col("k")), "rn").count() == 0)
    assert(GlobalOrder.withNtile(df, 4, Seq(col("k")), "t").count() == 0)
    assert(GlobalOrder.withRunningSum(df, Seq(col("k")), col("v"), "c")
      .count() == 0)
  }
}
