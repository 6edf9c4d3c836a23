package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketed

/** Bucketed-table contract: co-bucketed joins and bucket-key
  * aggregations must plan WITHOUT a shuffle — the pre-paid-ingest
  * layout that makes repeated 100-TB joins cheap. */
class BucketedSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String = {
    df.count() // let AQE finalize
    df.queryExecution.executedPlan.toString
  }

  test("co-bucketed equi-join plans with zero exchanges") {
    Bucketed.write(Tables.load(spark, dir, "orders"),
      "b_orders", "o_custkey", 8)
    Bucketed.write(Tables.load(spark, dir, "customer"),
      "b_customer", "c_custkey", 8)
    // disable broadcast so the test exercises the co-location path
    val joined = withBroadcastOff {
      val df = Bucketed.read(spark, "b_orders")
        .join(Bucketed.read(spark, "b_customer"),
              col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_custkey", "c_nationkey")
      val p = planOf(df)
      assert(!p.contains("Exchange"),
        "bucketed join must not shuffle:\n" + p)
      df
    }
    // result parity with the plain (shuffling) join
    val expect = Tables.load(spark, dir, "orders")
      .join(Tables.load(spark, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
      .count()
    assert(joined.count() === expect)
  }

  test("bucket-key aggregation reuses the bucket distribution — no exchange") {
    Bucketed.write(Tables.load(spark, dir, "orders"),
      "b_orders_agg", "o_custkey", 8)
    val agg = Bucketed.read(spark, "b_orders_agg")
      .groupBy("o_custkey").agg(count(lit(1)).as("n"))
    val p = planOf(agg)
    assert(!p.contains("Exchange"),
      "bucket-key aggregation must not shuffle:\n" + p)
    assert(agg.agg(sum("n")).as[Long].head() ===
      Tables.load(spark, dir, "orders").count())
  }

  test("mismatched bucket counts fall back to a correct (shuffling) join") {
    Bucketed.write(Tables.load(spark, dir, "orders"),
      "b_orders_12", "o_custkey", 12)
    Bucketed.write(Tables.load(spark, dir, "customer"),
      "b_customer_8b", "c_custkey", 8)
    withBroadcastOff {
      val df = Bucketed.read(spark, "b_orders_12")
        .join(Bucketed.read(spark, "b_customer_8b"),
              col("o_custkey") === col("c_custkey"))
      val expect = Tables.load(spark, dir, "orders")
        .join(Tables.load(spark, dir, "customer"),
              col("o_custkey") === col("c_custkey"))
        .count()
      assert(df.count() === expect)
    }
  }

  private def withBroadcastOff[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
