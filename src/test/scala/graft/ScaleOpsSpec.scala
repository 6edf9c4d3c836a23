package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Scale-toolkit operators: salting correctness and bucketed
  * co-located joins (shuffle elimination verified in the plan). */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSumCount equals plain groupBy aggregation") {
    val df = (1 to 10000).map(i => (if (i % 10 == 0) "hot" else s"k${i % 97}", i.toDouble))
      .toDF("k", "v")
    val plain = df.groupBy("k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("count_v"))
      .as[(String, Double, Long)].collect().toSet
    val salted = Skew.saltedSumCount(df, Seq("k"), "v", 16)
      .as[(String, Double, Long)].collect().toSet
    assert(salted.map(t => (t._1, t._3)) == plain.map(t => (t._1, t._3)))
    // sums: float assoc differs across salt groupings; compare rounded
    val ps = plain.map(t => t._1 -> math.round(t._2)).toMap
    salted.foreach(t => assert(math.round(t._2) == ps(t._1)))
  }

  test("saltedJoin equals plain join") {
    val fact = (1 to 5000).map(i => (i % 7, i)).toDF("k", "x")
    val dim = (0 until 7).map(k => (k, s"d$k")).toDF("k", "name")
    val plain = fact.join(dim, "k").as[(Int, Int, String)].collect().toSet
    val salted = Skew.saltedJoin(fact, dim, "k", 8)
      .select("k", "x", "name").as[(Int, Int, String)].collect().toSet
    assert(salted == plain)
  }

  test("bucketed tables join without a shuffle (co-located SMJ)") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    val dir = "/root/testdata/sf0.001"
    Tables.load(spark, dir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.load(spark, dir, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    // force SMJ so bucketing (not broadcast) is the shuffle-avoider,
    // as it would be when neither side fits in memory at scale
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
        $"o_orderkey" === $"l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      assert(joined.count() ==
        Tables.load(spark, dir, "lineitem").join(
          Tables.load(spark, dir, "orders"),
          $"l_orderkey" === $"o_orderkey").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
