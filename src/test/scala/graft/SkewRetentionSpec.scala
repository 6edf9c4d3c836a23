package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.retention.{Retention, RetentionConfig}

/** The retention DAG's skew story, asserted instead of argued: with
  * one household owning a large share of all encounters (the
  * SPARK_GRAFT_HOT_HH_PCT fixture shape), AQE must mark and SPLIT the
  * skewed person⋈encounter join partition, and the split must not
  * change the result. docs/DEPLOY.md leans on this behavior for the
  * 100-TB flagship; ScaleOpsSpec pins it for a generic join — this
  * spec pins it for the retention pipeline itself. */
class SkewRetentionSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = RetentionConfig(asOf = LocalDate.of(2021, 6, 15),
    windowMonths = 12, lookbackDays = 45, scanYears = 3)

  // persons 1..200 (households id div 2); person 2 is the hot member:
  // ~60% of all encounters, every other person ~2
  private lazy val persons = (1L to 200L).map(p => (p, p / 2))
    .toDF("person_id", "household_id")
  private lazy val encounters = {
    val cold = (1L to 200L).flatMap(p => Seq(
      (p, java.sql.Date.valueOf(LocalDate.of(2020, 1, 1)
        .plusDays((p % 300).toInt.toLong))),
      (p, java.sql.Date.valueOf(LocalDate.of(2020, 6, 1)
        .plusDays((p % 200).toInt.toLong)))))
    val hot = (0 until 600).map(i =>
      (2L, java.sql.Date.valueOf(LocalDate.of(2020, 1, 1)
        .plusDays((i % 500).toLong))))
    (cold ++ hot).toDF("person_id", "admit_date")
  }

  test("AQE splits the hot-household retention join; result unchanged") {
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.get(k)).toMap
    def history() = Retention.fullHistory(persons, encounters, cfg)
    // baseline result under default planning
    val expected = history().collect().toSet

    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val h = history()
      // materialize THIS QueryExecution so the inspected AQE plan is
      // the final re-optimized one (the ScaleOpsSpec pattern)
      val got = h.collect().toSet
      val plan = h.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "skew split did not fire on the hot household:\n" + plan.take(3000))
      assert(got == expected, "skew split changed the retention result")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
