package graft

import org.apache.spark.sql.functions._
import graft.sources.DatePartitioned

/** Date-partitioned layout contract: dynamic overwrite touches only
  * the partitions in the incoming frame, and day filters prune to
  * directory scans. */
class DatePartitionedSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("datepart").toString

  test("dynamic overwrite rewrites only the delivered day") {
    val path = tmp()
    val day1 = Seq((1L, "2026-01-01", 10L), (2L, "2026-01-01", 20L),
                   (3L, "2026-01-02", 30L))
      .toDF("id", "day", "v")
    DatePartitioned.write(day1, path, "day")
    // re-deliver ONLY day 2 with corrected values
    val redelivery = Seq((3L, "2026-01-02", 99L), (4L, "2026-01-02", 40L))
      .toDF("id", "day", "v")
    DatePartitioned.write(redelivery, path, "day")
    val got = DatePartitioned.read(spark, path)
      .select("id", "v").as[(Long, Long)].collect().toMap
    // day 1 rows intact; day 2 replaced wholesale
    assert(got === Map(1L -> 10L, 2L -> 20L, 3L -> 99L, 4L -> 40L))
  }

  test("static overwrite would have dropped the other day (contract contrast)") {
    val path = tmp()
    DatePartitioned.write(
      Seq((1L, "2026-01-01", 10L), (2L, "2026-01-02", 20L))
        .toDF("id", "day", "v"), path, "day")
    DatePartitioned.write(
      Seq((3L, "2026-01-02", 30L)).toDF("id", "day", "v"),
      path, "day", dynamic = false)
    assert(DatePartitioned.read(spark, path)
      .select("id").as[Long].collect().toSet === Set(3L))
  }

  test("a day filter becomes a partition prune, not a data scan") {
    val path = tmp()
    DatePartitioned.write(
      (1 to 100).map(i => (i.toLong, s"2026-01-${"%02d".format(i % 5 + 1)}",
                           i.toLong)).toDF("id", "day", "v"),
      path, "day")
    val q = DatePartitioned.read(spark, path).filter(col("day") === "2026-01-03")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters") &&
           p.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(day"),
      "day filter must prune partitions:\n" + p)
    assert(q.count() === 20)
  }
}
