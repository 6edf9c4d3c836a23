package graft

import java.time.LocalDate

import org.apache.spark.sql.DataFrame

import graft.retention.{Retention, RetentionConfig}

/** Pins the reference's retention semantics on hand-computed scenarios
  * (FIXTURES.md §A "representative scenario rows"). */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  val cfg: RetentionConfig = RetentionConfig(asOf = LocalDate.of(2021, 6, 15))

  def personsDf(rows: (Long, String)*): DataFrame =
    rows.toDF("person_id", "household_id")

  def encountersDf(rows: (Long, String)*): DataFrame =
    rows.map { case (p, d) => (p, java.sql.Date.valueOf(d)) }
      .toDF("person_id", "admit_date")

  test("364-day pair is retained; 366-day pair is not") {
    val persons = personsDf(1L -> "A", 2L -> "B")
    val encounters = encountersDf(
      1L -> "2020-01-10", 1L -> "2021-01-08",  // 364 days apart
      2L -> "2020-01-10", 2L -> "2021-01-10")  // 366 days apart
    val ranges = Retention.householdRanges(persons, encounters, cfg)
      .collect()
    val aRetained = ranges.filter(r =>
      r.getAs[String]("household_id") == "A" && r.getAs[Boolean]("retained"))
    assert(aRetained.length == 1)
    assert(aRetained.head.getAs[String]("start_date") == "2021-01-01")
    assert(aRetained.head.getAs[String]("end_date") == "2021-01-31 23:59:59")
    assert(!ranges.exists(r =>
      r.getAs[String]("household_id") == "B" && r.getAs[Boolean]("retained")))
  }

  test("strictly-earlier: same-day encounters never retain") {
    val persons = personsDf(1L -> "A", 2L -> "A")
    val encounters = encountersDf(1L -> "2020-05-10", 2L -> "2020-05-10")
    val ranges = Retention.householdRanges(persons, encounters, cfg).collect()
    assert(!ranges.exists(_.getAs[Boolean]("retained")))
  }

  test("ranges partition the 49-month spine exactly") {
    val persons = personsDf(1L -> "A")
    val encounters = encountersDf(
      1L -> "2019-03-01", 1L -> "2019-03-20", 1L -> "2020-11-05")
    val ranges = Retention.householdRanges(persons, encounters, cfg)
      .orderBy("gte").collect()
    assert(ranges.head.getAs[String]("start_date") == "2017-06-01")
    assert(ranges.last.getAs[String]("end_date") == "2021-06-30 23:59:59")
    // contiguity: each range's lte + 1s == next gte; states alternate
    ranges.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("lte") + 1000L == b.getAs[Long]("gte"))
        assert(a.getAs[Boolean]("retained") != b.getAs[Boolean]("retained"))
      case _ =>
    }
    // 2019-03-20 retained (earlier 2019-03-01 within 365d, distinct day)
    assert(ranges.exists(r => r.getAs[Boolean]("retained") &&
      r.getAs[String]("start_date") == "2019-03-01"))
  }

  test("phase 1 scaffolds encounter-less households (reference `all` CTE)") {
    // Household Z has no encounters at all; the reference's person-built
    // scaffold still covers it, so phase 1 emits ONE not-retained range
    // spanning the whole 49-month spine — phase 2 is not involved.
    val persons = personsDf(1L -> "A", 9L -> "Z")
    val encounters = encountersDf(1L -> "2020-01-01", 1L -> "2020-06-01")
    val z = Retention.fullHistory(persons, encounters, cfg)
      .filter($"person_id" === 9L).collect()
    assert(z.length == 1)
    assert(!z.head.getAs[Boolean]("retained"))
    assert(z.head.getAs[String]("start_date") == "2017-06-01")
    assert(z.head.getAs[String]("end_date") == "2021-06-30 23:59:59")
  }

  test("phase 2 (standalone): encounter-free household gets single [asOf-4y, asOf+10y) range") {
    val persons = personsDf(1L -> "A", 9L -> "Z")
    val encounters = encountersDf(1L -> "2020-01-01", 1L -> "2020-06-01")
    val p2 = Retention.phase2Ranges(persons, encounters, cfg).collect()
    assert(p2.length == 1)
    val r = p2.head
    assert(r.getAs[Long]("person_id") == 9L)
    assert(!r.getAs[Boolean]("retained"))
    assert(r.getAs[String]("start_date") == "2017-06-01")
    assert(r.getAs[String]("end_date") == "2031-06-01 00:00:00")
  }

  test("null household_id persons are excluded everywhere") {
    val persons = Seq((1L, Option("A")), (2L, Option.empty[String]))
      .toDF("person_id", "household_id")
    val encounters = encountersDf(1L -> "2021-01-01", 2L -> "2021-01-02")
    val full = Retention.fullHistory(persons, encounters, cfg)
    assert(full.filter($"person_id" === 2L).isEmpty)
  }

  test("multi-person household fan-out (J7)") {
    val persons = personsDf(1L -> "A", 2L -> "A", 3L -> "A")
    val encounters = encountersDf(1L -> "2021-01-05", 2L -> "2021-01-20")
    val full = Retention.personRanges(persons, encounters, cfg)
    val counts = full.groupBy("person_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set(1L, 2L, 3L))
    assert(counts.values.toSet.size == 1) // identical history per member
  }
}
