package graft

import java.time.LocalDate

import scala.util.Random

import graft.retention.{Retention, RetentionConfig}

/** Differential test against an independent, driver-side reference
  * model of the retention semantics (plain Scala loops — no Spark, no
  * SQL), on randomized households. Complements the DuckDB oracle: the
  * oracle shares the windowed-SQL formulation, this model shares
  * nothing but the spec.
  */
class RetentionPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Spec, implemented naively: for each household — INCLUDING ones
    * with no (in-window) encounters, which the reference's person-built
    * scaffold still covers (`all` CTE,
    * HouseholdRetentionProcessing.scala:517-524) — a month M in the
    * spine is retained iff ∃ distinct admit dates d1 < d2, d2 in M,
    * d1 >= d2 - lookback, both within [asOf-scanYears, asOf]. Ranges
    * collapse consecutive same-state months; an encounter-less
    * household therefore yields one all-spine not-retained range. */
  def referenceRanges(admits: Map[String, Set[LocalDate]], cfg: RetentionConfig)
      : Map[String, Seq[(LocalDate, LocalDate, Boolean)]] = {
    val end = cfg.asOf.withDayOfMonth(1)
    val spine = (0 to cfg.windowMonths).map(i =>
      end.minusMonths((cfg.windowMonths - i).toLong))
    val scanLo = cfg.asOf.minusYears(cfg.scanYears.toLong)
    admits.map { case (hh, datesRaw) =>
      val dates = datesRaw.filter(d => !d.isBefore(scanLo) && !d.isAfter(cfg.asOf))
      val retainedMonths = spine.map { m =>
        val inMonth = dates.filter(d => d.withDayOfMonth(1) == m)
        m -> inMonth.exists(d2 => dates.exists(d1 =>
          d1.isBefore(d2) && !d1.isBefore(d2.minusDays(cfg.lookbackDays.toLong))))
      }
      // collapse runs
      val runs = retainedMonths.foldLeft(List.empty[(LocalDate, LocalDate, Boolean)]) {
        case ((s, e, st) :: tail, (m, mst)) if st == mst => (s, m, st) :: tail
        case (acc, (m, mst)) => (m, m, mst) :: acc
      }.reverse
      hh -> runs
    }
  }

  test("pipeline matches the independent reference model on random data") {
    val rnd = new Random(2026)
    val cfg = RetentionConfig(asOf = LocalDate.of(2021, 6, 15))
    (1 to 5).foreach { caseId =>
      // random households: 0-12 encounters each, spread over ~6 years
      // (some outside the scan window), with duplicate dates
      val admits: Map[String, Set[LocalDate]] = (1 to 25).map { h =>
        val n = rnd.nextInt(13)
        s"h$h" -> (1 to n).map(_ =>
          LocalDate.of(2015 + rnd.nextInt(7), 1 + rnd.nextInt(12),
                       1 + rnd.nextInt(28))).toSet
      }.toMap
      val persons = admits.keys.zipWithIndex
        .map { case (h, i) => (i.toLong, h) }.toSeq.toDF("person_id", "household_id")
      val p2h = persons.as[(Long, String)].collect().toMap.map(_.swap)
      val encounters = admits.toSeq.flatMap { case (h, ds) =>
        ds.toSeq.map(d => (p2h(h), java.sql.Date.valueOf(d)))
      }.toDF("person_id", "admit_date")
      val got = Retention.householdRanges(persons, encounters, cfg)
        .collect()
        .groupBy(_.getAs[String]("household_id"))
        .map { case (h, rows) =>
          h -> rows.sortBy(_.getAs[Long]("gte")).toSeq.map(r =>
            (LocalDate.parse(r.getAs[String]("start_date")),
             LocalDate.parse(r.getAs[String]("end_date").substring(0, 10)),
             r.getAs[Boolean]("retained")))
        }
      val want = referenceRanges(admits, cfg).map { case (h, runs) =>
        // reference end month is first-of-month; pipeline end_date is
        // the month's last second — normalize to first-of-month
        h -> runs.map { case (s, e, st) => (s, e, st) }
      }
      val gotNorm = got.map { case (h, runs) =>
        h -> runs.map { case (s, e, st) => (s, e.withDayOfMonth(1), st) }
      }
      assert(gotNorm == want, s"case $caseId")
    }
  }
}
