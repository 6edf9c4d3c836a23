package graft

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.retention.{HouseholdRetentionNotReadyException, Protocol, Retention, RetentionConfig}
import graft.sources.KeyedUpsert

class UpsertProtocolSpec extends SparkSpec {
  import spark.implicits._

  test("KeyedUpsert replaces updated keys, keeps others, is idempotent") {
    val path = Files.createTempDirectory("upsert").toString + "/t"
    KeyedUpsert.upsert(spark,
      path, Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), "k", 8)
    KeyedUpsert.upsert(spark, path, Seq((2L, "B!"), (4L, "d")).toDF("k", "v"), "k", 8)
    val got = KeyedUpsert.read(spark, path).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "B!", 3L -> "c", 4L -> "d"))
    // idempotent repeat
    KeyedUpsert.upsert(spark, path, Seq((2L, "B!"), (4L, "d")).toDF("k", "v"), "k", 8)
    assert(KeyedUpsert.read(spark, path).count() == 4)
  }

  val cfg: RetentionConfig = RetentionConfig(asOf = LocalDate.of(2021, 6, 15))

  test("Protocol.run writes both phases; re-run over written state is a no-op") {
    val path = Files.createTempDirectory("proto").toString + "/hist"
    val persons = Seq((1L, "A"), (2L, "A"), (9L, "Z")).toDF("person_id", "household_id")
    val encounters = Seq((1L, "2021-01-05"), (2L, "2021-01-20"))
      .map { case (p, d) => (p, java.sql.Date.valueOf(d)) }
      .toDF("person_id", "admit_date")
    val n = Protocol.run(spark, persons, encounters, cfg, path, 8)
    assert(n == 3)
    val hist = KeyedUpsert.read(spark, path)
    assert(hist.count() == 3)
    // person 9 (phase-2) has exactly one not-retained entry
    val h9 = hist.filter($"person_id" === 9L)
      .select(explode($"household_retention_history").as("h")).collect()
    assert(h9.length == 1 && !h9.head.getStruct(0).getAs[Boolean]("retained"))
    // idempotency: feed history back in as the P8 predicate input
    val personsDone = persons.join(
      hist.select($"person_id", $"household_retention_history"),
      Seq("person_id"), "left")
    assert(Protocol.countPersonsWithoutRetention(personsDone) == 0)
    assert(Protocol.run(spark, personsDone, encounters, cfg, path, 8) == 0L)
  }

  test("household probe: sorted top-k pending households with member counts") {
    val persons = Seq((1L, "B"), (2L, "B"), (3L, "A"), (4L, "C"))
      .toDF("person_id", "household_id")
    val got = Protocol.householdsWithoutRetentionProbe(persons, 2)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("A", 1L), ("B", 2L)))
  }

  test("phase-ordering guard throws when phase 1 incomplete") {
    val persons = Seq((1L, "A")).toDF("person_id", "household_id")
    val encounters = Seq((1L, java.sql.Date.valueOf("2021-01-05")),
                         (1L, java.sql.Date.valueOf("2021-02-05")))
      .toDF("person_id", "admit_date")
    intercept[HouseholdRetentionNotReadyException] {
      Protocol.assertPhase1Complete(persons, encounters, cfg)
    }
    // once processed, guard passes
    val done = persons.withColumn("household_retention_history",
      array(struct(lit(0L).as("gte"), lit(1L).as("lte"),
                   lit("").as("start_date"), lit("").as("end_date"),
                   lit(true).as("retained"))))
    Protocol.assertPhase1Complete(done, encounters, cfg)
  }
}
