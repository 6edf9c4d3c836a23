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

  test("KeyedUpsert rolls an interrupted swap back to the pre-upsert state") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("upsert_crash").toString
    val path = dir + "/t"
    KeyedUpsert.upsert(spark,
      path, Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), "k", 4)
    val before = KeyedUpsert.read(spark, path).as[(Long, String)].collect().toMap
    // Simulate a crash mid-swap: a live bucket was moved to backup (the
    // manifest names it) but its staged replacement was never moved in.
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val buckets = fs.listStatus(new Path(path)).map(_.getPath)
      .filter(_.getName.startsWith(KeyedUpsert.BucketCol + "="))
    val victim = buckets.head
    val backup = new Path(dir, "t_graft_backup")
    val stage = new Path(dir, "t_graft_stage")
    fs.mkdirs(backup)
    fs.mkdirs(new Path(stage, victim.getName))
    val out = fs.create(new Path(backup, "_MANIFEST"), true)
    out.write(victim.getName.getBytes("UTF-8")); out.close()
    assert(fs.rename(victim, new Path(backup, victim.getName)))
    // read() must recover the original table exactly
    val after = KeyedUpsert.read(spark, path).as[(Long, String)].collect().toMap
    assert(after == before)
    assert(!fs.exists(backup) && !fs.exists(stage))
    // and a subsequent upsert over recovered state works normally
    KeyedUpsert.upsert(spark, path, Seq((3L, "C!")).toDF("k", "v"), "k", 4)
    assert(KeyedUpsert.read(spark, path).as[(Long, String)].collect().toMap ==
      before.updated(3L, "C!"))
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

  test("RetentionJob: args-configured end-to-end run, reference output schema") {
    import org.apache.spark.sql.types.{ArrayType, StructType}
    import graft.retention.RetentionJob
    val sink = Files.createTempDirectory("job").toString + "/sink"
    val n = RetentionJob.run(spark, RetentionJob.JobConfig(
      "ALL", "/root/testdata/sf0.001", sink, 100))
    assert(n > 0)
    val hist = KeyedUpsert.read(spark, sink)
    assert(hist.count() == n)
    // the reference's exact nested shape (case classes :264-276)
    val elem = hist.schema("household_retention_history").dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    assert(elem.fieldNames.toSeq == Seq("date_range", "date_range_alt", "retained"))
    assert(elem("date_range").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("gte", "lte"))
    assert(elem("date_range_alt").dataType.asInstanceOf[StructType]
      .fieldNames.toSeq == Seq("gte", "lte"))
    // tenant-scoped variant writes a subset
    val sink2 = Files.createTempDirectory("job2").toString + "/sink"
    val n2 = RetentionJob.run(spark, RetentionJob.JobConfig(
      "BUILDING", "/root/testdata/sf0.001", sink2, 100))
    assert(n2 > 0 && n2 < n)
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
