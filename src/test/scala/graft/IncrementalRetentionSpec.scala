package graft

import java.time.LocalDate

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.retention.{HhEncounter, Incremental, Retention, RetentionConfig}

/** Streaming incremental retention vs the batch pipeline: encounters
  * replayed in multiple microbatches must converge to exactly the
  * batch ranges. */
class IncrementalRetentionSpec extends SparkSpec {
  import spark.implicits._

  test("multi-batch streaming updates converge to the batch ranges") {
    val cfg = RetentionConfig(asOf = LocalDate.of(2021, 6, 15),
      windowMonths = 6, lookbackDays = 45, scanYears = 2)
    val rnd = new Random(13)
    val rows = (1 to 60).flatMap { hh =>
      (0 until rnd.nextInt(8)).map { _ =>
        (hh.toLong, java.sql.Date.valueOf(LocalDate.of(2020, 7, 1)
          .plusDays(rnd.nextInt(350).toLong)))
      }
    }
    // two staged files → two microbatches (maxFilesPerTrigger=1), so
    // most households update state across batches
    val dir = java.nio.file.Files.createTempDirectory("incr").toString
    val (a, b) = rows.zipWithIndex.partition(_._2 % 2 == 0)
    a.map(_._1).toDF("household_id", "admit_date")
      .coalesce(1).write.parquet(dir + "/f1")
    b.map(_._1).toDF("household_id", "admit_date")
      .coalesce(1).write.parquet(dir + "/f2")
    val files = new java.io.File(dir).listFiles.flatMap(_.listFiles)
      .filter(_.getName.endsWith(".parquet"))
    val streamDir = java.nio.file.Files.createTempDirectory("incr_s")
    files.zipWithIndex.foreach { case (f, i) =>
      java.nio.file.Files.copy(f.toPath, streamDir.resolve(s"$i.parquet"))
    }
    val schema = spark.read.parquet(dir + "/f1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
      .select(col("household_id"),
        expr("datediff(admit_date, DATE'1970-01-01')").as("admit_epoch_day")
          .cast("int"))
      .as[HhEncounter]
    val q = Incremental.updates(stream, cfg)
      .writeStream.outputMode("update")
      .format("memory").queryName("incr")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val emitted = spark.table("incr")
    // state genuinely crossed batches: some household re-emitted at v2
    assert(emitted.agg(max("version")).as[Long].head() >= 2L)
    val streamed = Incremental.latest(emitted)
      .select("household_id", "retained", "start_month", "end_month")
      .as[(Long, Boolean, String, String)].collect().toSet
    // batch truth over the same rows (persons: one member per household)
    val encounters = rows.toDF("person_id", "admit_date") // person=household
    val persons = rows.map(_._1).distinct
      .map(h => (h, h)).toDF("person_id", "household_id")
    val batch = Retention.householdRanges(persons, encounters, cfg)
      .select(col("household_id"), col("retained"), col("start_date"),
              concat(substring(col("end_date"), 1, 8), lit("01")))
      .as[(Long, Boolean, String, String)].collect().toSet
    assert(streamed == batch)

    // end-to-end: the same stream driven into the durable keyed sink
    val sink = java.nio.file.Files.createTempDirectory("incr_sink").toString + "/t"
    val q2 = Incremental.writeToKeyedSink(
        Incremental.updates(stream, cfg), sink, 8)
      .trigger(Trigger.AvailableNow()).start()
    q2.processAllAvailable(); q2.stop()
    val sunk = graft.sources.KeyedUpsert.read(spark, sink)
      .select(col("household_id"), explode(col("ranges")).as("r"))
      .select(col("household_id"), col("r.retained"),
              col("r.start_month"), col("r.end_month"))
      .as[(Long, Boolean, String, String)].collect().toSet
    assert(sunk == batch)
  }

  test("restart from checkpoint resumes state across process boundaries") {
    val cfg = RetentionConfig(asOf = LocalDate.of(2021, 6, 15),
      windowMonths = 6, lookbackDays = 45, scanYears = 2)
    val rows = (1 to 20).flatMap { hh =>
      Seq(60, 20, 5).map(d => (hh.toLong,
        java.sql.Date.valueOf(LocalDate.of(2021, 3, 1).plusDays(d.toLong))))
    }
    val streamDir = java.nio.file.Files.createTempDirectory("ckpt_src")
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    def stage(name: String, part: Seq[(Long, java.sql.Date)]): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("stage_w").toString + "/d"
      part.toDF("household_id", "admit_date").coalesce(1).write.parquet(tmp)
      val f = new java.io.File(tmp).listFiles
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(f.toPath, streamDir.resolve(name))
    }
    val schema = rows.take(1).toDF("household_id", "admit_date").schema
    val sink = java.nio.file.Files.createTempDirectory("ckpt_sink").toString + "/t"
    def runOnce(): Unit = {
      // the real production path: checkpointed foreachBatch into the
      // durable keyed sink (the memory sink cannot recover checkpoints)
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(streamDir.toString)
        .select(col("household_id"),
          expr("datediff(admit_date, DATE'1970-01-01')")
            .cast("int").as("admit_epoch_day"))
        .as[HhEncounter]
      val q = Incremental.writeToKeyedSink(
          Incremental.updates(stream, cfg), sink, 8)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
    }
    val (a, b) = rows.partition(_._2.toLocalDate.getDayOfMonth < 15)
    stage("f1.parquet", a)
    runOnce()                      // "process" 1: sees only first half
    stage("f2.parquet", b)
    runOnce()                      // "process" 2: resumes from checkpoint
    // resumed run must merge NEW days into checkpoint-recovered state,
    // converging to the batch result over all rows
    val streamed = graft.sources.KeyedUpsert.read(spark, sink)
      .select(col("household_id"), explode(col("ranges")).as("r"))
      .select(col("household_id"), col("r.retained"),
              col("r.start_month"), col("r.end_month"))
      .as[(Long, Boolean, String, String)].collect().toSet
    val persons = rows.map(_._1).distinct.map(h => (h, h))
      .toDF("person_id", "household_id")
    val batchSet = Retention.householdRanges(persons,
        rows.toDF("person_id", "admit_date"), cfg)
      .select(col("household_id"), col("retained"), col("start_date"),
              concat(substring(col("end_date"), 1, 8), lit("01")))
      .as[(Long, Boolean, String, String)].collect().toSet
    assert(streamed == batchSet)
  }
}
