package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.Dedup
import graft.retention.{HhEncounter, Incremental, RetentionConfig, Retention}
import graft.streaming.{BandRow, StreamingOps}

/** Pins the documented 100-TB streaming state story: with the state
  * store swapped to RocksDB (spark.sql.streaming.stateStore
  * .providerClass — the disk-backed store that bounds executor memory
  * when keyed state outgrows the heap), the stateful operators
  * produce IDENTICAL results to the default HDFS-backed store, and
  * the query progress proves RocksDB actually served the state. The
  * claim sat in BASELINE.md since round 3 without a test. */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[A](body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, RocksProvider)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private val words = Seq("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi")
  private def textFor(i: Long): String = {
    val rnd = new scala.util.Random((i % 20) + 1)
    (0 until 12).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
  }

  test("near-dup anchors on RocksDB state == batch LSH min-partner, " +
       "and progress metrics prove RocksDB served the state") {
    val docs = (0L until 60L).map(i => (i, textFor(i))).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("rocks_dedup")
    val src = dir.resolve("src"); java.nio.file.Files.createDirectories(src)
    (0 until 3).foreach { g =>
      val tmp = dir.resolve(s"w$g").toString
      docs.filter(col("doc_id") >= g * 20 && col("doc_id") < (g + 1) * 20)
        .coalesce(1).write.parquet(tmp)
      val f = new java.io.File(tmp).listFiles
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(f.toPath, src.resolve(s"$g.parquet"))
    }
    val lastProgress = withRocksDb {
      val stream = spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1").parquet(src.toString)
      val bandRows = Dedup.bandSignatureRows(stream, "doc_id", "text", 3, 16, 4)
        .as[BandRow]
      val q = StreamingOps.nearDupAnchors(bandRows)
        .writeStream.outputMode("update")
        .format("memory").queryName("rocks_anchors")
        .option("checkpointLocation",
          dir.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable()
      val p = q.recentProgress.filter(_.stateOperators.nonEmpty).lastOption
      q.stop()
      p
    }
    // results identical to the batch relation (same assertion as
    // DedupStreamSpec, which runs on the default provider)
    val streamed = spark.table("rocks_anchors")
      .groupBy("doc_id").agg(min("anchor").as("anchor"))
      .as[(Long, Long)].collect().toMap
    val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text", 3, 16, 4)
      .as[(Long, Long)].collect()
    val expected = (0L until 60L).map { d =>
      val partners = pairs.collect { case (a, b) if b == d => a }
      d -> (if (partners.isEmpty) d else math.min(d, partners.min))
    }.toMap
    assert(streamed == expected)
    // the state store really was RocksDB: provider-specific metrics
    // appear in the operator progress, and state is bounded (one long
    // per distinct band signature)
    val op = lastProgress.getOrElse(
      fail("no stateful operator progress recorded")).stateOperators.head
    val rocksKeys = op.customMetrics.keySet().toArray.map(_.toString)
      .filter(_.toLowerCase.contains("rocksdb"))
    assert(rocksKeys.nonEmpty,
      s"no rocksdb metrics in ${op.customMetrics.keySet()}")
    assert(op.numRowsTotal > 0 && op.numRowsTotal <= 16 * 60,
      s"state rows ${op.numRowsTotal} outside the band-signature bound")
  }

  test("incremental retention on RocksDB state converges to batch ranges") {
    val cfg = RetentionConfig(asOf = LocalDate.of(2021, 6, 15),
      windowMonths = 6, lookbackDays = 45, scanYears = 2)
    val rnd = new scala.util.Random(13)
    val rows = (1 to 40).flatMap { hh =>
      (0 until 1 + rnd.nextInt(6)).map { _ =>
        (hh.toLong, java.sql.Date.valueOf(LocalDate.of(2020, 7, 1)
          .plusDays(rnd.nextInt(350).toLong)))
      }
    }
    val dir = java.nio.file.Files.createTempDirectory("rocks_incr")
    val (a, b) = rows.zipWithIndex.partition(_._2 % 2 == 0)
    Seq(a, b).zipWithIndex.foreach { case (half, i) =>
      val tmp = dir.resolve(s"w$i").toString
      half.map(_._1).toDF("household_id", "admit_date")
        .coalesce(1).write.parquet(tmp)
      val f = new java.io.File(tmp).listFiles
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(f.toPath, dir.resolve(s"$i.parquet"))
    }
    withRocksDb {
      val schema = spark.read.parquet(dir.resolve("w0").toString).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(dir.toString)
        .select(col("household_id"),
          expr("datediff(admit_date, DATE'1970-01-01')")
            .cast("int").as("admit_epoch_day"))
        .as[HhEncounter]
      val q = Incremental.updates(stream, cfg)
        .writeStream.outputMode("update")
        .format("memory").queryName("rocks_incr")
        .option("checkpointLocation", dir.resolve("ckpt").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
    }
    val streamed = Incremental.latest(spark.table("rocks_incr"))
      .select("household_id", "retained", "start_month", "end_month")
      .as[(Long, Boolean, String, String)].collect().toSet
    val encounters = rows.toDF("person_id", "admit_date")
    val persons = rows.map(_._1).distinct
      .map(h => (h, h)).toDF("person_id", "household_id")
    val batch = Retention.householdRanges(persons, encounters, cfg)
      .select(col("household_id"), col("retained"), col("start_date"),
              concat(substring(col("end_date"), 1, 8), lit("01")))
      .as[(Long, Boolean, String, String)].collect().toSet
    assert(streamed == batch)
  }
}
