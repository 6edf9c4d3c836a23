package graft

import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.Dedup
import graft.retention.{HhEncounter, Incremental, Retention, RetentionConfig}
import graft.streaming.{BandRow, StreamingOps}

/** Checkpoint RECOVERY story: kill a stateful streaming query, restart
  * it from the same checkpoint directory against a grown source, and
  * prove (a) no reprocessing — the restarted query emits only for
  * post-restart input; (b) state recovery — post-restart emissions
  * depend on pre-restart state (anchors resolve to pre-restart docs,
  * retention versions CONTINUE rather than reset); (c) convergence —
  * the union of pre- and post-restart emissions equals the batch
  * result over the full input. Runs under both the default HDFS-backed
  * state store and RocksDB (the documented 100-TB provider), closing
  * the gap RocksDbStateSpec left: that spec pinned provider parity for
  * one uninterrupted run, not recovery across a restart.
  */
object CheckpointRecoverySpec {
  /** Driver-side emission buffers, one per phase run. The memory sink
    * refuses checkpoint recovery (it is not fault-tolerant), so the
    * restart tests collect through foreachBatch — the sink shape a
    * real recovery deployment uses — into these. */
  val sink = new scala.collection.concurrent.TrieMap[
    String, scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]]()
  def buf(name: String): scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row] =
    sink.getOrElseUpdate(name,
      new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]())
}

class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._
  import CheckpointRecoverySpec.buf

  private val RocksProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val providers: Seq[(String, Option[String])] =
    Seq("hdfs" -> None, "rocksdb" -> Some(RocksProvider))

  private def withProvider[A](provider: Option[String])(body: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    provider.foreach(spark.conf.set(key, _))
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Stage rows as one parquet file named `name` inside `srcDir` (the
    * file-source sees each copy as a new input file). */
  private def stageFile(df: org.apache.spark.sql.DataFrame,
                        dir: java.nio.file.Path, name: String): Unit = {
    val tmp = dir.resolve(s"_w_$name").toString
    df.coalesce(1).write.parquet(tmp)
    val f = new java.io.File(tmp).listFiles
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(f.toPath, dir.resolve(s"$name.parquet"))
  }

  private val words = Seq("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi")
  private def textFor(i: Long): String = {
    val rnd = new scala.util.Random((i % 20) + 1)
    (0 until 12).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
  }

  providers.foreach { case (tag, provider) =>
    test(s"[$tag] near-dup anchors: restart recovers bucket state, " +
         "no re-emission, converges to batch") {
      // text repeats with period 20, so every phase-B doc (30..59 with
      // id%20 <= 19) has an exact twin among phase-A docs (0..29) —
      // phase-B anchors can only be right if phase-A state recovered
      val docs = (0L until 60L).map(i => (i, textFor(i)))
        .toDF("doc_id", "text")
      val dir = java.nio.file.Files.createTempDirectory(s"ckptrec_$tag")
      val src = dir.resolve("src"); java.nio.file.Files.createDirectories(src)
      val ckpt = dir.resolve("ckpt").toString

      def runPhase(sinkName: String): Unit = withProvider(provider) {
        val b = buf(sinkName)
        val stream = spark.readStream.schema(docs.schema)
          .option("maxFilesPerTrigger", "1").parquet(src.toString)
        val bandRows = Dedup.bandSignatureRows(
          stream, "doc_id", "text", 3, 16, 4).as[BandRow]
        val q = StreamingOps.nearDupAnchors(bandRows)
          .writeStream.outputMode("update")
          .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.DocAnchor], _: Long) =>
            val rows = df.toDF().collect()
            b.synchronized { b ++= rows }; ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.processAllAvailable(); q.stop()
      }

      (0 until 3).foreach(g => stageFile(
        docs.filter(col("doc_id") >= g * 10 && col("doc_id") < (g + 1) * 10),
        src, s"f$g"))
      runPhase(s"rec_a_$tag")
      val a = buf(s"rec_a_$tag").toArray
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(a.map(_._1).distinct.sorted.sameElements(0L until 30L))

      // grow the source, restart from the SAME checkpoint
      (3 until 6).foreach(g => stageFile(
        docs.filter(col("doc_id") >= g * 10 && col("doc_id") < (g + 1) * 10),
        src, s"f$g"))
      runPhase(s"rec_b_$tag")
      val b = buf(s"rec_b_$tag").toArray
        .map(r => (r.getLong(0), r.getLong(1)))

      // (a) no reprocessing: only post-restart docs emit
      assert(b.map(_._1).distinct.sorted.sameElements(30L until 60L),
        s"restart re-emitted pre-restart docs: ${b.map(_._1).distinct.sorted.toSeq}")
      // (b) state recovered: phase-B docs anchor to phase-A ids, which
      // requires the bucket minima written before the restart
      assert(b.exists(_._2 < 30L),
        "no phase-B doc anchored to a phase-A doc — state was not recovered")
      // (c) convergence: min anchor per doc over A ∪ B == batch result
      val streamed = (a ++ b).groupBy(_._1)
        .map { case (d, xs) => d -> xs.map(_._2).min }
      val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text", 3, 16, 4)
        .as[(Long, Long)].collect()
      val expected = (0L until 60L).map { d =>
        val partners = pairs.collect { case (x, y) if y == d => x }
        d -> (if (partners.isEmpty) d else math.min(d, partners.min))
      }.toMap
      assert(streamed == expected)
    }

    test(s"[$tag] incremental retention: restart continues versions " +
         "and converges to batch ranges") {
      val cfg = RetentionConfig(asOf = LocalDate.of(2021, 6, 15),
        windowMonths = 6, lookbackDays = 45, scanYears = 2)
      val rnd = new scala.util.Random(17)
      val rows = (1 to 30).flatMap { hh =>
        (0 until 2 + rnd.nextInt(4)).map { _ =>
          (hh.toLong, java.sql.Date.valueOf(LocalDate.of(2020, 7, 1)
            .plusDays(rnd.nextInt(330).toLong)))
        }
      }
      val (halfA, halfB) = rows.zipWithIndex.partition(_._2 % 2 == 0)
      val dir = java.nio.file.Files.createTempDirectory(s"ckptrei_$tag")
      val src = dir.resolve("src"); java.nio.file.Files.createDirectories(src)
      val ckpt = dir.resolve("ckpt").toString
      val schema = halfA.map(_._1).toDF("household_id", "admit_date").schema

      def runPhase(sinkName: String): Unit = withProvider(provider) {
        val bb = buf(sinkName)
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(src.toString)
          .select(col("household_id"),
            expr("datediff(admit_date, DATE'1970-01-01')")
              .cast("int").as("admit_epoch_day"))
          .as[HhEncounter]
        val q = Incremental.updates(stream, cfg)
          .writeStream.outputMode("update")
          .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.retention.HhRange], _: Long) =>
            val rows = df.toDF().collect()
            bb.synchronized { bb ++= rows }; ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.processAllAvailable(); q.stop()
      }

      def phaseDf(sinkName: String): org.apache.spark.sql.DataFrame =
        spark.createDataFrame(
          new java.util.ArrayList(
            scala.jdk.CollectionConverters.SeqHasAsJava(
              buf(sinkName).toSeq).asJava),
          org.apache.spark.sql.Encoders.product[graft.retention.HhRange].schema)

      stageFile(halfA.map(_._1).toDF("household_id", "admit_date"), src, "d0")
      runPhase(s"rei_a_$tag")
      val a = phaseDf(s"rei_a_$tag").cache(); a.count()

      stageFile(halfB.map(_._1).toDF("household_id", "admit_date"), src, "d1")
      runPhase(s"rei_b_$tag")
      val b = phaseDf(s"rei_b_$tag").cache(); b.count()

      // no reprocessing: phase B emits exactly the delivery-B households
      val bHhs = b.select("household_id").as[Long].collect().toSet
      assert(bHhs == halfB.map(_._1._1).toSet)
      // versions CONTINUE across the restart (state recovered, not
      // reset): households in both halves must be at version 2 in B
      val aV = a.groupBy("household_id").agg(max("version").as("v"))
        .as[(Long, Long)].collect().toMap
      val bV = b.groupBy("household_id").agg(max("version").as("v"))
        .as[(Long, Long)].collect().toMap
      val inBoth = aV.keySet intersect bV.keySet
      assert(inBoth.nonEmpty)
      inBoth.foreach { hh =>
        assert(bV(hh) == aV(hh) + 1,
          s"household $hh: version ${bV(hh)} after restart, " +
            s"expected ${aV(hh) + 1} — state was reset") }
      // convergence: latest emission per household over A ∪ B == batch
      val streamed = Incremental.latest(a.unionByName(b))
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
      a.unpersist(); b.unpersist()
    }

    test(s"[$tag] funnel: restart recovers step prefixes, no " +
         "re-emission, converges to one-shot run") {
      val steps = Seq("view", "cart", "buy")
      // phase A: every user views; even users also cart.
      // phase B: odd users cart; EVERY user buys — a buy can only
      // advance if the user's pre-restart prefix was recovered.
      val phaseA = (1L to 10L).map(u =>
          (u, "view", 1000L + u)) ++
        (1L to 10L).filter(_ % 2 == 0).map(u => (u, "cart", 2000L + u))
      val phaseB = (1L to 10L).filter(_ % 2 == 1).map(u =>
          (u, "cart", 3000L + u)) ++
        (1L to 10L).map(u => (u, "buy", 4000L + u))
      val all = phaseA ++ phaseB
      val dir = java.nio.file.Files.createTempDirectory(s"ckptfun_$tag")
      val src = dir.resolve("src"); java.nio.file.Files.createDirectories(src)
      val schema = phaseA.toDF("user_id", "event_type", "ts_ns").schema

      def runPhase(ckpt: String, srcDir: java.nio.file.Path,
                   sinkName: String): Unit = withProvider(provider) {
        val bb = buf(sinkName)
        val q = StreamingOps.funnelAdvances(
            spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(srcDir.toString)
              .as[graft.streaming.FunnelEvent], steps)
          .writeStream.outputMode("append")
          .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.FunnelAdvance], _: Long) =>
            val rows = df.toDF().collect()
            bb.synchronized { bb ++= rows }; ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.processAllAvailable(); q.stop()
      }

      stageFile(phaseA.toDF("user_id", "event_type", "ts_ns"), src, "a")
      runPhase(dir.resolve("ckpt").toString, src, s"fun_a_$tag")
      val a = buf(s"fun_a_$tag").toArray
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(3), r.getLong(4)))
      // phase A: 10 view advances + 5 cart advances
      assert(a.count(_._2 == 1) == 10 && a.count(_._2 == 2) == 5)

      stageFile(phaseB.toDF("user_id", "event_type", "ts_ns"), src, "b")
      runPhase(dir.resolve("ckpt").toString, src, s"fun_b_$tag")
      val b = buf(s"fun_b_$tag").toArray
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(3), r.getLong(4)))

      // (a) no reprocessing: nothing from phase A re-advances (every
      // phase-B emission's ts is a phase-B timestamp)
      assert(b.forall(_._3 >= 3000L), b.toSeq.toString)
      // (b) state recovered TWO ways: every user completes the buy
      // step (impossible on a reset prefix — 'buy' is not step 1), and
      // the duration is measured from the PRE-restart view time
      val buys = b.filter(_._2 == 3)
      assert(buys.map(_._1).sorted.toSeq == (1L to 10L),
        s"buy advances missing — prefix state lost: ${buys.toSeq}")
      buys.foreach { case (u, _, ts, dur) =>
        assert(dur == ts - (1000L + u),
          s"user $u: duration $dur not anchored at the phase-A view") }
      // (c) convergence: A ∪ B equals a one-shot run over the full log
      val src2 = dir.resolve("src2"); java.nio.file.Files.createDirectories(src2)
      stageFile(all.toDF("user_id", "event_type", "ts_ns"), src2, "all")
      runPhase(dir.resolve("ckpt2").toString, src2, s"fun_f_$tag")
      val full = buf(s"fun_f_$tag").toArray
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(3), r.getLong(4)))
      assert((a ++ b).sorted.toSeq == full.sorted.toSeq)
    }

    test(s"[$tag] capped balance: restart continues the recurrence, " +
         "no re-emission, converges to the sequential fold") {
      // deltas per key: phase A accumulates, phase B drains — the
      // post-restart balances differ between a recovered and a reset
      // state on every key (reset would clamp at zero immediately)
      val phaseA = for (k <- 1L to 5L; s <- 1L to 5L)
        yield (k, s, if (s == 1) 100L * k else 10L)
      val phaseB = for (k <- 1L to 5L; s <- 6L to 10L)
        yield (k, s, -30L)
      val all = phaseA ++ phaseB
      val dir = java.nio.file.Files.createTempDirectory(s"ckptbal_$tag")
      val src = dir.resolve("src"); java.nio.file.Files.createDirectories(src)
      val ckpt = dir.resolve("ckpt").toString
      val schema = phaseA.toDF("key", "seq", "delta").schema

      def runPhase(sinkName: String): Unit = withProvider(provider) {
        val bb = buf(sinkName)
        val q = StreamingOps.cappedBalanceStream(
            spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src.toString)
              .as[graft.streaming.BalanceDelta])
          .writeStream.outputMode("append")
          .foreachBatch { (df: org.apache.spark.sql.Dataset[graft.streaming.BalanceOut], _: Long) =>
            val rows = df.toDF().collect()
            bb.synchronized { bb ++= rows }; ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.processAllAvailable(); q.stop()
      }

      stageFile(phaseA.toDF("key", "seq", "delta"), src, "a")
      runPhase(s"bal_a_$tag")
      val a = buf(s"bal_a_$tag").toArray
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

      stageFile(phaseB.toDF("key", "seq", "delta"), src, "b")
      runPhase(s"bal_b_$tag")
      val b = buf(s"bal_b_$tag").toArray
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

      // (a) no reprocessing
      assert(b.forall(_._2 >= 6L), b.toSeq.toString)
      // (b)+(c) the sequential floor-at-zero fold over the FULL delta
      // log — phase-B values only match if phase-A balances survived
      // the restart (a reset state would clamp k=1 to 0 by seq 8)
      val expected = all.groupBy(_._1).flatMap { case (k, ds) =>
        ds.sortBy(_._2).scanLeft((k, 0L, 0L)) { case ((_, _, bal), (_, s, d)) =>
          (k, s, math.max(0L, bal + d)) }.drop(1)
      }.toSet
      assert((a ++ b).toSet == expected)
      val k1 = b.filter(x => x._1 == 1L).sortBy(_._2).map(_._3).toSeq
      assert(k1 == Seq(110L, 80L, 50L, 20L, 0L),
        s"key-1 drain $k1 — recurrence did not continue from phase A")
    }
  }
}
