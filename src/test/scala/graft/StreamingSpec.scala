package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{LatenessEvent, SessionEvent, StreamingOps,
  ThrottleEvent}

/** Streaming duals replay the events fixture and must agree with the
  * batch queries on the same data. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  test("windowed counts over a replayed stream match batch totals") {
    val stream = StreamingOps.eventsStream(spark, dir)
    val q = StreamingOps.windowedCounts(stream, "1 day", "1 hour")
      .writeStream.outputMode("complete")
      .format("memory").queryName("wc")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("wc")
      .agg(sum("n_events")).as[Long].head()
    val batch = Tables.events(spark, dir).count()
    assert(streamed == batch) // every event lands in exactly one window
  }

  test("mergeable sketch aggregates run IN streaming and match batch state") {
    // HllAgg / TopKPairsAgg partial states merge associatively, so the
    // same aggregate works as an incrementally-maintained streaming
    // aggregation — the property that replaces a nightly batch
    // distinct-count/top-k at 100 TB. Replay the fixture as a stream
    // and require bit-identical final state vs the one-shot batch.
    val stream = StreamingOps.eventsStream(spark, dir)
    val q = stream
      .groupBy("event_type")
      .agg(graft.functions.Sketches
             .hllDistinct($"user_id".cast("string"), 6).as("h"),
           graft.functions.Sketches
             .topKPairs($"value", $"event_id", 4).as("tk"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sketches")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("sketches")
      .select($"event_type", $"h.n_zero_registers", $"h.sum_rho",
              $"h.inv_scaled", $"tk".cast("string"))
      .as[(String, Long, Long, Long, String)].collect().toSet
    val batch = Tables.events(spark, dir)
      .groupBy("event_type")
      .agg(graft.functions.Sketches
             .hllDistinct($"user_id".cast("string"), 6).as("h"),
           graft.functions.Sketches
             .topKPairs($"value", $"event_id", 4).as("tk"))
      .select($"event_type", $"h.n_zero_registers", $"h.sum_rho",
              $"h.inv_scaled", $"tk".cast("string"))
      .as[(String, Long, Long, Long, String)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("stream-static enrichment join matches the batch join") {
    val dim = Tables.events(spark, dir).select($"user_id").distinct()
      .withColumn("bucket", pmod($"user_id", lit(7)))
    val q = StreamingOps.enrichWithStatic(
        StreamingOps.eventsStream(spark, dir), dim, "user_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("enriched")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("enriched")
      .groupBy("bucket").count().as[(Long, Long)].collect().toMap
    val batch = Tables.events(spark, dir).join(dim, "user_id")
      .groupBy("bucket").count().as[(Long, Long)].collect().toMap
    assert(streamed == batch)
  }

  test("stream-stream interval join matches the batch attribution result") {
    val stream = StreamingOps.eventsStream(spark, dir)
    val q = StreamingOps.attributionJoin(
        stream.filter($"event_type" === "click"),
        stream.filter($"event_type" === "purchase"),
        "24 hours", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("attrib")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("attrib")
      .as[(Long, Long, Long, Long)].collect().toSet
    val ev = Tables.events(spark, dir)
    val batch = StreamingOps.attributionJoin(
        ev.filter($"event_type" === "click"),
        ev.filter($"event_type" === "purchase"),
        "24 hours", "1 hour")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(batch.nonEmpty, "fixture must produce attributed pairs")
    assert(batch.forall { case (_, _, _, gap) =>
      gap >= 0L && gap <= 86400000000L }, "gap outside the interval")
  }

  test("LEFT OUTER stream-stream join: inner rows match batch; " +
       "null-padded rows appear exactly for watermark-closed clicks") {
    val stream = StreamingOps.eventsStream(spark, dir)
    val q = StreamingOps.attributionJoinLeftOuter(
        stream.filter($"event_type" === "click"),
        stream.filter($"event_type" === "purchase"),
        "24 hours", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("attrib_lo")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("attrib_lo")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    val ev = Tables.events(spark, dir)
    val batch = StreamingOps.attributionJoinLeftOuter(
        ev.filter($"event_type" === "click"),
        ev.filter($"event_type" === "purchase"),
        "24 hours", "1 hour")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
    // matched pairs are watermark-independent: exact equality
    assert(streamed.filter(_._3.isDefined) == batch.filter(_._3.isDefined))
    // null-padded rows: the stream may only emit a click's row once the
    // watermark passed ts + 24h (before that a purchase could still
    // arrive); batch emits every unmatched click immediately. So the
    // streamed nulls are a subset of the batch nulls...
    val sNull = streamed.filter(_._3.isEmpty)
    val bNull = batch.filter(_._3.isEmpty)
    assert(sNull.subsetOf(bNull))
    // ...and every batch null whose window closed STRICTLY before the
    // final watermark was emitted. The global watermark is the MIN of
    // the two sides' (max ts − 1h delay) — the sides are filtered
    // streams, so their maxima differ — taken with a 3h safety margin
    // so the assertion never sits on the eviction boundary
    val maxTsNs = math.min(
      ev.filter($"event_type" === "click")
        .agg(max($"ts_ns")).head().getLong(0),
      ev.filter($"event_type" === "purchase")
        .agg(max($"ts_ns")).head().getLong(0))
    val closed = StreamingOps.attributionJoinLeftOuter(
        ev.filter($"event_type" === "click" &&
          $"ts_ns" + lit(28L * 3600L * 1000000000L) < lit(maxTsNs)),
        ev.filter($"event_type" === "purchase"),
        "24 hours", "1 hour")
      .as[(Long, Long, Option[Long], Option[Long])].collect().toSet
      .filter(_._3.isEmpty)
    assert(closed.subsetOf(sNull),
      s"${closed.size} closed unmatched clicks, ${sNull.size} emitted")
    assert(closed.nonEmpty, "fixture must have closed unconverted clicks")
  }

  test("watermarked streaming dedup removes redelivered events") {
    // stage the SAME fixture file twice — an at-least-once source that
    // redelivers every event exactly once
    val src = java.nio.file.Paths.get(s"$dir/events.parquet")
    val stageDir = java.nio.file.Files.createTempDirectory("dup_stream")
    java.nio.file.Files.copy(src, stageDir.resolve("a.parquet"))
    java.nio.file.Files.copy(src, stageDir.resolve("b.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = Tables.normalizeEvents(
      spark.readStream.schema(schema).parquet(stageDir.toString))
    val q = StreamingOps.dedupByIdStream(stream, "event_id", "1 hour")
      .writeStream.outputMode("append")
      .format("memory").queryName("deduped")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("deduped").count() ==
      Tables.events(spark, dir).count())
  }

  test("watermark drops data later than the horizon (bounded state contract)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(java.sql.Timestamp, String, Double)]
    val counts = StreamingOps.windowedCounts(
      src.toDF().toDF("ts", "event_type", "value"), "1 hour", "30 minutes")
    val q = counts.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("wm").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: events at 10:xx; batch 2 advances the watermark past the
    // 10:00 window (event at 13:00 → watermark 12:30) closing it
    src.addData((ts("2021-01-01 10:05:00"), "a", 1.0),
                (ts("2021-01-01 10:55:00"), "a", 1.0))
    q.processAllAvailable()
    src.addData((ts("2021-01-01 13:00:00"), "a", 1.0))
    q.processAllAvailable()
    // batch 3: a VERY late event for the closed 10:00 window — dropped
    src.addData((ts("2021-01-01 10:10:00"), "a", 99.0))
    q.processAllAvailable()
    src.addData((ts("2021-01-01 15:00:00"), "a", 1.0)) // close 13:00 too
    q.processAllAvailable(); q.stop()
    val out = spark.table("wm")
      .select(col("window.start").cast("string"), col("n_events"))
      .as[(String, Long)].collect().toMap
    assert(out("2021-01-01 10:00:00") == 2L) // late row NOT counted
    assert(out("2021-01-01 13:00:00") == 1L)
  }

  test("stateful streaming funnel matches the batch funnel report") {
    import graft.streaming.FunnelEvent
    val steps = Seq("view", "click", "purchase")
    val batch = graft.operators.Funnel.funnel(
        Tables.events(spark, dir), "user_id", "event_type", "ts_ns", steps)
      .select("step_idx", "users", "total_lag")
      .as[(Int, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val stream = StreamingOps.eventsStream(spark, dir)
      .select($"user_id", $"event_type", $"ts_ns").as[FunnelEvent]
    val q = StreamingOps.funnelAdvances(stream, steps)
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("funnel")
      .groupBy("step_idx")
      .agg(count(lit(1)).as("users"), sum("lag_ns").as("total_lag"))
      .as[(Int, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(streamed == batch)
    assert(batch.keySet == Set(1, 2, 3) && batch(3)._1 > 0,
      "fixture must drive users through the whole funnel")
  }

  test("streaming funnel state advances across microbatches") {
    import graft.streaming.FunnelEvent
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[FunnelEvent]
    val q = StreamingOps.funnelAdvances(src.toDS(), Seq("view", "click"))
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_mb").start()
    src.addData(FunnelEvent(1L, "view", 100L),
                FunnelEvent(1L, "click", 50L))   // too early: before view
    q.processAllAvailable()
    src.addData(FunnelEvent(1L, "click", 200L))  // crosses in batch 2
    q.processAllAvailable(); q.stop()
    val out = spark.table("funnel_mb")
      .select("step_idx", "t_ns", "lag_ns")
      .as[(Int, Long, Long)].collect().toSet
    assert(out == Set((1, 100L, 0L), (2, 200L, 100L)))
  }

  test("stateful sessionization matches the batch gaps-and-islands result") {
    val gapNs = 30L * 60 * 1000 * 1000 * 1000
    val events = Tables.events(spark, dir)
      .select($"user_id", $"event_id", $"ts_ns").as[SessionEvent]
    // batch truth from the SparkEntry query
    val batch = SparkEntry.queries("q_events_sessionize")(spark, dir)
      .select("user_id", "start_ns", "end_ns", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    // streaming run: one microbatch holds every event, so each user's
    // sessions are emitted except the still-open last one
    val stream = StreamingOps.eventsStream(spark, dir)
      .select($"user_id", $"event_id", $"ts_ns").as[SessionEvent]
    val q = StreamingOps.sessionize(stream, gapNs)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val emitted = spark.table("sess")
      .select("user_id", "session_start_ns", "session_end_ns", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    // every emitted (closed) session must be a true batch session
    assert(emitted.subsetOf(batch))
    // and all but (≤ one open session per user) were emitted
    val users = emitted.map(_._1)
    val expectClosed = batch.groupBy(_._1).map { case (u, ss) => u -> (ss.size - 1) }
    users.foreach { u =>
      assert(emitted.count(_._1 == u) >= expectClosed(u))
    }
  }

  test("streaming throttle emits exactly the batch lag-gap result") {
    val batch = SparkEntry.queries("q_throttle")(spark, dir)
      .as[(Long, String, Long)].collect().toSet
    val stream = StreamingOps.eventsStream(spark, dir)
      .select($"user_id", $"event_type", $"event_id", $"ts_ns")
      .as[ThrottleEvent]
    val q = StreamingOps.throttled(stream, 60L * 1000 * 1000 * 1000)
      .writeStream.outputMode("append")
      .format("memory").queryName("thr")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val emitted = spark.table("thr")
      .as[(Long, String, Long)].collect().toSet
    // a filter has no open tail: the stream result IS the batch result
    assert(emitted === batch)
  }

  test("streaming throttle state carries across microbatches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[ThrottleEvent]
    val q = StreamingOps.throttled(ms.toDS(), 100L)
      .writeStream.outputMode("append")
      .format("memory").queryName("thr2").start()
    // batch 1: keep (first), drop (gap 50)
    ms.addData(ThrottleEvent(1, "click", 10, 1000),
               ThrottleEvent(1, "click", 11, 1050))
    q.processAllAvailable()
    // batch 2: gap vs event 11 (not vs kept event 10): 1050+100=1150
    // → 1140 dropped, 1260 kept
    ms.addData(ThrottleEvent(1, "click", 12, 1140),
               ThrottleEvent(1, "click", 13, 1260))
    q.processAllAvailable(); q.stop()
    val got = spark.table("thr2").as[(Long, String, Long)]
      .collect().map(_._3).toSet
    assert(got === Set(10L, 13L))
  }

  test("streaming capped balance equals the batch window identity") {
    import graft.streaming.{BalanceDelta, StreamingOps => SO}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(9)
    val deltas = for (k <- 1L to 4L; i <- 1L to 50L)
      yield BalanceDelta(k, i, rnd.nextInt(21) - 12L)
    val batch = graft.operators.Series.cappedBalance(
        deltas.toDF(), "key", Seq("seq"), "delta")
      .select("key", "seq", "balance")
      .as[(Long, Long, Long)].collect().toSet
    val ms = MemoryStream[BalanceDelta]
    val q = SO.cappedBalanceStream(ms.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("bal").start()
    // deliver in two microbatches to exercise cross-batch state carry
    val (b1, b2) = deltas.partition(_.seq <= 25)
    ms.addData(b1: _*); q.processAllAvailable()
    ms.addData(b2: _*); q.processAllAvailable(); q.stop()
    val streamed = spark.table("bal")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed === batch)
  }

  test("streaming lateness monitor aggregates to the batch OOO audit") {
    val batch = SparkEntry.queries("q_ooo_lateness")(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSet
    val stream = StreamingOps.eventsStream(spark, dir)
      .select($"user_id", $"event_id", $"ts_ns")
      .as[LatenessEvent]
    val q = StreamingOps.latenessMonitor(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("late")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val agg = spark.table("late")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("late").as("n_late"),
        max("late_ns").as("max_late_ns"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(agg === batch)
  }

  test("lateness state carries the running max across microbatches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val ms = MemoryStream[LatenessEvent]
    val q = StreamingOps.latenessMonitor(ms.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("late2").start()
    ms.addData(LatenessEvent(1, 10, 1000), LatenessEvent(1, 11, 900))
    q.processAllAvailable()
    // batch 2: 950 is behind the max (1000) seen in batch 1
    ms.addData(LatenessEvent(1, 12, 950), LatenessEvent(1, 13, 1100))
    q.processAllAvailable(); q.stop()
    val got = spark.table("late2")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._2 -> (r._3, r._4)).toMap
    assert(got(10L) == (0L, 0L))
    assert(got(11L) == (1L, 100L))
    assert(got(12L) == (1L, 50L))
    assert(got(13L) == (0L, 0L))
  }
}
