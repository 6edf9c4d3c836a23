package graft

import scala.util.Random

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.{SessionEvent, SessionOut, StreamingOps}

/** Late-data / watermark-boundary property tests for streaming
  * sessionization — the one semantics corner the batch/stream duals
  * don't force: events arriving ACROSS microbatch boundaries, out of
  * order, straddling the session gap at the (implicit) watermark.
  *
  * Contract under test (StreamingOps.sessionize scaladoc): as long as
  * cross-microbatch disorder stays within the session gap of the open
  * session — the configuration every gap-session deployment runs,
  * watermark bound ≤ gap — the closed streaming sessions equal the
  * batch gaps-and-islands sessions EXACTLY; an event later than that
  * is emitted as its own immediate session row, never dropped and
  * never corrupting the open session.
  */
class StreamingSessionLateSpec extends SparkSpec {
  import spark.implicits._

  private val gapNs = 100L

  /** Driver-side reference: batch gap sessionization of all events. */
  private def batchSessions(evts: Seq[SessionEvent]): Set[(Long, Long, Long, Long)] =
    evts.groupBy(_.user_id).flatMap { case (u, es) =>
      val ts = es.map(_.ts_ns).sorted
      val runs = ts.foldLeft(List.empty[(Long, Long, Long)]) {
        case ((s, e, n) :: t, x) if x - e <= gapNs => (s, math.max(e, x), n + 1) :: t
        case (acc, x) => (x, x, 1L) :: acc
      }.reverse
      runs.map(r => (u, r._1, r._2, r._3))
    }.toSet

  private def runStream(name: String, batches: Seq[Seq[SessionEvent]],
                        latenessNs: Long = 0L): Set[(Long, Long, Long, Long)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[SessionEvent]
    val q = StreamingOps.sessionize(src.toDS(), gapNs, latenessNs = latenessNs)
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    batches.foreach { b =>
      if (b.nonEmpty) src.addData(b)
      q.processAllAvailable()
    }
    q.stop()
    spark.table(name)
      .select("user_id", "session_start_ns", "session_end_ns", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
  }

  test("property: replay with disorder within the declared lateness bound " +
       "equals batch sessions exactly (batch cuts straddle sessions)") {
    val rnd = new Random(42)
    for (trial <- 1 to 8) {
      // construct per-user TRUE sessions: runs of events ≤ gap apart,
      // separated by > gap
      var eid = 0L
      val users = 1 + rnd.nextInt(3)
      val all = (1 to users).flatMap { u =>
        var t = rnd.nextInt(50).toLong
        (1 to 1 + rnd.nextInt(4)).flatMap { _ =>
          val sess = (1 to 1 + rnd.nextInt(5)).map { _ =>
            t += rnd.nextInt(gapNs.toInt).toLong // within-gap step
            eid += 1
            SessionEvent(u.toLong, eid, t)
          }
          t += gapNs + 1 + rnd.nextInt(200) // close the session
          sess
        }
      }
      // delivery order: sort by (ts + δ), δ ∈ [0, gap) per event — the
      // watermark-bound model: an event can arrive up to one full gap
      // late relative to later-timestamped events, never more (if f is
      // delivered before e then ts_f ≤ ts_e + δ_e ≤ ts_e + gap). Cuts
      // land anywhere, so late events straddle batch boundaries AND
      // the session gap
      val perUser = all
        .map(e => (e, e.ts_ns + rnd.nextInt(gapNs.toInt)))
        .sortBy { case (e, k) => (k, e.event_id) }
        .map(_._1)
      // sentinel per user, far after everything: closes the last real
      // session so append-mode output covers ALL real sessions
      val horizon = all.map(_.ts_ns).max + 10 * gapNs
      val sentinels = all.map(_.user_id).distinct.map { u =>
        eid += 1; SessionEvent(u, eid, horizon)
      }
      val stream = perUser ++ sentinels
      val nCuts = 1 + rnd.nextInt(3)
      val cuts = (Seq(0, stream.size) ++
        (1 to nCuts).map(_ => rnd.nextInt(stream.size + 1))).distinct.sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) => stream.slice(a, b) }

      // lateness bound = the generator's disorder bound (one gap):
      // the watermark configuration under which the contract promises
      // EXACT batch equality
      val got = runStream(s"sess_prop_$trial", batches, latenessNs = gapNs)
      val want = batchSessions(all) // real sessions; sentinels excluded
      val gotReal = got.filter(_._2 < horizon)
      assert(gotReal == want,
        s"trial $trial:\n got  ${gotReal.toSeq.sorted}\n want ${want.toSeq.sorted}")
    }
  }

  test("an in-gap late event extends the pending session BACKWARDS " +
       "instead of walking its end back (the mis-split corner)") {
    // batch 1: ts 100; batch 2: late 95 then 190. 190 is within gap of
    // the true end (190-100=90 ≤ gap) but NOT of the late event
    // (190-95=95 ≤ gap — barely); a naive lastNs:=95 fold walked the
    // end back to 95 and this exact shape mis-split at slightly wider
    // spacing. The sweep must yield ONE session [95,190] of 3
    val batches = Seq(
      Seq(SessionEvent(1, 1, 100)),
      Seq(SessionEvent(1, 2, 95), SessionEvent(1, 3, 190)),
      Seq(SessionEvent(1, 4, 1000))) // sentinel closes the session
    val got = runStream("sess_backext", batches).filter(_._2 < 1000)
    assert(got == Set((1L, 95L, 190L, 3L)))
  }

  test("an event later than the declared bound still lands as its own " +
       "session row and leaves the pending session intact") {
    val batches = Seq(
      Seq(SessionEvent(2, 1, 1000)),
      // 500/510 arrive 490ns out of order against a lateness bound of
      // 0: they can't re-open anything already emitted, but they are
      // never dropped — they close as their own earlier session
      Seq(SessionEvent(2, 2, 500), SessionEvent(2, 3, 510)),
      Seq(SessionEvent(2, 4, 5000))) // sentinel
    val got = runStream("sess_toolate", batches).filter(_._2 < 5000)
    assert(got == Set((2L, 500L, 510L, 2L), (2L, 1000L, 1000L, 1L)))
  }
}
