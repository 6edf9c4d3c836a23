package graft

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.operators.GlobalOrder

/** Session scoping of the cardinality gate's pin FIFO (round-12): the
  * gate persists its input when no bound is supplied, and retains at
  * most [[GlobalOrder.GatePinCap]] pinned frames PER SESSION — one
  * session's gates must never evict another session's still-warm pins
  * (the JVM-global FIFO this replaces silently recomputed the victim's
  * subtree), and eviction within a session unpersists exactly the
  * oldest frame.
  */
class GatePinSessionSpec extends SparkSpec {

  private def gate(s: org.apache.spark.sql.SparkSession, tag: Int): Unit = {
    import s.implicits._
    // the aggregate makes the input DERIVED: bound=None then forces the
    // persist+count gate (round-14's no-pin path takes leaf/projection
    // inputs through a bare count instead — see GlobalOrderAutoSpec)
    val df = (0 until 64).map(i => (i.toLong + tag * 1000L, i.toLong))
      .toDF("k", "v").groupBy("k").agg(sum("v").as("v"))
    GlobalOrder.withRowNumberAuto(df, Seq(col("v"), col("k")), "rn").count()
  }

  test("pins are per-session: session A's evictions spare session B") {
    val b = spark.newSession()
    gate(b, 99) // one pin in session B, first — oldest JVM-wide
    val bPins = GlobalOrder.gatePinSnapshot(b)
    assert(bPins.size == 1, s"expected 1 pin in session B, got ${bPins.size}")

    // overflow session A's FIFO: cap + 2 gates
    (1 to GlobalOrder.GatePinCap + 2).foreach(i => gate(spark, i))

    // B's pin survives A's evictions (global FIFO would have evicted it
    // first) and is still materialized
    val bAfter = GlobalOrder.gatePinSnapshot(b)
    assert(bAfter.size == 1, "session B's pin FIFO must be untouched")
    assert(bAfter.head.storageLevel != StorageLevel.NONE,
      "session B's pin must still be persisted after A's evictions")

    // A holds exactly the cap; its evicted frames are unpersisted and
    // the survivors still persisted
    val aPins = GlobalOrder.gatePinSnapshot(spark)
    assert(aPins.size == GlobalOrder.GatePinCap,
      s"session A must hold exactly the cap, got ${aPins.size}")
    assert(aPins.forall(_.storageLevel != StorageLevel.NONE),
      "surviving session-A pins must still be persisted")
  }

  test("aggregate cap across sessions (round-13): many short-lived " +
       "sessions over one live context cannot pin without bound") {
    // mint enough sessions at the per-session cap to overflow the
    // global bound; every session shares the suite's live context, so
    // the isStopped purge never fires — exactly the server shape the
    // aggregate cap exists for
    val sessions = (1 to GlobalOrder.GlobalPinCap / GlobalOrder.GatePinCap + 2)
      .map(_ => spark.newSession())
    sessions.zipWithIndex.foreach { case (s, si) =>
      (1 to GlobalOrder.GatePinCap).foreach(i => gate(s, si * 100 + i))
    }
    val total = sessions.map(GlobalOrder.gatePinSnapshot(_).size).sum +
      GlobalOrder.gatePinSnapshot(spark).size
    assert(total <= GlobalOrder.GlobalPinCap,
      s"aggregate pins $total exceed GlobalPinCap " +
        s"${GlobalOrder.GlobalPinCap}")
    // the NEWEST session keeps its full FIFO — eviction starts at the
    // oldest session's oldest pin
    assert(GlobalOrder.gatePinSnapshot(sessions.last).size ==
      GlobalOrder.GatePinCap,
      "newest session's pins must be untouched by the aggregate cap")
  }
}
