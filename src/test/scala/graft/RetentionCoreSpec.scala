package graft

import graft.retention.{Retention, RetentionCore, StarAdapter}

/** RetentionCore: the shared cached stage must (a) be consumed via
  * InMemoryTableScan by every view once materialized — no re-scan of
  * the encounter source — and (b) return results identical to the
  * direct (uncached) library path.
  */
class RetentionCoreSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def core = new RetentionCore(
    StarAdapter.persons(spark, dir), StarAdapter.encounters(spark, dir),
    StarAdapter.config(spark, dir))

  test("views consume the cached stage — no encounter re-scan above it") {
    val c = core
    c.householdRanges.count() // materialize the shared stage
    val p = c.fullHistory.queryExecution.executedPlan.toString
    assert(p.contains("InMemoryTableScan"), p)
    // Everything ABOVE the cached relation (the per-view join) must not
    // touch the encounter source; the plan string embeds the original
    // subtree inside InMemoryRelation, so only inspect the prefix.
    val above = p.substring(0, p.indexOf("InMemoryRelation"))
    assert(!above.contains("orders.parquet"), above)
    val pn = c.nestedHistory.queryExecution.executedPlan.toString
    assert(pn.contains("InMemoryTableScan"), pn)
    c.uncache()
  }

  test("cached views equal the direct library results") {
    val c = core
    val persons = StarAdapter.persons(spark, dir)
    val encounters = StarAdapter.encounters(spark, dir)
    val cfg = StarAdapter.config(spark, dir)
    val direct = Retention.fullHistory(persons, encounters, cfg)
      .collect().map(_.toString).sorted
    val cached = c.fullHistory.collect().map(_.toString).sorted
    assert(direct.length > 0 && direct.sameElements(cached))
    val directNested = Retention.nestedHistory(persons, encounters, cfg)
      .collect().map(_.toString).sorted
    val cachedNested = c.nestedHistory.collect().map(_.toString).sorted
    assert(directNested.sameElements(cachedNested))
    c.uncache()
  }
}
