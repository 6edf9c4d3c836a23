package graft

/** Smoke: driver contract — entry() returns rows; every declared query
  * runs and returns rows at sf0.001 (guards against silently-empty
  * results that would trivially "pass" a hash compare). */
class EntrySpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle and returns rows at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"$name returned no rows")
      assert(SparkEntry.oracleSql.contains(name), s"$name lacks an oracle")
    }
  }
}
