package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the per-domain registry merge (the round-7 SparkEntry
  * split): a duplicate query name across registry files would
  * silently shadow in `toMap`, and a query without an oracle (or vice
  * versa) would silently weaken the driver's correctness gate. No
  * SparkSession needed — this is pure map structure. */
class RegistrySpec extends AnyFunSuite {

  test("no duplicate query names across registries (merge is lossless)") {
    // SparkEntry.querySeq's require() throws on duplicates; force it
    val qs = SparkEntry.queries
    assert(qs.size == 257, s"expected 257 queries, got ${qs.size}")
  }

  test("every query has exactly one oracle and every oracle a query") {
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet,
      "queries/oracleSql key sets diverged: only-in-queries=" +
        (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet) +
        " only-in-oracle=" +
        (SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet))
  }

  test("registry files stay under the 1500-line maintainability bound") {
    val dir = new java.io.File("src/main/scala/graft/registry")
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
    assert(files.nonEmpty, "registry directory missing")
    val over = files.filter { f =>
      java.nio.file.Files.readAllLines(f.toPath,
        java.nio.charset.StandardCharsets.UTF_8).size > 1500 }
    assert(over.isEmpty,
      s"registry files over 1500 lines: ${over.map(_.getName).mkString(", ")}")
  }
}
