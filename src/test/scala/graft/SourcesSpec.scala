package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond parquet (SURVEY.md §2.1 — the
  * reference's only "format" is ES JSON; a general engine needs the
  * standard columnar/row formats) plus layout-level pruning checks. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  private def roundTrip(fmt: String): Unit = {
    val out = Files.createTempDirectory(s"rt_$fmt").toString + "/t"
    val src = Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    src.write.format(fmt).option("header", "true").save(out)
    val back = spark.read.format(fmt)
      .option("header", "true").option("inferSchema", "true").load(out)
    // csv loses types on the wire; compare on a normalized projection
    val norm = (df: org.apache.spark.sql.DataFrame) =>
      df.select(col("c_custkey").cast("long"), col("c_name"),
                col("c_acctbal").cast("double"), col("c_mktsegment"))
        .as[(Long, String, Double, String)].collect().toSet
    assert(norm(back) == norm(src), fmt)
  }

  test("csv round-trip preserves data")(roundTrip("csv"))
  test("json round-trip preserves data")(roundTrip("json"))
  test("orc round-trip preserves data")(roundTrip("orc"))

  test("partitioned write + partition pruning: only matching dirs are scanned") {
    val out = Files.createTempDirectory("part").toString + "/t"
    Tables.load(spark, dir, "orders")
      .write.partitionBy("o_orderstatus").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("o_orderstatus") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    // the scan must carry a partition filter, and row counts must match
    assert(plan.contains("PartitionFilters") &&
           plan.contains("o_orderstatus"), plan.take(2000))
    val expected = Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F").count()
    assert(pruned.count() == expected)
  }

  test("predicate + projection pushdown reach the parquet scan") {
    val q = Tables.load(spark, dir, "orders")
      .filter(col("o_totalprice") > 100000.0)
      .select("o_orderkey", "o_totalprice")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") &&
           scan.contains("GreaterThan(o_totalprice"), scan.take(2000))
    assert(scan.contains("ReadSchema") &&
           !scan.contains("o_comment"), "projection must prune unused columns")
  }
}
