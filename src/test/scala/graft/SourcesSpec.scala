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

  test("JSON schema inference from raw doc strings (reference S5 pattern)") {
    // the reference feeds ES hits as JSON strings into read.json and
    // relies on inference (HouseholdRetentionProcessing.scala:406,:471)
    val jsons = Seq(
      """{"_metadata": {"_id": "e1", "_parent": "p1"}, "admit_date": 1500000000000}""",
      """{"_metadata": {"_id": "e2", "_parent": "p2"}, "admit_date": 1500003600000}""")
      .toDS()
    val inferred = spark.read.json(jsons)
    val out = inferred.select(
        col("_metadata._id").as("encounter_id"),
        col("_metadata._parent").as("person_id"),
        col("admit_date").cast("long").as("admit_date_ts"))
      .as[(String, String, Long)].collect().toSet
    assert(out == Set(("e1", "p1", 1500000000000L),
                      ("e2", "p2", 1500003600000L)))
    // the scale-correct form: explicit schema via from_json — no
    // inference pass over the data
    val explicit = jsons.toDF("raw")
      .select(from_json(col("raw"), inferred.schema).as("j"))
      .select(col("j._metadata._id").as("encounter_id"),
              col("j._metadata._parent").as("person_id"),
              col("j.admit_date").cast("long").as("admit_date_ts"))
      .as[(String, String, Long)].collect().toSet
    assert(explicit == out)
  }

  test("malformed JSON: PERMISSIVE quarantines, FAILFAST raises") {
    // ingest reality at scale: a bad record must never silently vanish
    // (PERMISSIVE + _corrupt_record quarantines it for a dead-letter
    // path) and strict pipelines must be able to refuse it outright
    import org.apache.spark.sql.types._
    val lines = Seq("""{"id": 1, "v": "ok"}""", """{"id": oops not json""",
                    """{"id": 3, "v": "fine"}""").toDS()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType),
      StructField("_corrupt_record", StringType)))
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(lines)
    val (good, bad) = (permissive.filter(col("_corrupt_record").isNull),
                       permissive.filter(col("_corrupt_record").isNotNull))
    assert(good.select("id").as[Long].collect().toSet == Set(1L, 3L))
    assert(bad.count() == 1)
    intercept[org.apache.spark.SparkException] {
      spark.read.schema(StructType(schema.take(2)))
        .option("mode", "FAILFAST").json(lines).collect()
    }
  }

  test("parquet schema evolution: mergeSchema unifies old and new files") {
    val out = Files.createTempDirectory("evolve").toString + "/t"
    Seq((1L, "a")).toDF("id", "v").write.parquet(out + "/p=1")
    Seq((2L, "b", 9.5)).toDF("id", "v", "score").write.parquet(out + "/p=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert(merged.columns.toSet == Set("id", "v", "score", "p"))
    val rows = merged.select("id", "score").as[(Long, Option[Double])]
      .collect().toMap
    assert(rows(1L).isEmpty && rows(2L).contains(9.5)) // old files → null
  }

  test("seeded sampling is deterministic and stratified fractions hold") {
    val orders = Tables.load(spark, dir, "orders")
    val s1 = orders.sample(withReplacement = false, 0.2, seed = 7)
      .select("o_orderkey").as[Long].collect().toSet
    val s2 = orders.sample(withReplacement = false, 0.2, seed = 7)
      .select("o_orderkey").as[Long].collect().toSet
    assert(s1 == s2 && s1.nonEmpty)          // same seed → same rows
    val n = orders.count().toDouble
    assert(math.abs(s1.size / n - 0.2) < 0.05)
    // stratified: per-status fractions
    val frac = Map("F" -> 0.5, "O" -> 0.1, "P" -> 1.0)
    val strat = orders.stat.sampleBy("o_orderstatus", frac, 11L)
      .groupBy("o_orderstatus").count().as[(String, Long)].collect().toMap
    val base = orders.groupBy("o_orderstatus").count()
      .as[(String, Long)].collect().toMap
    frac.foreach { case (k, f) =>
      assert(math.abs(strat(k).toDouble / base(k) - f) < 0.08, k)
    }
  }

  test("range-clustered layout enables row-group (zone-map) pruning") {
    // same data, two layouts; a selective date filter must read far
    // fewer rows from the range-clustered files (parquet min/max
    // skipping), which is the entire point of write-time clustering
    val orders = Tables.load(spark, dir, "orders")
    val base = Files.createTempDirectory("layout").toString
    orders.repartition(8).write.parquet(base + "/random")
    orders.repartitionByRange(8, col("o_orderkey"))
      .sortWithinPartitions("o_orderkey")
      .write.parquet(base + "/clustered")
    def rowsRead(path: String): Long = {
      val df = spark.read.parquet(path)
        .filter(col("o_orderkey").between(1000L, 1200L))
      df.collect()
      // scan output = rows DECODED (row groups that survived min/max
      // skipping), not rows matching — the layout difference shows here
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics("numOutputRows").value).sum
    }
    val (rnd, clu) = (rowsRead(base + "/random"), rowsRead(base + "/clustered"))
    assert(clu < rnd / 2, s"clustered=$clu random=$rnd")
  }

  test("z-order layout prunes on BOTH dimensions; row sets unchanged") {
    import graft.sources.ZOrderLayout
    val orders = Tables.load(spark, dir, "orders")
    val base = Files.createTempDirectory("zorder").toString
    ZOrderLayout.write(orders, Seq("o_custkey", "o_orderkey"),
      base + "/z", nFiles = 16, bits = 6)
    orders.repartition(16).write.parquet(base + "/random")
    def decoded(path: String, filter: org.apache.spark.sql.Column): Long = {
      val df = spark.read.parquet(path).filter(filter)
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics("numOutputRows").value).sum
    }
    // selective filters on EITHER layout column must decode fewer rows
    // than the random layout
    for (f <- Seq(col("o_custkey").between(10L, 40L),
                  col("o_orderkey").between(100L, 400L))) {
      val (z, r) = (decoded(base + "/z", f), decoded(base + "/random", f))
      assert(z < r, s"filter $f: zorder=$z random=$r")
      // correctness: identical row sets either way
      assert(spark.read.parquet(base + "/z").filter(f)
               .select("o_orderkey").as[Long].collect().toSet ==
             spark.read.parquet(base + "/random").filter(f)
               .select("o_orderkey").as[Long].collect().toSet)
    }
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

  // The events fixture has shipped ts BOTH as TIMESTAMP(NANOS)
  // (nanosAsLong -> LongType) and as timestamp[us] across rounds; the
  // loader must yield the identical ts_ns/ts contract for either
  // encoding (round-5 regression: the long-only assumption crashed all
  // 58 events-table queries when the fixture switched to micros).
  test("events ts normalization is encoding-independent") {
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val real = Tables.events(spark, dir)
    assert(real.schema("ts_ns").dataType == LongType)
    assert(real.schema("ts").dataType == TimestampType)
    // µs truncation contract: nanos are a whole multiple of 1000 and
    // agree with the timestamp column exactly
    assert(real.filter(expr("ts_ns % 1000 != 0")).count() == 0)
    assert(real.filter(expr("unix_micros(ts) * 1000 != ts_ns")).count() == 0)

    // legacy path: re-encode the same rows as epoch-nanos longs and
    // assert the normalized frames are row-identical
    val tmp = Files.createTempDirectory("ev_long").toString + "/events"
    real.select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"), col("ts_ns").as("ts"))
      .write.mode("overwrite").parquet(tmp)
    val legacy = Tables.normalizeEvents(spark.read.parquet(tmp))
    assert(legacy.schema("ts_ns").dataType == LongType)
    assert(legacy.schema("ts").dataType == TimestampType)
    val a = real.select("event_id", "ts_ns", "ts")
    val b = legacy.select("event_id", "ts_ns", "ts")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }
}
