package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Similarity}

/** Bit-compatibility pin for the round-15 HyperplaneBuckets kernel:
  * the compiled per-row expression must reproduce the previous
  * posexplode⋈planeDf→double-groupBy aggregate formulation exactly —
  * including the md5-derived weights, Spark-round quantization, sign
  * bits, and per-band bit packing — on real fixture vectors and on
  * null/short edge vectors the fixture lacks. */
class HyperplaneBucketsSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-round-15 DataFrame formulation, verbatim. */
  private def aggregateForm(emb: DataFrame, planes: Int, bands: Int): DataFrame = {
    val dims = 64
    val planeDf = broadcast(
      (for (p <- 0 until planes * bands; d <- 0 until dims) yield (p, d))
        .toDF("p", "d")
        .withColumn("w",
          Dedup.md5Hash60(concat_ws("_", col("p"), col("d"))) % 2001 - 1000))
    val quantized = emb.select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("d", "x")))
      .withColumn("q", round(col("x").cast("double") * 1000).cast("long"))
    quantized.join(planeDf, "d")
      .groupBy(col("vec_id"), col("p"))
      .agg(sum(col("q") * col("w")).as("dot"))
      .select(col("vec_id"), expr(s"p div $planes").as("band"),
              col("p"), when(col("dot") > 0, 1L).otherwise(0L).as("bit"))
      .groupBy("vec_id", "band")
      .agg(expr(s"sum(shiftleft(bit, cast(p % $planes as int))) AS bucket"))
  }

  private def collect(df: DataFrame): Map[(Long, Long), Long] =
    df.select(col("vec_id").cast("long"), col("band").cast("long"),
        col("bucket").cast("long"))
      .as[(Long, Long, Long)].collect()
      .map { case (v, b, k) => (v, b) -> k }.toMap

  test("kernel matches the aggregate formulation on fixture embeddings") {
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val kernel = collect(Similarity.hyperplaneLshBuckets(emb, 16, 4))
    val agg = collect(aggregateForm(emb, 16, 4))
    assert(kernel.size == agg.size && kernel == agg)
    // different geometry too (8 planes × 2 bands)
    val k2 = collect(Similarity.hyperplaneLshBuckets(emb.limit(50), 8, 2))
    val a2 = collect(aggregateForm(emb.limit(50), 8, 2))
    assert(k2 == a2)
  }

  test("kernel matches on null-element and short vectors (sum-skips-nulls)") {
    val rows = Seq(
      (1L, Seq[java.lang.Float](1.0f, -2.0f, null, 0.0015f) ++
        Seq.fill[java.lang.Float](60)(0.5f)),
      (2L, Seq[java.lang.Float](0.4999f, -0.0005f)), // short vector
      (3L, Seq.fill[java.lang.Float](64)(null))      // all-null
    ).toDF("vec_id", "embedding")
    val kernel = collect(Similarity.hyperplaneLshBuckets(rows, 16, 4))
    val agg = collect(aggregateForm(rows, 16, 4))
    assert(kernel == agg)
  }

  test("plan is a single projection — no joins, no aggregation") {
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val plan = Similarity.hyperplaneLshBuckets(emb, 16, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("HashAggregate"),
      s"expected a pure per-row plan:\n$plan")
  }
}
