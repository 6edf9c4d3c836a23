package graft

import org.apache.spark.sql.functions._

import graft.operators.CoOccurrence

/** Differential contract for the round-12 co-occurrence rewrite: the
  * packed-BIGINT pair path (integral items) and the posting-join path
  * (generic items) must emit exactly the same weighted edges as each
  * other — and as the struct-HOF form they replaced, reproduced
  * inline here as the naive baseline. Plus the loud-guard contracts:
  * out-of-range integral ids fail naming [[CoOccurrence
  * .weightedGeneric]]; string items route through the generic path
  * and work. */
class CoOccurPackSpec extends SparkSpec {
  import spark.implicits._

  private def baskets(seed: Long, n: Int) = {
    val r = new scala.util.Random(seed)
    (0 until n).map { i =>
      (r.nextInt(40).toLong, r.nextInt(25).toLong)
    }.toDF("basket", "item")
  }

  /** The pre-round-12 struct-HOF formulation, kept as the baseline. */
  private def structForm(items: org.apache.spark.sql.DataFrame) =
    CoOccurrence.sets(items, "basket", "item")
      .select(explode(expr(
        "flatten(transform(items, (x, i) -> " +
        "transform(slice(items, i + 2, size(items)), " +
        "y -> named_struct('u', x, 'v', y))))")).as("p"))
      .groupBy(col("p.u").as("u"), col("p.v").as("v"))
      .agg(count(lit(1)).as("w"))

  private def edgeSet(df: org.apache.spark.sql.DataFrame) =
    df.select("u", "v", "w").as[(Long, Long, Long)].collect().toSet

  test("packed == generic == struct baseline on random baskets") {
    val items = baskets(5L, 600)
    val want = edgeSet(structForm(items))
    assert(want.nonEmpty)
    assert(edgeSet(CoOccurrence.weighted(items, "basket", "item")) == want)
    assert(edgeSet(
      CoOccurrence.weightedGeneric(items, "basket", "item")) == want)
  }

  test("packed path keeps the input item type") {
    val items = baskets(7L, 100)
      .withColumn("item", col("item").cast("int"))
    val out = CoOccurrence.weighted(items, "basket", "item")
    assert(out.schema("u").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(out.schema("v").dataType ==
      org.apache.spark.sql.types.IntegerType)
  }

  test("out-of-range integral ids fail loudly, naming the fallback") {
    val items = Seq((1L, -5L), (1L, 3L), (2L, 4L), (2L, 9L))
      .toDF("basket", "item")
    val e = intercept[Exception] {
      CoOccurrence.weighted(items, "basket", "item").collect()
    }
    assert(e.getMessage.contains("weightedGeneric"),
      s"guard message must name the fallback: ${e.getMessage}")
    // the generic path handles the same ids fine
    val ok = edgeSet(CoOccurrence.weightedGeneric(items, "basket", "item"))
    assert(ok == Set((-5L, 3L, 1L), (4L, 9L, 1L)))
  }

  test("string items take the concat path and match the generic join") {
    val items = Seq((1L, "a x"), (1L, "b,y"), (2L, "a x"), (2L, "b,y"),
        (2L, "c")).toDF("basket", "item")
    val got = CoOccurrence.weighted(items, "basket", "item")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(("a x", "b,y", 2L), ("a x", "c", 1L), ("b,y", "c", 1L)))
    val gen = CoOccurrence
      .weightedGeneric(items, "basket", "item")
      .as[(String, String, Long)].collect().toSet
    assert(got == gen)
  }

  test("a NUL inside an item string fails loudly, naming the fallback") {
    val items = Seq((1L, "a"), (1L, "b\u0000c")).toDF("basket", "item")
    val e = intercept[Exception] {
      CoOccurrence.weighted(items, "basket", "item").collect()
    }
    assert(e.getMessage.contains("weightedGeneric"))
  }

  test("hub-basket guard still fires on the packed path") {
    val items = (0 until 50).map(i => (1L, i.toLong)).toDF("basket", "item")
    val e = intercept[Exception] {
      CoOccurrence.weighted(items, "basket", "item", maxBasket = 10).collect()
    }
    assert(e.getMessage.contains("bound or pre-filter hub baskets"))
  }
}
