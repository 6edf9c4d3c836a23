package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Dedup

/** Batch cross-run incremental near-dedup
  * ([[graft.functions.Dedup.incrementalNearDup]]): the nightly-delivery
  * composition of the per-doc band-signature table with the KeyedUpsert
  * store. Pins (a) the delta-vs-union equivalence — pairs emitted
  * across deliveries union to exactly the one-shot batch LSH pair set,
  * for several split shapes; (b) delta-only emission — a delivery
  * touching nothing near-duplicate emits nothing; (c) re-delivery
  * semantics — an updated document is re-bucketed under its NEW text.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def tmpStore(): String =
    java.nio.file.Files.createTempDirectory("graft-incr").toString + "/store"

  // small corpus with known near-dup structure: template families
  // share almost all 3-shingles; singletons share none
  private def corpus(): DataFrame = {
    val fam = (id: Long, salt: String) =>
      (id, s"the quick brown fox jumps over the lazy dog again and again $salt")
    val solo = (id: Long, seed: Long) =>
      (id, (0 until 12).map(j => s"w${seed * 31 + j * 7}").mkString(" "))
    (Seq(fam(1, "alpha"), fam(2, "alpha"), fam(3, "beta"),
         solo(4, 100), solo(5, 200), fam(6, "alpha"), solo(7, 300))
      ).toDF("doc_id", "text")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

  private def runDeliveries(docs: DataFrame, store: String,
                            splits: Seq[DataFrame]): Set[(Long, Long)] =
    splits.map(d => pairSet(
      Dedup.incrementalNearDup(spark, store, d, "doc_id", "text", 3, 8, 4))
    ).reduce(_ union _)

  test("delta-vs-union equivalence across split shapes") {
    val docs = corpus()
    val batch = pairSet(
      Dedup.lshCandidatePairs(docs, "doc_id", "text", 3, 8, 4))
    assert(batch.nonEmpty, "fixture must contain near-dups")
    // three split shapes: round-robin, contiguous halves, one-by-one
    val shapes = Seq(
      (0 until 3).map(t => docs.filter(pmod(col("doc_id"), lit(3)) === t)),
      Seq(docs.filter(col("doc_id") <= 3), docs.filter(col("doc_id") > 3)),
      (1L to 7L).map(i => docs.filter(col("doc_id") === i)))
    shapes.zipWithIndex.foreach { case (splits, i) =>
      val got = runDeliveries(docs, tmpStore(), splits)
      assert(got == batch, s"split shape $i: $got != batch $batch")
    }
  }

  test("a delivery with no near-dups emits nothing; store still grows") {
    val store = tmpStore()
    val docs = corpus()
    val d1 = Dedup.incrementalNearDup(spark, store,
      docs.filter(col("doc_id").isin(1L, 4L)), "doc_id", "text", 3, 8, 4)
    assert(d1.count() == 0)
    // the lone template doc is in the store: its twin arriving later
    // must pair against it without rescanning delivery-1 text
    val d2 = Dedup.incrementalNearDup(spark, store,
      docs.filter(col("doc_id") === 2L), "doc_id", "text", 3, 8, 4)
    assert(pairSet(d2) == Set((1L, 2L)))
  }

  test("re-delivered doc is re-bucketed under its NEW text") {
    val store = tmpStore()
    val docs = corpus()
    Dedup.incrementalNearDup(spark, store,
      docs.filter(col("doc_id").isin(1L, 2L, 4L)),
      "doc_id", "text", 3, 8, 4)
    // doc 2 re-delivered as a copy of solo doc 4's text: it must STOP
    // pairing with 1 and START pairing with 4
    val newText = corpus().filter(col("doc_id") === 4L)
      .select("text").as[String].head()
    val redelivered = Seq((2L, newText)).toDF("doc_id", "text")
    val got = pairSet(Dedup.incrementalNearDup(spark, store, redelivered,
      "doc_id", "text", 3, 8, 4))
    assert(got == Set((2L, 4L)), s"got $got")
    // and the store now holds exactly one signature row per doc
    val sigs = graft.sources.KeyedUpsert.read(spark, store)
    assert(sigs.count() == 3 &&
      sigs.select("doc_id").distinct().count() == 3)
  }

  test("re-delivery with unsignable text CLEARS the old signatures") {
    val store = tmpStore()
    val docs = corpus()
    Dedup.incrementalNearDup(spark, store,
      docs.filter(col("doc_id") === 1L), "doc_id", "text", 3, 8, 4)
    // doc 1 re-delivered with text too short to shingle: its store row
    // must be REPLACED with an empty signature set, not left stale
    val redelivered = Seq((1L, "nope")).toDF("doc_id", "text")
    Dedup.incrementalNearDup(spark, store, redelivered,
      "doc_id", "text", 3, 8, 4)
    // its template twin arriving later must find NO partner
    val d3 = Dedup.incrementalNearDup(spark, store,
      docs.filter(col("doc_id") === 2L), "doc_id", "text", 3, 8, 4)
    assert(d3.count() == 0,
      "twin paired against signatures of text that no longer exists")
    val sigs = graft.sources.KeyedUpsert.read(spark, store)
      .as[(Long, Seq[String])].collect().toMap
    assert(sigs(1L).isEmpty && sigs(2L).nonEmpty)
  }
}
