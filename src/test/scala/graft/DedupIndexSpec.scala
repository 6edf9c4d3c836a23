package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Dedup
import graft.sources.DedupIndex

/** Contracts for the persisted dedup index (round-12: the
  * stored-artifact form of the shared LSH pair relation):
  *
  *   1. stored pairs == `Dedup.lshCandidatePairs` over the same corpus
  *      (build-then-read changes the storage, never the relation — the
  *      property that keeps every downstream oracle hash unchanged);
  *   2. the manifest epoch detects any corpus change (id add, content
  *      change) and accepts the exact build corpus;
  *   3. `pairsWithDelta` == a full rebuild over
  *      (stored ∖ shadowed ids) ∪ delta — the delta-proportional read
  *      path with newest-segment-wins shadowing.
  */
class DedupIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs(seed: Long, nDocs: Int, idOffset: Long = 0L): DataFrame = {
    val r = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    (0L until nDocs.toLong).map { i =>
      val len = 5 + r.nextInt(12)
      // duplicate-heavy: half the docs repeat one of 8 templates
      val words =
        if (i % 2 == 0) Seq.fill(10)(vocab(((i / 2) % 8).toInt))
        else Seq.fill(len)(vocab(r.nextInt(vocab.size)))
      (i + idOffset, words.mkString(" "))
    }.toDF("doc_id", "text")
  }

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"dedupidx_$tag").toString

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet

  test("stored pairs equal the in-session pair relation") {
    val d = docs(3L, 150)
    val path = tmp("eq")
    DedupIndex.build(d, "doc_id", "text", path)
    val want = pairSet(Dedup.lshCandidatePairs(d, "doc_id", "text", 3, 16, 4))
    val got = pairSet(DedupIndex.pairs(spark, path))
    assert(want.nonEmpty, "fixture must produce candidate pairs")
    assert(got == want)
  }

  test("manifest epoch: fresh on the build corpus, stale on any change") {
    val d = docs(5L, 80)
    val path = tmp("fresh")
    DedupIndex.build(d, "doc_id", "text", path)
    assert(DedupIndex.isFresh(d, "doc_id", "text", path))
    // content change on one doc flips the epoch
    val changed = d.withColumn("text",
      when(col("doc_id") === 4L, lit("completely new words here"))
        .otherwise(col("text")))
    assert(!DedupIndex.isFresh(changed, "doc_id", "text", path))
    // an added doc flips it too
    assert(!DedupIndex.isFresh(
      d.unionByName(Seq((9999L, "tail doc")).toDF("doc_id", "text")),
      "doc_id", "text", path))
  }

  test("pairsWithDelta refuses a delta with duplicate ids (round-13: " +
       "no defined newest-wins order WITHIN one delta)") {
    val d = docs(11L, 60)
    val path = tmp("dupdelta")
    DedupIndex.build(d, "doc_id", "text", path)
    val delta = Seq((7L, "alpha beta gamma delta"),
                    (7L, "alpha beta gamma zeta"),
                    (500L, "eta theta iota kappa"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      DedupIndex.pairsWithDelta(spark, path, delta, "doc_id", "text")
    }
    assert(e.getMessage.contains("multiple rows"),
      s"error must name the duplicate-id precondition: ${e.getMessage}")
    // and the collapsed form of the same delta goes through
    val ok = delta.groupBy("doc_id").agg(max("text").as("text"))
    DedupIndex.pairsWithDelta(spark, path, ok, "doc_id", "text").count()
  }

  test("pairsWithDelta == full rebuild over (stored \\ shadowed) + delta") {
    val main = docs(7L, 120)
    val path = tmp("delta")
    DedupIndex.build(main, "doc_id", "text", path)
    // delta: 30 new docs + re-deliveries of ids 0..9 with CHANGED text
    val delta = docs(11L, 30, idOffset = 1000L)
      .unionByName(docs(13L, 10).withColumn("text",
        concat(col("text"), lit(" deltamarker deltamarker deltamarker"))))
    val got = pairSet(DedupIndex.pairsWithDelta(
      spark, path, delta, "doc_id", "text"))
    val current = main.join(delta.select("doc_id"), Seq("doc_id"),
        "left_anti").unionByName(delta)
    val want = pairSet(
      Dedup.lshCandidatePairs(current, "doc_id", "text", 3, 16, 4))
    assert(want.nonEmpty)
    assert(got == want)
  }
}
