package graft

import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Similarity}

/** Hub guards on the two quadratic candidate generators: both are
  * equi-join blocked (label block / simhash band bucket), which keeps
  * them off all-pairs — but pair generation inside one block is still
  * O(|block|²), and a hub block at 100 TB is a silent quadratic
  * blow-up hours into a run. Contract (the CoOccurrence guard shape):
  * pass untouched at the bound, fail LOUDLY with a diagnostic above
  * it — never truncate silently. */
class HubGuardSpec extends SparkSpec {
  import spark.implicits._

  private def hubbed(e: => Unit, marker: String): Unit = {
    val ex = intercept[Exception](e)
    def msgs(t: Throwable): Iterator[String] =
      Iterator.iterate[Throwable](t)(_.getCause).takeWhile(_ != null)
        .map(x => String.valueOf(x.getMessage))
    assert(msgs(ex).exists(_.contains(marker)),
      s"expected '$marker' diagnostic, got: ${ex.getMessage}")
  }

  // 6 vectors on label "hot", 2 elsewhere — hot block has 6 members
  private lazy val emb = ((0L until 6L).map(i =>
      (i, "hot", Array.fill(8)(i.toFloat / 10 + 0.1f))) ++
    Seq((6L, "a", Array.fill(8)(0.5f)), (7L, "b", Array.fill(8)(0.9f))))
    .toDF("vec_id", "label", "embedding")

  test("labelBlockedNearDup passes at the block bound") {
    assert(Similarity.labelBlockedNearDup(emb, 0.0, maxBlock = 6)
      .count() == 15) // C(6,2) hot pairs, all cos > 0
  }

  test("labelBlockedNearDup fails loudly one above the bound") {
    hubbed(Similarity.labelBlockedNearDup(emb, 0.0, maxBlock = 5).count(),
      "labelBlockedNearDup")
  }

  test("semanticDedup threads the guard through") {
    // bounded run dedups the hot block down to its min id
    val kept = Similarity.semanticDedup(emb, 0.9999, maxBlock = 6)
    assert(kept.count() >= 1)
    hubbed(Similarity.semanticDedup(emb, 0.9999, maxBlock = 5).count(),
      "labelBlockedNearDup")
  }

  // identical docs: every signature equal → each band bucket holds all 7
  private lazy val docs = (0L until 7L)
    .map(i => (i, "spark window stream shuffle partition"))
    .toDF("doc_id", "text")

  test("simhashPairs passes at the bucket bound") {
    assert(Dedup.simhashPairs(docs, "doc_id", "text", 12, maxBucket = 7)
      .count() == 21) // C(7,2), hamming 0
  }

  test("simhashPairs fails loudly one above the bucket bound") {
    hubbed(Dedup.simhashPairs(docs, "doc_id", "text", 12,
      maxBucket = 6).count(), "simhashPairs")
  }
}
