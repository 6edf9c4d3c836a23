package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Dedup

/** Differential contract for the containment carry-through
  * formulation: [[Dedup.containmentPairs]] (pinned rare-gram relation
  * with per-doc sizes carried on every row, UNORDERED `<` self-join,
  * one pair-count aggregate with the sizes riding through as
  * `first()`, per-direction threshold applied BEFORE the two-direction
  * expansion) must emit EXACTLY the rows of the original join
  * formulation ([[Dedup.containmentPairsJoin]]: window df, directed
  * posting self-join, doc-sized size table joined back post-agg) —
  * same stopgram drop, same directed emission, same integer ppm
  * surface. (An in-task flatMapGroups kernel was built, measured
  * slower — 87 s vs 31.8 s at sf10 — and rejected; the shipped form
  * is the declarative join, see Dedup.scala.) Randomized text so gram
  * collisions, the df cap, and the threshold all exercise. */
class ContainmentKernelSpec extends SparkSpec {
  import spark.implicits._

  private def randomDocs(seed: Long, nDocs: Int): org.apache.spark.sql.DataFrame = {
    val r = new scala.util.Random(seed)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta", "iota", "kappa")
    (0L until nDocs.toLong).map { i =>
      val len = 6 + r.nextInt(20)
      (i, Seq.fill(len)(vocab(r.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("kernel matches the join form on random data (all thresholds)") {
    val docs = randomDocs(7L, 120)
    for (thr <- Seq(0L, 300000L, 600000L); maxDf <- Seq(5, 30)) {
      val got = Dedup.containmentPairs(docs, "doc_id", "text", 3, thr, maxDf)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val want = Dedup.containmentPairsJoin(docs, "doc_id", "text", 3, thr, maxDf)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      assert(want.nonEmpty, s"fixture must produce pairs at thr=$thr maxDf=$maxDf")
      assert(got == want, s"kernel/join divergence at thr=$thr maxDf=$maxDf")
    }
  }

  test("stopgrams drop without buffering the hub posting list") {
    // one gram shared by every doc (df = 40 > maxDf = 3) contributes
    // nothing — neither pairs nor sizes; the rare tail still pairs
    val docs = (0L until 40L).map { i =>
      (i, s"common stop gram unique${i}a unique${i}b unique${i}c" +
        (if (i < 2) " rare shared tail" else ""))
    }.toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0L, 3)
      .as[(Long, Long, Long, Long, Long)].collect()
    val want = Dedup.containmentPairsJoin(docs, "doc_id", "text", 3, 0L, 3)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.toSet == want.toSet)
    // docs 0 and 1 share 'rare shared tail' grams; both directions out
    assert(got.exists(r => r._1 == 0L && r._2 == 1L))
    assert(got.exists(r => r._1 == 1L && r._2 == 0L))
  }

  test("full-quote asymmetry survives the kernel") {
    val quote = "the quick brown fox jumps over the lazy dog again today"
    val docs = Seq(
      (1L, quote),
      (2L, s"preamble words here $quote and a much longer suffix " +
        "with many extra tokens stretching the long document further")
    ).toDF("doc_id", "text")
    val rows = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0L, 50)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._5).toMap
    // short ⊂ long: containment of 1 in 2 is ~1e6; reverse is diluted
    assert(rows((1L, 2L)) == 1000000L)
    assert(rows((2L, 1L)) < 1000000L)
  }
}
