package graft

import graft.functions.Bpe

/** Pins the BPE trainer's exact semantics on hand-traced corpora:
  * frequency-weighted pair counts, deterministic (count desc, pair
  * asc) argmax, and greedy LEFT-TO-RIGHT NON-OVERLAPPING merges — the
  * "aaaa" case is the one a naive all-occurrences replace gets wrong.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("hand-traced 3-round merge sequence") {
    // words: "aaa"×2, "ab"×3  (one doc per word occurrence)
    val docs = (Seq.fill(2)("aaa") ++ Seq.fill(3)("ab")).toDF("text")
    val merges = Bpe.train(docs, "text", 3)
      .orderBy("round").as[(Int, String, Long)].collect().toSeq
    // r0: "a a" appears twice per "aaa" (overlapping COUNT) → 4 > "a b"=3
    // r0 merge is greedy non-overlapping: "a a a" → "aa a"
    // r1: "a b"=3 beats "aa a"=2;  r2: "aa a"=2 remains
    assert(merges == Seq((0, "a a", 4L), (1, "a b", 3L), (2, "aa a", 2L)))
    val vocab = Bpe.vocab(docs, "text", 3)
      .as[(String, Long)].collect().toMap
    assert(vocab == Map("aaa" -> 2L, "ab" -> 3L))
  }

  test("greedy left-to-right: aaaa merges to (aa)(aa), not a(aa)a") {
    val docs = Seq("aaaa").toDF("text")
    val m = Bpe.train(docs, "text", 2)
      .orderBy("round").as[(Int, String, Long)].collect().toSeq
    // r0: pair "a a" counted at every adjacency (3), merged greedily
    // into "aa aa"; r1's top pair is therefore "aa aa"
    assert(m == Seq((0, "a a", 3L), (1, "aa aa", 1L)))
  }

  test("encode applies the trained merges per word") {
    val docs = (Seq.fill(2)("aaa") ++ Seq.fill(3)("ab")).toDF("text")
      .withColumn("doc_id",
        org.apache.spark.sql.functions.monotonically_increasing_id())
    // after 1 round (merge "a a"): aaa -> [aa, a], ab -> [a, b]
    val enc1 = Bpe.encode(docs, "doc_id", "text", 1)
      .select("n_words", "n_subwords").as[(Long, Long)].collect().toSeq
    assert(enc1.forall(_ == ((1L, 2L))))
    // after 3 rounds both words are single symbols
    val enc3 = Bpe.encode(docs, "doc_id", "text", 3)
      .select("n_words", "n_subwords").as[(Long, Long)].collect().toSeq
    assert(enc3.forall(_ == ((1L, 1L))))
  }

  test("tie-break is lexicographic on the pair") {
    val docs = Seq("xy", "ab").toDF("text") // both pairs count 1
    val m = Bpe.train(docs, "text", 1).as[(Int, String, Long)].collect()
    assert(m.toSeq == Seq((0, "a b", 1L)))
  }

  test("vocabulary exhausted before `rounds`: later rounds are no-ops") {
    // 'ab' fully merges in round 0; rounds 1-2 have NO adjacent pairs.
    // The empty argmax must leave the word table unchanged — the old
    // crossJoin formulation annihilated it (vocab/encode returned zero
    // rows, and the oracle's CROSS JOIN collapsed identically, so only
    // this spec can catch the class)
    val docs = Seq("ab").toDF("text")
    val merges = Bpe.train(docs, "text", 3).as[(Int, String, Long)].collect()
    assert(merges.toSeq == Seq((0, "a b", 1L)), "only one merge possible")
    val vocab = Bpe.vocab(docs, "text", 3).as[(String, Long)].collect().toMap
    assert(vocab == Map("ab" -> 1L))
    val enc = Bpe.encode(
      docs.withColumn("doc_id", org.apache.spark.sql.functions.lit(0L)),
      "doc_id", "text", 3)
      .select("n_words", "n_subwords").as[(Long, Long)].collect().toSeq
    assert(enc == Seq((1L, 1L)))
  }
}
