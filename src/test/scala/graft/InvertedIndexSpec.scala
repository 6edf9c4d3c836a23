package graft

import org.apache.spark.sql.functions._

import graft.functions.{InvertedIndex, Similarity}

/** Inverted-index build/search and the exact k-NN self-join. */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "Spark streams data"),
    (2L, "spark SPARK spark"),          // tf 3, one doc
    (3L, "data data lakes"),
    (4L, ""),                          // empty → no postings
    (5L, "spark-data; spark!! data")   // punctuation folds away
  ).toDF("doc_id", "text")

  test("index rolls up df / tf_total / sorted posting list") {
    val idx = InvertedIndex.index(docs, "doc_id", "text")
      .as[(String, Long, Long, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(idx("spark") == ((3L, 6L, "1,2,5")))
    assert(idx("data") == ((3L, 5L, "1,3,5")))
    assert(idx("lakes") == ((1L, 1L, "3")))
    assert(!idx.contains(""))
  }

  test("maxDf caps stopword-grade terms out of the index") {
    val idx = InvertedIndex.index(docs, "doc_id", "text", minDf = 1, maxDf = 2)
      .select("term").as[String].collect().toSet
    assert(idx == Set("streams", "lakes"))
  }

  test("conjunctive search equals the brute-force text filter") {
    val viaIndex = InvertedIndex
      .searchAll(docs, "doc_id", "text", Seq("spark", "data"))
      .select("doc_id").as[Long].collect().toSet
    val brute = docs.filter(
        array_contains(InvertedIndex.termsOf($"text"), "spark") &&
        array_contains(InvertedIndex.termsOf($"text"), "data"))
      .select("doc_id").as[Long].collect().toSet
    assert(viaIndex == brute && viaIndex == Set(1L, 5L))
  }

  test("phrase search finds exact consecutive sequences only") {
    val d = Seq(
      (1L, "big data lake house"),
      (2L, "data big lake"),          // both terms, wrong order
      (3L, "big, DATA!"),             // punctuation/case folds away
      (4L, "big x data"),             // not consecutive
      (5L, "big big data")            // repeated prefix still matches
    ).toDF("doc_id", "text")
    val hits = InvertedIndex.phraseSearch(d, "doc_id", "text",
        Seq("big", "data")).select("doc_id").as[Long].collect().toSet
    assert(hits == Set(1L, 3L, 5L))
    val rep = InvertedIndex.phraseSearch(d, "doc_id", "text",
        Seq("big", "big")).select("doc_id").as[Long].collect().toSet
    assert(rep == Set(5L), "repeated-term phrase needs ADJACENT repeats")
  }

  test("ranked search orders by the exact integer tf-idf surface") {
    val d = Seq(
      (1L, "spark spark spark rare"),  // high tf on a common term
      (2L, "rare"),                    // rare term only
      (3L, "spark rare"),
      (4L, "nothing relevant here")
    ).toDF("doc_id", "text")
    val out = InvertedIndex.rankedSearch(d, "doc_id", "text",
        Seq("spark", "rare"), 10)
      .as[(Long, Long, Long)].collect().toSeq
    // df(spark)=2, df(rare)=3 ⇒ scores: d1 = 3·1e6/2 + 1e6/3,
    // d3 = 1e6/2 + 1e6/3, d2 = 1e6/3; d4 absent
    assert(out.map(_._1) == Seq(1L, 3L, 2L))
    assert(out.map(_._3) == Seq(2L, 2L, 1L))
    assert(out(0)._2 == 3L * 1000000 / 2 + 1000000 / 3)
  }

  test("knnJoin matches brute-force cosine ranking (composed HOF path)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(60).cache()
    val fused = Similarity.knnJoin(emb, 2)
      .select("vec_id", "neighbor_id", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    // independent formulation: portable HOF cosine + window rank
    val a = emb.select($"vec_id", $"embedding")
    val b = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("ne"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id").orderBy($"cos".desc, $"neighbor_id")
    val brute = a.join(b, $"vec_id" =!= $"neighbor_id")
      .select($"vec_id", $"neighbor_id",
              round(Similarity.cosine($"embedding", $"ne"), 6).as("cos"))
      .withColumn("rank", row_number().over(w)).filter($"rank" <= 2)
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(fused == brute)
  }

  test("knnJoin emits exactly k neighbors per vector") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .limit(30)
    val counts = Similarity.knnJoin(emb, 3)
      .groupBy("vec_id").count().select("count").as[Long].collect()
    assert(counts.nonEmpty && counts.forall(_ == 3L))
  }

  test("bm25 reproduces the integer formula on a hand fixture and " +
       "rewards shorter docs and rarer terms") {
    // corpus: tot = 3+3+3+3 = 12 tokens over nd = 4 docs -> S = 3000
    val corpus = Seq(
      (1L, "spark data lake"),          // hit tf=1, dl=3
      (2L, "spark spark spark"),        // hit tf=3, dl=3 (saturation)
      (3L, "spark among many other words extra pad pad pad"), // dl=9
      (4L, "data data data")            // no hit
    ).toDF("doc_id", "text")
    val got = InvertedIndex.bm25Search(corpus, "doc_id", "text",
        Seq("spark"), 10)
      .select("doc_id", "score_micro", "n_terms")
      .as[(Long, Long, Long)].collect().toList
    // corpus stats: tot=18 tokens (3+3+9+3), S = 18000/4 div = 4500
    def sat(tf: Long, dl: Long): Long = {
      val s = 18L * 1000 / 4; val d = dl * 1000
      44 * tf * s * 1000000L / (20 * tf * s + 6 * s + 18 * d)
    }
    def score(tf: Long, dl: Long, df: Long): Long =
      sat(tf, dl) * (4L * 1000000 / df) / 1000000
    val expected = List(
      (2L, score(3, 3, 3), 1L),  // saturated tf=3 highest
      (1L, score(1, 3, 3), 1L),  // short doc beats long doc at tf=1
      (3L, score(1, 9, 3), 1L))
      .sortBy { case (id, s, _) => (-s, id) }
    assert(got == expected)
    // ordering properties: saturation grows sublinearly; shorter doc
    // outranks longer at equal tf/df
    assert(sat(3, 3) < 3 * sat(1, 3))
    assert(score(1, 3, 3) > score(1, 9, 3))
  }

  test("rrf fusion is the reciprocal-rank sum of the two runs") {
    val corpus = Seq(
      (1L, "spark data lake"),
      (2L, "spark spark spark"),
      (3L, "spark among many other words extra pad pad pad"),
      (4L, "data data data")
    ).toDF("doc_id", "text")
    def ranks(run: org.apache.spark.sql.DataFrame): Map[Long, Long] = run
      .orderBy(col("score_micro").desc, col("doc_id"))
      .select("doc_id").as[Long].collect().zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    val ra = ranks(InvertedIndex.rankedSearch(corpus, "doc_id", "text",
      Seq("spark"), 20))
    val rb = ranks(InvertedIndex.bm25Search(corpus, "doc_id", "text",
      Seq("spark"), 20))
    val got = InvertedIndex.rrfFusion(corpus, "doc_id", "text",
        Seq("spark"), 20, 10)
      .select("doc_id", "rrf_micro", "rank_a", "rank_b")
      .as[(Long, Long, Long, Long)].collect().toList
    assert(got.nonEmpty)
    got.foreach { case (id, rrf, a, b) =>
      assert(a == ra.getOrElse(id, 0L) && b == rb.getOrElse(id, 0L))
      val expected = (if (a > 0) 1000000L / (60 + a) else 0L) +
        (if (b > 0) 1000000L / (60 + b) else 0L)
      assert(rrf == expected)
    }
    // fused order is by rrf desc, id — and every returned doc appears
    // in at least one run
    assert(got.map(r => (-r._2, r._1)) == got.map(r => (-r._2, r._1)).sorted)
    got.foreach { case (id, _, a, b) => assert(a > 0 || b > 0) }
  }

  test("rank agreement counts every common pair exactly once with no " +
       "ties and keeps tau in [-1, 1]") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val (c, d, n, num, den) = InvertedIndex.rankAgreement(docs,
        "doc_id", "text", Seq("spark", "window", "stream"), 20)
      .select("concordant", "discordant", "n_pairs", "tau_num", "tau_den")
      .as[(Long, Long, Long, Long, Long)].head()
    // row_number ranks are tie-free, so every pair is concordant or
    // discordant — never neutral
    assert(c + d == n && n > 0)
    // n = m(m-1)/2 for the m docs common to both runs
    val m = (1 + math.sqrt(1 + 8.0 * n)).toLong / 2
    assert(m * (m - 1) / 2 == n && m <= 20)
    assert(num == c - d && den == n && math.abs(num) <= den)
  }

  test("WAND-pruned BM25 returns the exhaustive top-k, identically, " +
       "across query shapes") {
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    for ((terms, k) <- Seq(
        (Seq("spark", "window", "stream"), 10),
        (Seq("spark"), 5),                       // single term
        (Seq("the", "spark"), 8),                // common + rare mix
        (Seq("spark", "window", "stream"), 5000) // k ≫ matches: no prune room
      )) {
      val exact = InvertedIndex.bm25Search(docs, "doc_id", "text", terms, k)
        .as[(Long, Long, Long)].collect().toList
      val pruned = InvertedIndex.bm25SearchPruned(docs, "doc_id", "text",
          terms, k).as[(Long, Long, Long)].collect().toList
      assert(pruned == exact, s"diverged for terms=$terms k=$k")
    }
  }

  test("WAND bound pass genuinely prunes on a skewed corpus") {
    // 3 strong docs stuffed with the rare term + 200 weak one-hit docs:
    // θ from the rare term's postings exceeds every weak doc's ceiling
    val strong = (0L until 3L).map(i =>
      (i, ("needle " * 10) + ("filler" + i + " ") * 5))
    val weak = (10L until 210L).map(i =>
      (i, s"common$i words everywhere needle"))
    val docs = (strong ++ weak).toDF("doc_id", "text")
    val k = 3
    val exact = InvertedIndex.bm25Search(docs, "doc_id", "text",
        Seq("needle"), k).as[(Long, Long, Long)].collect().toList
    val pruned = InvertedIndex.bm25SearchPruned(docs, "doc_id", "text",
        Seq("needle"), k).as[(Long, Long, Long)].collect().toList
    assert(pruned == exact)
    assert(exact.map(_._1).toSet == Set(0L, 1L, 2L),
      "stuffed docs must win on saturated tf")
  }
}
