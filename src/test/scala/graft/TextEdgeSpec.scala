package graft

import org.apache.spark.sql.functions._

import graft.functions.{Dedup, TextAnalysis}

/** Edge inputs through the full text/dedup surface: empty, whitespace,
  * single-token, unicode, punctuation-only documents. */
class TextEdgeSpec extends SparkSpec {
  import spark.implicits._

  val edgy = Seq(
    (1L, ""), (2L, "   "), (3L, "word"), (4L, "UPPER lower 42"),
    (5L, "¡unicode é 中文 🙂!"), (6L, "...!!!..."), (7L, "a b a b a b"))
    .toDF("doc_id", "text")

  test("token counts: empty and whitespace-only are 0") {
    val got = edgy.select($"doc_id", TextAnalysis.tokenCount($"text").as("n"))
      .as[(Long, Int)].collect().toMap
    assert(got(1L) == 0 && got(2L) == 0 && got(3L) == 1 && got(4L) == 3)
  }

  test("shingles on short/empty docs are empty, never error") {
    val got = edgy.select($"doc_id", TextAnalysis.shingles($"text", 3).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L).isEmpty && got(3L).isEmpty)
    assert(got(7L) == Seq("a b a", "b a b", "a b a", "b a b"))
  }

  test("fingerprint: case/punctuation-insensitive collisions") {
    val pair = Seq((1L, "Hello, World!"), (2L, "hello world"), (3L, "other"))
      .toDF("doc_id", "text")
    val groups = pair.groupBy(TextAnalysis.fingerprint($"text")).count()
      .as[(String, Long)].collect().toMap
    assert(groups.values.toSet == Set(2L, 1L))
  }

  test("simhash and language-id run clean over edge docs") {
    val sims = Dedup.simhashSignatures(edgy, "doc_id", "text").collect()
    assert(sims.length == 7)
    val langs = edgy.select(TextAnalysis.langId($"text")).as[String].collect()
    assert(langs.forall(l => Set("en", "de", "fr", "es", "und").contains(l)))
  }

  test("quality ratios never divide by zero") {
    val cols = TextAnalysis.qualityColumns($"text").map { case (n, c) => c.as(n) }
    val rows = edgy.select(cols: _*).collect()
    assert(rows.length == 7) // no exception; nulls allowed for empty docs
  }

  test("term stats / chunk dedup / repetition skip empty docs cleanly") {
    val stats = TextAnalysis.termStats(edgy, "doc_id", "text")
      .as[(Long, String, Long, Long)].collect()
    assert(!stats.exists(_._2 == ""))        // no empty-token rows
    assert(!stats.exists(s => s._1 == 1L || s._1 == 2L || s._1 == 6L))
    val chunks = Dedup.chunkDupStats(edgy, "doc_id", "text", 4)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(!chunks.contains(1L) && !chunks.contains(2L) && !chunks.contains(6L))
    assert(chunks(7L)._1 == 2L)              // "a b a b a b" → 2 chunks of ≤4
    val rep = TextAnalysis.repetitionStats(edgy, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(!rep.contains(1L) && !rep.contains(3L)) // <2 tokens → no bigrams
    assert(rep(7L)._2 == 5L && rep(7L)._3 == 3L)   // "a b"×3 of 5 bigrams
    assert(rep(7L)._4 == 600000L)                  // 3·10⁶ div 5
  }

  test("dropNearDuplicates keeps component minima, drops the rest") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // dup of 1
      (3L, "completely different text about other things entirely here"),
      (4L, "alpha beta gamma delta epsilon zeta eta iota")) // near-dup of 1
      .toDF("doc_id", "text")
    val kept = Dedup.dropNearDuplicates(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(1L) && kept.contains(3L) && !kept.contains(2L))
    assert(kept.subsetOf(Set(1L, 3L, 4L))) // 4 may or may not band with 1
  }

  test("topTermsExact ranks rare terms first with stable tie order") {
    val docs = Seq((1L, "rare common common"), (2L, "common common"))
      .toDF("doc_id", "text")
    val top = TextAnalysis.topTermsExact(docs, "doc_id", "text", 2)
      .filter($"doc_id" === 1L).orderBy($"rank")
      .select($"token").as[String].collect().toSeq
    // doc1: common tf=2 df=2 → 1.0M; rare tf=1 df=1 → 1.0M; tie → token order
    assert(top == Seq("common", "rare"))
  }

  test("chunkPassages: coverage, overlap, tail, and empty-doc contracts") {
    val toks = (1 to 30).map(i => s"t$i")
    val docs = Seq(
      (1L, toks.mkString(" ")),  // 30 tokens → starts 0,8,16,24
      (2L, "one two three"),     // shorter than one chunk
      (3L, ""), (4L, "   ")      // no tokens → no rows
    ).toDF("doc_id", "text")
    val got = TextAnalysis.chunkPassages(docs, "doc_id", "text", 10, 8)
      .as[(Long, Int, Int, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(!got.contains(3L) && !got.contains(4L), "empty docs chunk to nothing")
    // doc 1: windows [1..10],[9..18],[17..26],[25..30]
    val d1 = got(1L)
    assert(d1.map(r => (r._2, r._3, r._4)).toSeq ==
      Seq((0, 0, 10L), (1, 8, 10L), (2, 16, 10L), (3, 24, 6L)))
    assert(d1.head._5 == (1 to 10).map(i => s"t$i").mkString(" "))
    assert(d1.last._5 == (25 to 30).map(i => s"t$i").mkString(" "))
    // consecutive windows overlap by chunk - stride = 2 tokens
    d1.sliding(2).foreach { case Array(a, b) =>
      val at = a._5.split(" ").toSeq; val bt = b._5.split(" ").toSeq
      assert(at.takeRight(2) == bt.take(2), s"overlap broken: $a -> $b")
    case _ => ()
    }
    // every token of the doc appears in some window (full coverage)
    assert(d1.flatMap(_._5.split(" ")).toSet == toks.toSet)
    // doc 2: one short window with all tokens
    assert(got(2L).toSeq == Seq((2L, 0, 0, 3L, "one two three")))
  }

  test("crossDocDupStats counts grams shared with OTHER docs only") {
    import graft.functions.Dedup
    val docs = Seq(
      (1L, "alpha beta gamma delta"),      // grams: abc, bcd (shared: abc w/ doc2)
      (2L, "alpha beta gamma epsilon"),    // grams: abc, bce (shared: abc)
      (3L, "zeta eta theta iota"),         // disjoint
      (4L, "alpha beta gamma delta"),      // exact copy of doc 1 ⇒ all shared
      (5L, "")).toDF("doc_id", "text")     // no grams
    val got = Dedup.crossDocDupStats(docs, "doc_id", "text", 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc1 == doc4, so BOTH of doc1's grams are shared (with doc4);
    // "alpha beta gamma" additionally occurs in doc2
    assert(got(1L) == ((2L, 2L, 1000000L)))
    assert(got(2L) == ((2L, 1L, 500000L)), "only 'alpha beta gamma' shared")
    assert(got(3L) == ((2L, 0L, 0L)), "disjoint doc shares nothing")
    assert(got(4L) == ((2L, 2L, 1000000L)))
    assert(got(5L) == ((0L, 0L, 0L)), "gram-less doc reports zeros")
  }

  test("chunkPassages rejects bad window parameters") {
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkPassages(edgy, "doc_id", "text", 10, 11)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkPassages(edgy, "doc_id", "text", 0, 1)
    }
  }
}
