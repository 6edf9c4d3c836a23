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
}
