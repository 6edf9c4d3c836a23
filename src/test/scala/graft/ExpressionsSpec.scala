package graft

import java.security.MessageDigest

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Similarity, TextAnalysis}

/** Custom Catalyst expressions vs their built-in-composition /
  * driver-side reference implementations. */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("WordShingles equals transform∘slice∘concat_ws composition") {
    val texts = Seq("a b c d e", "one two", "x", "", "  padded   text  here ")
      .toDF("text")
    for (n <- 1 to 3) {
      val fused = texts.select(TextAnalysis.shingles(col("text"), n).as("s"))
        .as[Seq[String]].collect().toSeq
      val toks = split(TextAnalysis.normalized(col("text")), " ")
      val composed = texts.select(
        when(size(toks) < n, array()).otherwise(
          transform(sequence(lit(0), size(toks) - n),
                    i => concat_ws(" ", slice(toks, i + 1, lit(n))))).as("s"))
        .as[Seq[String]].collect().toSeq
      assert(fused == composed, s"n=$n")
    }
  }

  test("CosineSimilarity equals aggregate∘zip_with composition bit-for-bit") {
    val rnd = new Random(7)
    val rows = (1 to 50).map { _ =>
      (Array.fill(64)(rnd.nextFloat() * 2 - 1),
       Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }.toDF("a", "b")
    val fused = rows.select(Similarity.cosineFused(col("a"), col("b")))
      .as[Double].collect()
    val composed = rows.select(Similarity.cosine(col("a"), col("b")))
      .as[Double].collect()
    fused.zip(composed).foreach { case (f, c) =>
      assert(java.lang.Double.doubleToLongBits(f) ==
             java.lang.Double.doubleToLongBits(c))
    }
  }

  test("CosineSimilarity: zero-norm and length-mismatch inputs are NULL") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    import graft.functions.expressions.CosineSimilarity
    def lit(a: Array[Float]) = Literal.create(a, ArrayType(FloatType))
    val v = Array(1f, 2f, 3f)
    // interpreted eval path
    assert(CosineSimilarity(lit(Array(0f, 0f, 0f)), lit(v)).eval(null) == null)
    assert(CosineSimilarity(lit(v), lit(Array(0f, 0f, 0f))).eval(null) == null)
    assert(CosineSimilarity(lit(v), lit(Array(1f, 2f))).eval(null) == null)
    assert(CosineSimilarity(lit(v), lit(v)).eval(null) != null)
    // codegen path (through a DataFrame), incl. null-vs-NaN ordering:
    // degenerate rows must NOT outrank real scores in cos DESC top-k
    val rows = Seq((1L, Array(0f, 0f), Array(1f, 2f)),
                   (2L, Array(1f, 1f), Array(1f, 2f)),
                   (3L, Array(1f, 0f), Array(1f, 2f, 3f)))
      .toDF("id", "a", "b")
    val got = rows.select(col("id"),
        Similarity.cosineFused(col("a"), col("b")).as("cos"))
      .orderBy(desc("cos")).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(2L, 1L, 3L) ||
           got.map(_.getLong(0)).toSeq == Seq(2L, 3L, 1L))
    assert(got.head.getDouble(1) > 0.9 && got.tail.forall(_.isNullAt(1)))
  }

  test("SimHash60 matches driver-side reference implementation") {
    def refSimhash(tokens: Seq[String]): Long = {
      val acc = new Array[Int](60)
      tokens.foreach { t =>
        val hex = MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8"))
          .map(b => f"${b & 0xff}%02x").mkString.take(15)
        val h = java.lang.Long.parseLong(hex, 16)
        (0 until 60).foreach { i =>
          if (((h >> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1
        }
      }
      (0 until 60).foldLeft(0L)((r, i) => if (acc(i) > 0) r | (1L << i) else r)
    }
    val docs = Seq((1L, "the quick brown fox"), (2L, "lorem ipsum dolor sit amet"),
                   (3L, "a"), (4L, "repeat repeat repeat"))
      .toDF("doc_id", "text")
    val got = Dedup.simhashSignatures(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(1L -> "the quick brown fox", 2L -> "lorem ipsum dolor sit amet",
        3L -> "a", 4L -> "repeat repeat repeat").foreach { case (id, text) =>
      assert(got(id) == refSimhash(text.split(" ").toSeq), s"doc $id")
    }
  }

  test("NormalizeText equals trim∘regexp_replace∘lower on random unicode") {
    val rnd = new Random(11)
    val alphabet = "aZ09 .,!-_éñ中文🙂\t\n" + "qwerty"
    val rows = ((1 to 300).map(_ =>
      (1 to rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length)))
        .mkString) ++ Seq("", "   ", "ABC", "éé", "a--b"))
      .toDF("text")
    val fused = rows.select(TextAnalysis.normalized(col("text")))
      .as[String].collect().toSeq
    val composed = rows.select(TextAnalysis.normalizedComposed(col("text")))
      .as[String].collect().toSeq
    assert(fused == composed)
  }

  test("md5Hash60 matches JVM md5 prefix") {
    val got = Seq("hello").toDF("s")
      .select(Dedup.md5Hash60(col("s"))).as[Long].head()
    assert(got == java.lang.Long.parseLong("5d41402abc4b2a7", 16))
  }
}
