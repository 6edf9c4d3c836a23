package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dedup, Similarity}

/** Differential contracts for the tiled pair kernels: the
  * mapPartitions-style candidate generators must emit EXACTLY the pair
  * set (and scores) of the declarative row-level formulation they
  * replaced — same blocking semantics, same IEEE fold order, same
  * HALF_UP rounding surface, exact-distinct output. Randomized inputs
  * so tile boundaries, band collisions, and rounding guard bands all
  * get exercised. */
class PairKernelSpec extends SparkSpec {
  import spark.implicits._

  private def rng(seed: Long) = new scala.util.Random(seed)

  test("labelBlockedNearDup matches the row-level self-join on random data") {
    val r = rng(42)
    val emb = (0L until 300L).map { i =>
      (i, s"lbl${r.nextInt(4)}",
       Array.fill(16)((r.nextInt(2001) - 1000) / 1000.0f))
    }.toDF("vec_id", "label", "embedding")
    val got = Similarity.labelBlockedNearDup(emb, 0.3)
      .as[(Long, Long, Double)].collect().toSet
    // reference: declarative within-label self-join through the same
    // fused cosine + round(…, 6) surface
    Similarity.registerExpressions(spark)
    val e = emb.select(col("vec_id"), col("label"),
                       col("embedding").cast("array<double>").as("embedding"))
    val want = e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        round(expr("cosine_sim(a.embedding, b.embedding)"), 6).as("cos"))
      .filter(col("cos") >= 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(want.nonEmpty, "fixture must produce pairs")
    assert(got == want)
  }

  test("labelBlockedNearDup pairs split across tiles exactly once") {
    // 40 identical vectors on one label: C(40,2) pairs, cos 1.0 — every
    // (tile, tile) combination contributes, nothing duplicated/dropped
    val emb = (0L until 40L).map(i => (i, "x", Array.fill(8)(0.25f)))
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.labelBlockedNearDup(emb, 0.5, tiles = 4)
      .as[(Long, Long, Double)].collect()
    assert(got.length == 40 * 39 / 2)
    assert(got.forall { case (a, b, c) => a < b && c == 1.0 })
    assert(got.map(p => (p._1, p._2)).distinct.length == got.length)
  }

  test("labelBlockedNearDup skips zero-norm and length-mismatched vectors") {
    val emb = Seq(
      (0L, "x", Array.fill(8)(0.5f)),
      (1L, "x", Array.fill(8)(0.5f)),
      (2L, "x", Array.fill(8)(0.0f)),   // zero norm → NULL cosine upstream
      (3L, "x", Array.fill(4)(0.5f))    // length mismatch → NULL upstream
    ).toDF("vec_id", "label", "embedding")
    val got = Similarity.labelBlockedNearDup(emb, 0.0)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((0L, 1L, 1.0)))
  }

  test("simhashPairs matches the banded self-join + distinct on random docs") {
    val r = rng(7)
    val vocab = Vector("spark", "shuffle", "window", "stream", "join",
                       "partition", "codegen", "catalyst")
    val docs = (0L until 200L).map { i =>
      (i, Seq.fill(12)(vocab(r.nextInt(vocab.length))).mkString(" "))
    }.toDF("doc_id", "text")
    val got = Dedup.simhashPairs(docs, "doc_id", "text", 20)
      .as[(Long, Long, Int)].collect().toSet
    // reference: explicit band join, hamming cut, distinct
    val sigs = Dedup.simhashSignatures(docs, "doc_id", "text")
    val bands = sigs.select(col("doc_id"), col("sim"),
        explode(sequence(lit(0), lit(3))).as("bnd"))
      .withColumn("bv", expr("shiftright(sim, bnd * 15) & 32767"))
    val want = bands.as("a").join(bands.as("b"),
        col("a.bnd") === col("b.bnd") && col("a.bv") === col("b.bv") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
              expr("bit_count(a.sim ^ b.sim)").cast("int").as("hamming"))
      .filter(col("hamming") <= 20).distinct()
      .as[(Long, Long, Int)].collect().toSet
    assert(want.nonEmpty, "fixture must produce pairs")
    assert(got == want)
  }

  test("simhashPairs emits a multi-band collision exactly once") {
    // identical docs share ALL four bands — the first-shared-band rule
    // must still yield exactly one row per pair
    val docs = (0L until 5L).map(i => (i, "alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val got = Dedup.simhashPairs(docs, "doc_id", "text", 0)
      .as[(Long, Long, Int)].collect()
    assert(got.length == 10) // C(5,2)
    assert(got.map(p => (p._1, p._2)).distinct.length == 10)
    assert(got.forall(_._3 == 0))
  }

  test("pair kernels reject non-integral ids with a clear message " +
       "(the declarative self-joins they replaced took any orderable id)") {
    val sdocs = Seq(("doc-1", "alpha beta"), ("doc-2", "alpha beta"))
      .toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException] {
      Dedup.simhashPairs(sdocs, "doc_id", "text", 3)
    }
    assert(e1.getMessage.contains("integral"))
    val semb = Seq(("v-1", "x", Array(1.0, 0.0)), ("v-2", "x", Array(1.0, 0.0)))
      .toDF("vec_id", "label", "embedding")
    val e2 = intercept[IllegalArgumentException] {
      Similarity.labelBlockedNearDup(semb, 0.9)
    }
    assert(e2.getMessage.contains("integral"))
  }

  test("ngramJaccardPairs kernel matches naive all-pairs Jaccard on " +
       "random docs (incl. replica-shaped 0.2-0.5 overlap clusters)") {
    val words = Vector.tabulate(40)(i => s"w$i")
    val rnd = new scala.util.Random(13)
    def doc(len: Int) = Seq.fill(len)(words(rnd.nextInt(words.size))).mkString(" ")
    // base docs + perturbed replicas (the candidate-mass shape the
    // positional/count filter exists to prune)
    val base = (0 until 30).map(_ => doc(8 + rnd.nextInt(20)))
    // alnum-only rewrites: the normalizer maps non-[a-z0-9] to spaces,
    // which would change tokenization under a '~' marker
    val docs = (base ++ base.flatMap { t =>
      (1 to 3).map { j =>
        t.split(" ").map(w =>
          if (rnd.nextInt(3) == 0) s"${w}x$j" else w).mkString(" ")
      }
    }).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    for (t <- Seq(0.5, 0.8)) {
      val got = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, t)
        .select("doc_a", "doc_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      // naive reference: exact Jaccard over distinct 3-gram sets
      val sets = docs.as[(Long, String)].collect().toMap.map { case (id, tx) =>
        val w = tx.split(" ")
        id -> w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }
      val ids = sets.keys.toSeq.sorted
      val want = (for {
        ai <- ids.indices.iterator; bi <- (ai + 1) until ids.size
        a = ids(ai); b = ids(bi)
        if sets(a).nonEmpty && sets(b).nonEmpty
        inter = (sets(a) & sets(b)).size
        jr = BigDecimal(inter.toDouble /
            (sets(a).size + sets(b).size - inter))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if jr >= t
      } yield (a, b, jr)).toSet
      assert(got == want, s"threshold $t: " +
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("ngramJaccardPairs hub-bucket guard fails loudly") {
    val docs = (0L until 20L).map(i => (i, "a b c d e f"))
      .toDF("doc_id", "text") // identical docs: every prefix token a hub
    val e = intercept[Exception] {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8,
        maxBucket = 5).collect()
    }
    assert(String.valueOf(e.getMessage).contains("ngramJaccardPairs") ||
      String.valueOf(Option(e.getCause).map(_.getMessage).orNull)
        .contains("ngramJaccardPairs"))
  }

  test("knnJoin maxPairs ceiling fails loudly and points at the ANN path; " +
       "results unchanged below the ceiling") {
    val r = new scala.util.Random(11)
    val emb = (0L until 40L).map(i =>
        (i, Array.fill(8)(r.nextGaussian())))
      .toDF("vec_id", "embedding")
    // below the ceiling: the guard column is inert and the kernel runs
    val ok = Similarity.knnJoin(emb, 3, blocks = 4, maxPairs = 40L * 40L)
      .collect()
    assert(ok.nonEmpty)
    // above: loud failure naming the bound and the scale path
    val e = intercept[Exception] {
      Similarity.knnJoin(emb, 3, blocks = 4, maxPairs = 100L).collect()
    }
    val msg = String.valueOf(e.getMessage) +
      String.valueOf(Option(e.getCause).map(_.getMessage).getOrElse(""))
    assert(msg.contains("annIvf"), s"guard message must name the ANN path: $msg")
    // and the guarded call's output equals the unguarded kernel's
    val unguarded = Similarity.knnJoin(emb, 3, blocks = 4)
      .collect().map(_.toSeq).toSet
    assert(ok.map(_.toSeq).toSet == unguarded)
  }
}
