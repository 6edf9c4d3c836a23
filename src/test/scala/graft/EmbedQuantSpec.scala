package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Symmetric int8 quantization contracts: range, extremes, zero
  * vector, and the dequantization error bound. */
class EmbedQuantSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = {
    val rnd = new Random(5)
    val rows = (0L until 200L).map { i =>
      (i, Array.fill(32)((rnd.nextFloat() * 2 - 1) * (i % 7 + 1)))
    } :+ (200L, Array.fill(32)(0.0f)) // all-zero vector
    rows.toDF("vec_id", "embedding")
  }

  test("quantized components stay in [-127, 127] and extremes hit ±127") {
    val q = vecs
      .select(col("vec_id"), col("embedding"),
              Similarity.maxAbs(col("embedding")).as("s"))
      .select(col("vec_id"), col("embedding"), col("s"),
              Similarity.int8Quantize(col("embedding"), col("s")).as("q"))
    val rows = q.as[(Long, Array[Float], Double, Array[Long])].collect()
    rows.foreach { case (id, v, s, qs) =>
      assert(qs.length == v.length)
      assert(qs.forall(x => x >= -127 && x <= 127), s"vec $id out of range")
      if (s > 0) {
        // the max-|component| quantizes to exactly ±127
        assert(qs.exists(x => math.abs(x) == 127), s"vec $id extreme")
        // dequantization error ≤ scale/254 per component (half a step)
        v.zip(qs).foreach { case (x, xq) =>
          val err = math.abs(x - xq * s / 127.0)
          assert(err <= s / 254.0 * (1 + 1e-9), s"vec $id err $err")
        }
      } else assert(qs.forall(_ == 0L), "zero vector quantizes to zeros")
    }
  }

  test("quantized top-k recall vs the float baseline is high") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    val k = 10
    def topSets(df: org.apache.spark.sql.DataFrame) = df
      .select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topSets(Similarity.cosineTopK(queries, emb, k))
    val quant = topSets(Similarity.quantizedTopK(queries, emb, k))
    assert(exact.keySet == quant.keySet)
    val recalls = exact.keys.toSeq.map { q =>
      (exact(q) & quant(q)).size.toDouble / k
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.85, s"mean recall@$k = $mean (per-query: $recalls)")
    // int8 over 64 dims: every query individually stays usable
    assert(recalls.forall(_ >= 0.6), s"a query collapsed: $recalls")
  }

  test("kmeans: partition property, WCSS improves, partitioning-invariant") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val r2 = Similarity.kmeansQuantized(emb, 8, 2)
      .as[(Long, Int, Long)].collect()
    // each vector lands in exactly one cell
    assert(r2.map(_._1).distinct.length == r2.length)
    assert(r2.map(_._2).distinct.length > 1, "degenerate single cluster")
    // Lloyd's monotonicity: 2 update rounds never worsen total WCSS
    val r0 = Similarity.kmeansQuantized(emb, 8, 0)
      .as[(Long, Int, Long)].collect()
    assert(r2.map(_._3).sum <= r0.map(_._3).sum)
    // integer-exact arithmetic ⇒ identical output under any input
    // partitioning (the property that makes the DuckDB oracle possible)
    val rp = Similarity.kmeansQuantized(emb.repartition(7), 8, 2)
      .as[(Long, Int, Long)].collect()
    assert(rp.sortBy(_._1).toSeq == r2.sortBy(_._1).toSeq)
  }

  test("kmeans-cell ANN recall vs the exact quantized ranking") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def recallAt(nprobe: Int): Double = {
      val ann = Similarity.annIvfKmeans(emb.filter($"vec_id" < 10), emb,
          8, 2, nprobe, 5)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val exact = Similarity.quantizedTopK(emb.filter($"vec_id" < 10), emb, 5)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      (ann intersect exact).size.toDouble / exact.size
    }
    val r2 = recallAt(2)
    val r8 = recallAt(8) // probing every cell ⇒ the exact ranking
    info(f"recall nprobe=2: $r2%.2f, nprobe=8: $r8%.2f")
    assert(r2 >= 0.3 && r2 < 1.0, "nprobe=2 should trade recall for cost")
    assert(r8 == 1.0, "probing all cells must recover the exact top-k")
  }

  test("quantization is deterministic and scale-covariant") {
    def run() = vecs
      .select(col("vec_id"),
              Similarity.int8Quantize(col("embedding"),
                Similarity.maxAbs(col("embedding"))).as("q"))
      .as[(Long, Array[Long])].collect().toMap.view.mapValues(_.toSeq).toMap
    assert(run() == run())
    // scaling every component by a power of two (exact in float) leaves
    // the quantized vector unchanged
    val doubled = vecs.select(col("vec_id"),
      transform(col("embedding"), x => x * lit(4.0f)).as("embedding"))
    val q2 = doubled
      .select(col("vec_id"),
              Similarity.int8Quantize(col("embedding"),
                Similarity.maxAbs(col("embedding"))).as("q"))
      .as[(Long, Array[Long])].collect().toMap.view.mapValues(_.toSeq).toMap
    assert(q2 == run())
  }

  test("mmrSelect matches an independent plain-Scala greedy over the " +
       "same candidates and pairs") {
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.load(spark, dir, "embeddings")
    val (queryId, pool, k) = (0L, 20, 5)
    // rebuild the operator's INPUTS with the same building blocks, then
    // run the greedy loop independently in plain Scala — a differential
    // on the unrolled-iteration wiring (joins, anti-joins, tiebreaks)
    val q = Similarity.quantizedEmbeddings(emb)
    val qe = q.filter(col("vec_id") === queryId)
      .select(col("embedding")).as[Seq[Double]].head()
    val cand = q.filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Double])]
      .collect()
      .map { case (id, e) =>
        (id, e, e.zip(qe).map { case (x, y) => x * y }.sum.toLong) }
      .sortBy { case (id, _, rel) => (-rel, id) }.take(pool)
    val sims = (for {
      (ia, ea, _) <- cand; (ib, eb, _) <- cand if ia != ib
    } yield ((ia, ib),
      ea.zip(eb).map { case (x, y) => x * y }.sum.toLong)).toMap
    var selected = Vector(cand.head) // max rel, id tiebreak via sort
    var expected = Vector((1L, cand.head._1, cand.head._3, 0L))
    for (r <- 2 to k) {
      val pick = cand.filterNot(c => selected.exists(_._1 == c._1))
        .map { c =>
          val red = selected.map(s => sims((c._1, s._1))).max
          (c, red, c._3 - red)
        }
        .sortBy { case (c, _, score) => (-score, c._1) }.head
      selected :+= pick._1
      expected :+= ((r.toLong, pick._1._1, pick._1._3, pick._2))
    }
    val got = Similarity.mmrSelect(emb, queryId, pool, k)
      .orderBy("rank")
      .select("rank", "vec_id", "rel", "redundancy")
      .as[(Long, Long, Long, Long)].collect().toVector
    assert(got == expected)
  }

  // round-15: the greedy collapsed from unrolled per-round joins into
  // one aggregate() fold over the collected pool — pin the edge cases
  // the fold's null-guard handles and the plan collapse itself
  test("mmrSelect single-row fold: short pool stops early, missing " +
       "query id yields empty, plan has no per-round exchanges") {
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.load(spark, dir, "embeddings")
    // pool of 3 candidates but k=5: ranks 1..3 only (greedy runs dry)
    val short = Similarity.mmrSelect(emb.filter(col("vec_id") < 4), 0L, 3, 5)
      .orderBy("rank")
      .select("rank", "vec_id", "rel", "redundancy")
      .as[(Long, Long, Long, Long)].collect().toVector
    assert(short.map(_._1) == Vector(1L, 2L, 3L))
    assert(short.head._4 == 0L, "rank-1 redundancy is 0")
    // no row with vec_id == queryId: empty result, not a crash
    assert(Similarity.mmrSelect(emb.filter(col("vec_id") < 4), 99L, 3, 5)
      .count() == 0L)
    // k=1 skips the fold entirely and yields just the relevance argmax
    val k1 = Similarity.mmrSelect(emb, 0L, 20, 1)
      .select("rank", "redundancy").as[(Long, Long)].collect().toVector
    assert(k1 == Vector((1L, 0L)))
    // the collapse is structural: everything post-pool is one row, so
    // the whole plan holds a handful of exchanges (the unrolled form
    // carried ~160) and no eager checkpoints (no ExistingRDD pins)
    val plan = Similarity.mmrSelect(emb, 0L, 20, 5)
      .queryExecution.executedPlan.toString
    val exchanges = "(?m)^\\s*[+:]?[- ]*(Broadcast)?Exchange".r
      .findAllIn(plan).size
    assert(exchanges <= 10, s"plan should stay collapsed, got $exchanges:\n$plan")
    assert(!plan.contains("Scan ExistingRDD"),
      "no checkpoint pins in the collapsed plan")
  }
}
