package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Sketches}
import graft.operators.{Series, Triangles}

/** Ordered-series operators (forward fill, interval merge, k-sigma
  * outliers), triangle counting, oracle-exact sketches (HLL registers,
  * Count-Min), and containment pairs — differential against
  * brute-force Scala references on randomized inputs, plus the
  * structural guarantees each operator advertises. */
class SeriesGraphSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(7)

  // ---- forward fill -----------------------------------------------------

  test("forwardFill equals per-key scan-carry reference") {
    val rows = (1 to 500).map { i =>
      (i.toLong, (i % 13).toLong,
       if (rnd.nextInt(4) == 0) Some(rnd.nextInt(100).toLong) else None)
    }
    val df = rows.toDF("id", "k", "obs")
    val got = Series.forwardFill(df, "k", "obs", "filled", col("id"))
      .select("id", "filled").as[(Long, Option[Long])].collect().toMap
    val want = rows.groupBy(_._2).flatMap { case (_, g) =>
      var carry: Option[Long] = None
      g.sortBy(_._1).map { case (id, _, obs) =>
        carry = obs.orElse(carry); id -> carry
      }
    }
    assert(got == want)
  }

  test("forwardFill leaves rows before the first observation null") {
    val df = Seq((1L, 1L, None: Option[Long]), (2L, 1L, Some(5L)),
                 (3L, 1L, None: Option[Long])).toDF("id", "k", "obs")
    val got = Series.forwardFill(df, "k", "obs", "filled", col("id"))
      .orderBy("id").select("filled").as[Option[Long]].collect()
    assert(got.toSeq == Seq(None, Some(5L), Some(5L)))
  }

  // ---- interval merge ---------------------------------------------------

  test("mergeIntervals equals brute-force sweep on random intervals") {
    val ivs = (1 to 400).map { i =>
      val s = rnd.nextInt(1000).toLong
      (i.toLong, (i % 7).toLong, s, s + 1 + rnd.nextInt(30))
    }
    val got = Series.mergeIntervals(
        ivs.toDF("id", "k", "s", "e"), "k", "s", "e", col("id"))
      .select("k", "span_start", "span_end", "n_merged")
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = ivs.groupBy(_._2).flatMap { case (k, g) =>
      val sorted = g.map(t => (t._3, t._4)).sortBy(identity)
      val spans = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
      for ((s, e) <- sorted) {
        if (spans.nonEmpty && s <= spans.last._2)
          spans(spans.size - 1) = (spans.last._1,
            math.max(spans.last._2, e), spans.last._3 + 1)
        else spans += ((s, e, 1L))
      }
      spans.map(sp => (k, sp._1, sp._2, sp._3))
    }.toSet
    assert(got == want)
  }

  test("mergeIntervals: touching-at-boundary intervals merge (start == maxEnd)") {
    val df = Seq((1L, 1L, 0L, 10L), (2L, 1L, 10L, 20L), (3L, 1L, 21L, 30L))
      .toDF("id", "k", "s", "e")
    val got = Series.mergeIntervals(df, "k", "s", "e", col("id"))
      .select("span_start", "span_end", "n_merged")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 20L, 2L), (21L, 30L, 1L)))
  }

  // ---- k-sigma outliers -------------------------------------------------

  test("sigmaOutliers matches float k-sigma on nondegenerate data") {
    val rows = (1 to 600).map { i =>
      val k = (i % 5).toLong
      val base = 100L * (k + 1)
      val v = if (i % 97 == 0) base * 20 else base + rnd.nextInt(20)
      (i.toLong, k, v)
    }
    val got = Series.sigmaOutliers(
        rows.toDF("id", "k", "v"), "k", "v", 2, 10)
      .select("id").as[Long].collect().toSet
    val want = rows.groupBy(_._2).flatMap { case (_, g) =>
      val vs = g.map(_._3.toDouble)
      val n = vs.size
      val mu = vs.sum / n
      val sig2 = vs.map(x => (x - mu) * (x - mu)).sum / n
      g.filter { case (_, _, v) => (v - mu) * (v - mu) > 4 * sig2 }
        .map(_._1)
    }.toSet
    assert(got == want && got.nonEmpty)
  }

  test("sigmaOutliers skips keys below minN") {
    val df = (1 to 5).map(i => (i.toLong, 1L, if (i == 5) 1000L else 1L))
      .toDF("id", "k", "v")
    assert(Series.sigmaOutliers(df, "k", "v", 2, 10).isEmpty)
  }

  // ---- triangles --------------------------------------------------------

  test("triangle count equals brute-force on random graphs") {
    for (trial <- 1 to 3) {
      val n = 40
      val edges = (1 to 300).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val canon = edges.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
      val nodes = canon.flatMap(e => Seq(e._1, e._2))
      val want = nodes.toSeq.combinations(3).count { c =>
        val Seq(a, b, cc) = c.sorted
        canon((a, b)) && canon((b, cc)) && canon((a, cc))
      }
      val got = Triangles.count(edges.toDF("u", "v"))
        .as[(Long, Long, Long)].head()
      assert(got == ((nodes.size.toLong, canon.size.toLong, want.toLong)),
        s"trial $trial")
    }
  }

  test("triangles: a hub star has none; closing one edge makes exactly one") {
    val star = (1 to 20).map(i => (0L, i.toLong))
    assert(Triangles.count(star.toDF("u", "v"))
      .as[(Long, Long, Long)].head() == ((21L, 20L, 0L)))
    val plus = star :+ ((1L, 2L))
    assert(Triangles.count(plus.toDF("u", "v"))
      .as[(Long, Long, Long)].head() == ((21L, 21L, 1L)))
  }

  test("clusteringCoefficient: brute force on random graphs; clique = 1e6 ppm") {
    val n = 25
    val edges = (1 to 150).map(_ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val adj = canon.flatMap(e => Seq(e, (e._2, e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val got = graft.operators.Triangles
      .clusteringCoefficient(edges.toDF("u", "v"))
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    adj.foreach { case (node, nbrs) =>
      val d = nbrs.size.toLong
      val t = nbrs.toSeq.combinations(2).count { case Seq(x, y) =>
        canon((math.min(x, y), math.max(x, y)))
      }.toLong
      val ppm = if (d < 2) 0L else t * 2000000L / (d * (d - 1))
      assert(got(node) == ((d, t, ppm)), s"node $node")
    }
    // 5-clique: every node's coefficient is exactly 1e6 ppm
    val k5 = (0 until 5).flatMap(i => (i + 1 until 5).map(j => (i.toLong, j.toLong)))
    graft.operators.Triangles.clusteringCoefficient(k5.toDF("u", "v"))
      .as[(Long, Long, Long, Long)].collect()
      .foreach { r => assert(r._2 == 4L && r._3 == 6L && r._4 == 1000000L) }
  }

  test("hllDistinct: partitioning-independent state, estimate within 3 stderr") {
    val df = (1 to 30000).map(i => (s"g${i % 3}", s"user${i % 9000}"))
      .toDF("g", "k")
    val ref = df.repartition(1).groupBy("g")
      .agg(graft.functions.Sketches.hllDistinct(col("k"), 8).as("h"))
      .select(col("g"), col("h.n_zero_registers"), col("h.sum_rho"),
              col("h.inv_scaled"))
      .as[(String, Long, Long, Long)].collect().toSet
    for (parts <- Seq(4, 32)) {
      val got = df.repartition(parts).groupBy("g")
        .agg(graft.functions.Sketches.hllDistinct(col("k"), 8).as("h"))
        .select(col("g"), col("h.n_zero_registers"), col("h.sum_rho"),
                col("h.inv_scaled"))
        .as[(String, Long, Long, Long)].collect().toSet
      assert(got == ref, s"parts=$parts")
    }
    // each group sees 3000 distinct users (i%9000 stratified by i%3)
    ref.foreach { case (g, zeros, _, inv) =>
      val est = graft.functions.Sketches.hllEstimate(zeros, inv, 8)
      val rel = math.abs(est - 3000.0) / 3000.0
      assert(rel < 3 * 1.04 / 16.0, s"group $g est=$est")
    }
  }

  // ---- oracle-exact sketches --------------------------------------------

  test("hllRegisters: ≤ 2^p rows, registers in range, merge = max") {
    val df = (1 to 5000).map(i => s"key$i").toDF("k")
    val regs = Sketches.hllRegisters(df, "k", 6)
      .as[(Long, Long)].collect()
    assert(regs.size <= 64)
    assert(regs.forall { case (r, rho) => r >= 0 && r < 64 && rho >= 1 })
    // sketch of a union = register-wise max of the sketches
    val a = Sketches.hllRegisters((1 to 2500).map(i => s"key$i").toDF("k"), "k", 6)
      .as[(Long, Long)].collect().toMap
    val b = Sketches.hllRegisters((2000 to 5000).map(i => s"key$i").toDF("k"), "k", 6)
      .as[(Long, Long)].collect().toMap
    val merged = (a.keySet ++ b.keySet).map(r =>
      r -> math.max(a.getOrElse(r, 0L), b.getOrElse(r, 0L))).toMap
    assert(merged == regs.toMap)
  }

  test("hllRegisters estimate lands within 3 standard errors") {
    val p = 8
    val m = 256
    val trueN = 20000
    val regs = Sketches.hllRegisters(
      (1 to trueN).map(i => s"u$i").toDF("k"), "k", p)
      .as[(Long, Long)].collect().toMap
    val zeros = m - regs.size
    val sum = (0 until m).map(r =>
      math.pow(2.0, -regs.getOrElse(r.toLong, 0L).toDouble)).sum
    val alpha = 0.7213 / (1 + 1.079 / m)
    val raw = alpha * m * m / sum
    val est = if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
              else raw
    val rel = math.abs(est - trueN) / trueN
    assert(rel < 3 * 1.04 / math.sqrt(m.toDouble), s"est=$est rel=$rel")
  }

  test("countMin estimates never underestimate and are exact for most keys") {
    val df = (1 to 8000).map(i => s"k${i % 300}").toDF("k")
    val got = Sketches.countMinEstimates(df, "k", 4, 256)
      .as[(String, Long, Long)].collect()
    assert(got.length == 300)
    assert(got.forall { case (_, t, e) => e >= t })
    // a key is exact iff ANY of its 4 rows is collision-free; per row
    // P(collide) = 1-(1-1/256)^299 ≈ .69, so P(exact) ≈ 1-.69⁴ ≈ .77
    // — assert a safely-below-expectation floor, not a vibe
    assert(got.count { case (_, t, e) => e == t } >= 180)
  }

  // ---- binned range join -----------------------------------------------

  test("overlapJoin equals the brute-force theta join at any bin width") {
    val ivs = (1 to 300).map { i =>
      val s = rnd.nextInt(500).toLong
      (i.toLong, (i % 5).toLong, s, s + 1 + rnd.nextInt(60))
    }
    val df = ivs.toDF("id", "k", "s", "e")
    val want = (for {
      a <- ivs; b <- ivs
      if a._2 == b._2 && a._1 != b._1 && a._3 < b._4 && b._3 < a._4
    } yield (a._1, b._1)).toSet
    for (width <- Seq(7L, 64L, 1000L)) {
      val got = graft.operators.RangeJoin
        .overlapJoin(df, df, "k", "id", "s", "e", width)
        .filter(col("l_id") =!= col("r_id"))
        .select("l_id", "r_id").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size,
        s"width=$width: a pair surfaced from more than one bin")
      assert(got.toSet == want, s"width=$width")
    }
  }

  test("overlapJoin: half-open semantics — touching intervals do not match") {
    val l = Seq((1L, 1L, 0L, 10L)).toDF("id", "k", "s", "e")
    val r = Seq((2L, 1L, 10L, 20L), (3L, 1L, 9L, 12L)).toDF("id", "k", "s", "e")
    val got = graft.operators.RangeJoin
      .overlapJoin(l, r, "k", "id", "s", "e", 4L)
      .select("r_id", "overlap_len").as[(Long, Long)].collect().toSet
    assert(got == Set((3L, 1L)))
  }

  // ---- weighted median ---------------------------------------------------

  test("weighted median query logic matches a scan reference") {
    val rows = (1 to 500).map(i =>
      ((i % 3).toLong, (rnd.nextInt(40) + 1).toLong, (rnd.nextInt(9) + 1).toLong))
    val byVal = rows.toDF("g", "v", "w").groupBy("g", "v")
      .agg(sum("w").as("w"))
    val wc = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy("v").rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wt = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val got = byVal.withColumn("cum", sum("w").over(wc))
      .withColumn("total", sum("w").over(wt))
      .filter(col("cum") * 2 >= col("total"))
      .groupBy("g").agg(min("v").as("m"))
      .as[(Long, Long)].collect().toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val total = rs.map(_._3).sum
      var cum = 0L
      val m = rs.groupBy(_._2).toSeq.sortBy(_._1).collectFirst {
        case (v, vs) if { cum += vs.map(_._3).sum; cum * 2 >= total } => v
      }.get
      assert(got(g) == m, s"group $g")
    }
  }

  // ---- bounded-heap top-k aggregate -------------------------------------

  test("topKPairs equals the row_number window under any partitioning") {
    val rows = (1 to 2000).map { i =>
      ((i % 11).toLong, (i % 37).toDouble, i.toLong) // heavy score ties
    }
    val df = rows.toDF("g", "score", "id")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
      .orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).select("g", "score", "id", "rn")
      .as[(Long, Double, Long, Int)].collect().toSet
    for (parts <- Seq(1, 3, 32)) {
      val got = df.repartition(parts)
        .groupBy("g")
        .agg(graft.functions.Sketches.topKPairs(col("score"), col("id"), 5)
          .as("tk"))
        .select(col("g"), posexplode(col("tk")))
        .select(col("g"), col("col.score"), col("col.id"),
                (col("pos") + 1).cast("int"))
        .as[(Long, Double, Long, Int)].collect().toSet
      assert(got == want, s"parts=$parts")
    }
  }

  test("topKPairs ignores NaN and null, returns all rows when group < k") {
    val df = Seq((1L, Some(2.0), Some(10L)), (1L, Some(Double.NaN), Some(11L)),
                 (1L, None, Some(12L)), (1L, Some(1.0), None),
                 (1L, Some(3.0), Some(13L)))
      .toDF("g", "score", "id")
    val got = df.groupBy("g")
      .agg(graft.functions.Sketches.topKPairs(col("score"), col("id"), 10)
        .as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.score"), col("e.id")).as[(Double, Long)].collect().toSeq
    assert(got == Seq((3.0, 13L), (2.0, 10L)))
  }

  // ---- containment ------------------------------------------------------

  test("containmentPairs flags a full quote asymmetrically") {
    val short = "quick brown foxes jump over lazy dogs daily basis"
    val long = ("completely unrelated opening words " + short +
      " and then much more trailing material follows here beyond")
    val docs = Seq((1L, short), (2L, long),
                   (3L, "nothing in common with either text at all"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", 3, 600000L, 50)
      .select("doc_a", "doc_b", "cont_ppm")
      .as[(Long, Long, Long)].collect()
    // 1 ⊂ 2: every 3-gram of the short doc occurs in the long one
    assert(got.exists { case (a, b, ppm) => a == 1L && b == 2L && ppm == 1000000L })
    // but 2 ⊄ 1, and doc 3 pairs with nobody
    assert(!got.exists { case (a, b, _) => a == 2L && b == 1L })
    assert(!got.exists { case (a, b, _) => a == 3L || b == 3L })
  }

  // ---- content-defined chunking ----------------------------------------

  test("rabin boundaries: rolling hash equals from-scratch window hash") {
    val B = 257L; val M = 2147483647L; val w = 16; val div = 64
    def direct(s: String): Seq[Int] = {
      val cps = s.codePoints().toArray
      (w to cps.length).filter { e =>
        val h = cps.slice(e - w, e).foldLeft(0L)((a, c) => (a * B + c) % M)
        h % div == 0
      }
    }
    val texts = Seq(
      "a" * 200,
      (1 to 300).map(i => ('a' + i % 26).toChar).mkString,
      "short", "", "exactly sixteen!",
      (1 to 500).map(i => ('0' + i % 10).toChar).mkString(" "))
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), graft.functions.TextAnalysis
        .cdcBoundaries(col("text"), w, div).as("b"))
    val got = df.as[(Long, Seq[Int])].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == direct(t), s"text $i")
    }
  }

  test("rabin boundaries are content-stable: cuts far after an edit just shift") {
    val base = {
      var x = 42L
      (1 to 800).map { _ =>
        x = x * 6364136223846793005L + 1442695040888963407L
        ('a' + Math.floorMod(x >>> 33, 26)).toChar
      }.mkString
    }
    val edited = base.substring(0, 50) + "X" + base.substring(50)
    val cut = (s: String) => spark.createDataset(Seq(s)).toDF("text")
      .select(graft.functions.TextAnalysis.cdcBoundaries(col("text"), 16, 64)
        .as("b")).as[Seq[Int]].head()
    val b0 = cut(base).filter(_ > 66).toSet        // past the edit + window
    val b1 = cut(edited).filter(_ > 67).map(_ - 1).toSet
    assert(b0 == b1 && (b0.nonEmpty || cut(base).nonEmpty))
  }

  // ---- salted aggregation / systematic sampling ------------------------

  test("saltedSumCount equals the plain groupBy whatever the salt count") {
    val df = (1 to 3000).map(i => (s"k${i % 3}", i.toLong)).toDF("k", "v")
    val want = df.groupBy("k").agg(sum("v").as("sum_v"),
        count(lit(1)).as("count_v"))
      .as[(String, Long, Long)].collect().toSet
    for (salts <- Seq(1, 4, 32)) {
      val got = graft.operators.Skew.saltedSumCount(df, Seq("k"), "v", salts)
        .as[(String, Long, Long)].collect().toSet
      assert(got == want, s"salts=$salts")
    }
  }

  test("systematic sampling picks exactly the stride-crossing rows") {
    val rows = (1 to 200).map(i => (i.toLong, 1L + i % 7))
    val df = rows.toDF("id", "wt")
    val w = org.apache.spark.sql.expressions.Window.orderBy("id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val got = df.withColumn("cum", sum("wt").over(w))
      .filter(expr("cum div 100") > expr("(cum - wt) div 100"))
      .select("id").as[Long].collect().toSet
    // reference: walk the cumulative weight, pick first row at/after
    // each 100 boundary
    var cum = 0L
    val want = rows.flatMap { case (id, wt) =>
      val before = cum / 100; cum += wt
      if (cum / 100 > before) Some(id) else None
    }.toSet
    assert(got == want && got.nonEmpty)
  }

  test("containmentPairs drops stopgrams before pairing") {
    // one template gram shared by everyone (df=4 > maxDf=3) must not
    // produce pairs on its own
    val t = "common template header line for all documents"
    val docs = (1 to 4).map(i => (i.toLong, s"$t unique tail $i ${"x" * i}"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", 3, 100000L, 3)
    assert(got.isEmpty)
  }

  // ---- capped balance ---------------------------------------------------

  test("cappedBalance window identity equals the sequential fold") {
    val rows = for (k <- 1 to 5; i <- 1 to 200)
      yield (k.toLong, i.toLong, (rnd.nextInt(21) - 12).toLong)
    val got = graft.operators.Series
      .cappedBalance(rows.toDF("k", "i", "delta"), "k", Seq("i"), "delta")
      .select("k", "i", "balance").as[(Long, Long, Long)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    rows.groupBy(_._1).foreach { case (k, rs) =>
      var b = 0L
      rs.sortBy(_._2).foreach { case (_, i, d) =>
        b = math.max(0L, b + d)
        assert(got((k, i)) === b, s"key $k step $i")
      }
    }
    // all-negative stream pins to zero; all-positive equals prefix sum
    val edge = Seq((9L, 1L, -5L), (9L, 2L, -1L), (9L, 3L, 4L))
      .toDF("k", "i", "delta")
    val e = graft.operators.Series.cappedBalance(edge, "k", Seq("i"), "delta")
      .select("i", "balance").as[(Long, Long)].collect().toMap
    assert(e === Map(1L -> 0L, 2L -> 0L, 3L -> 4L))
  }
}
