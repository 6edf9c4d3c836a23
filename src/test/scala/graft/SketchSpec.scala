package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.Sketches

/** Misra-Gries heavy-hitter sketch: exactness in the small-cardinality
  * regime, the formal error bounds in the lossy regime (under multiple
  * partitionings, since merge order must not matter), and the SQL
  * registration. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish token stream: token i (of 200) appears ~N/(i+1) times
  private lazy val zipf: Seq[String] = {
    val rnd = new Random(11)
    val raw = (0 until 200).flatMap(i => Seq.fill(2000 / (i + 1))(s"tok$i"))
    rnd.shuffle(raw)
  }

  test("exact when distinct keys fit the capacity, any partitioning") {
    val df = zipf.filter(_.matches("tok[0-9]")).toDF("t") // 10 distinct
    val exact = df.groupBy("t").count().as[(String, Long)].collect().toMap
    for (parts <- Seq(1, 7, 32)) {
      val got = df.repartition(parts)
        .agg(Sketches.heavyHitters(col("t"), 16).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.token"), col("e.est"))
        .as[(String, Long)].collect()
      assert(got.toMap == exact, s"parts=$parts")
      // output ordering contract: est DESC, token ASC
      assert(got.map(r => (-r._2, r._1)).toSeq ==
        got.map(r => (-r._2, r._1)).sorted.toSeq)
    }
  }

  test("lossy regime honors the n/(capacity+1) bounds under any partitioning") {
    val df = zipf.toDF("t")
    val truth = zipf.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = zipf.size.toLong
    val cap = 10
    val maxErr = n / (cap + 1) // ≈ 1640 for ~18k tokens
    for (parts <- Seq(1, 13)) {
      val est = df.repartition(parts)
        .agg(Sketches.heavyHitters(col("t"), cap).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.token"), col("e.est"))
        .as[(String, Long)].collect().toMap
      assert(est.size <= cap)
      // estimates never exceed truth and undershoot by at most maxErr
      est.foreach { case (tok, e) =>
        assert(e <= truth(tok), s"overcount $tok: $e > ${truth(tok)}")
        assert(e >= truth(tok) - maxErr, s"undershoot $tok")
      }
      // every true heavy hitter survives the sketch
      truth.filter(_._2 > maxErr).keys.foreach { tok =>
        assert(est.contains(tok), s"lost heavy hitter $tok (parts=$parts)")
      }
    }
  }

  test("null inputs are skipped, not counted") {
    val df = Seq(Some("a"), None, Some("a"), Some("b"), None).toDF("t")
    val got = df.agg(Sketches.heavyHitters(col("t"), 4).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.token"), col("e.est")).as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 2L, "b" -> 1L))
  }

  // SQL registration (heavy_hitters(col, k) + literal validation) is
  // covered in ExtensionsSpec, whose session carries GraftExtensions.

  test("HLL register algebra estimates set overlap within HLL error") {
    // two overlapping id sets; union sketch = per-register max, and
    // the q_sketch_intersect integer surface (inv_scaled sums) feeds
    // the consumer-side harmonic estimate + inclusion-exclusion
    val p = 8; val m = 1 << p
    def inv(df: org.apache.spark.sql.DataFrame): Double = {
      val rows = Sketches.hllRegisters(df, "id", p)
        .as[(Long, Long)].collect().toMap
      (0 until m).map(r => math.pow(2.0, -rows.getOrElse(r.toLong, 0L)
        .toDouble)).sum
    }
    // raw HLL estimate (no small-range correction: the set sizes used
    // here are comfortably above the 2.5·m correction regime)
    def est(invSum: Double): Double =
      0.7213 / (1 + 1.079 / m) * m * m / invSum
    val a = (1 to 4000).map(i => s"u$i").toDF("id")
    val b = (3001 to 7000).map(i => s"u$i").toDF("id")
    val u = (1 to 7000).map(i => s"u$i").toDF("id")
    val (ea, eb, eu) = (est(inv(a)), est(inv(b)), est(inv(u)))
    // relative error of a p=8 HLL is ~1.04/√256 ≈ 6.5%; allow 3σ-ish
    assert(math.abs(ea - 4000) / 4000 < 0.2, s"ea=$ea")
    assert(math.abs(eu - 7000) / 7000 < 0.2, s"eu=$eu")
    val overlap = ea + eb - eu // inclusion-exclusion ≈ 1000
    assert(overlap > 0 && math.abs(overlap - 1000) < 1000 * 0.9,
      s"overlap=$overlap")
  }
}
