package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.{Corpus, Scrub}

/** Corpus-assembly operators: PII scrub, leakage-safe splits,
  * deterministic stratified sampling, token-budget packing. */
class CorpusScrubSpec extends SparkSpec {
  import spark.implicits._

  test("scrub redacts every rule kind, counts match, and is idempotent") {
    val rows = Seq(
      ("mail me at jane.doe+x@sub.example.org thanks", 1, 0, 0, 0),
      ("ssn 123-45-6789 and phone 415-555-0134 together", 0, 1, 1, 0),
      ("server at 192.168.001.255 responded", 0, 0, 0, 1),
      ("date 2026-08-12 version 3.14 range 1-2 stay untouched", 0, 0, 0, 0),
      ("two mails a@b.io c@d.ai one ip 10.0.0.1", 2, 0, 0, 1))
      .toDF("text", "e", "s", "p", "i")
    val cnts = Scrub.counts(col("text")).map { case (n, c) => c.as(n) }
    val got = rows.select(
      (col("e") +: col("s") +: col("p") +: col("i") +: cnts) :+
        Scrub.redact(col("text")).as("red"): _*).collect()
    got.foreach { r =>
      assert(r.getInt(0) == r.getInt(4), s"email count: $r")
      assert(r.getInt(1) == r.getInt(5), s"ssn count: $r")
      assert(r.getInt(2) == r.getInt(6), s"phone count: $r")
      assert(r.getInt(3) == r.getInt(7), s"ip count: $r")
    }
    // nothing matchable survives redaction
    val survivors = rows.select(Scrub.redact(col("text")).as("t"))
      .select(Scrub.counts(col("t")).map(_._2).reduce(_ + _).as("n"))
      .agg(sum("n")).as[Long].head()
    assert(survivors == 0L)
    // idempotent: scrubbing scrubbed text is the identity
    val twice = rows.select(Scrub.redact(Scrub.redact(col("text"))).as("a"),
        Scrub.redact(col("text")).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(twice == 0L)
    // untouched negative row stays byte-identical
    assert(got(3).getString(8) ==
      "date 2026-08-12 version 3.14 range 1-2 stay untouched")
  }

  test("leakFreeSplit: no component straddles splits; every doc assigned once") {
    val rnd = new Random(7)
    val docs = (0L until 300L).map(i => (i, s"d$i")).toDF("doc_id", "payload")
    val pairs = (1 to 120).map { _ =>
      val a = rnd.nextInt(300).toLong; (a, math.min(a + rnd.nextInt(5) + 1, 299L))
    }.toDF("a", "b")
    val split = Corpus.leakFreeSplit(docs, "doc_id", pairs)
    assert(split.count() == 300 &&
      split.select("doc_id").distinct().count() == 300)
    // every candidate pair lands in one split
    val straddling = pairs
      .join(split.select(col("doc_id").as("a"), col("split").as("sa")), "a")
      .join(split.select(col("doc_id").as("b"), col("split").as("sb")), "b")
      .filter(col("sa") =!= col("sb")).count()
    assert(straddling == 0L)
    // and more strongly: split is constant per component
    val perComp = split.groupBy("component")
      .agg(countDistinct("split").as("n")).filter(col("n") > 1).count()
    assert(perComp == 0L)
    assert(split.select("split").distinct().count() == 3) // all three occur
  }

  test("leakFreeSplitFromComponents: a PARTIAL labeling (edge-incident " +
       "nodes only) drops no document — singletons split as themselves") {
    val docs = (0L until 100L).map(i => (i, s"d$i")).toDF("doc_id", "payload")
    // label only docs 0-19 (two 10-doc components); 80 docs unlabeled —
    // the runBlocked shape, which emits edge-incident nodes only
    val comps = (0L until 20L).map(i => (i, if (i < 10) 0L else 10L))
      .toDF("node", "component")
    val split = Corpus.leakFreeSplitFromComponents(docs, "doc_id", comps)
    assert(split.count() == 100 &&
      split.select("doc_id").distinct().count() == 100)
    // labeled docs keep their component; unlabeled fall back to own id,
    // exactly what the full run() labeling assigns a singleton
    assert(split.filter(col("doc_id") < 20 &&
      col("component") =!= when(col("doc_id") < 10, 0L).otherwise(10L))
      .count() == 0)
    assert(split.filter(col("doc_id") >= 20 &&
      col("component") =!= col("doc_id")).count() == 0)
    // components still never straddle splits
    assert(split.groupBy("component")
      .agg(countDistinct("split").as("n")).filter(col("n") > 1)
      .count() == 0)
  }

  test("stratifiedSample: deterministic, monotone in rate, exact at bounds") {
    val docs = (0L until 2000L).map(i => (i, if (i % 3 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    def ids(ratesEn: Int, ratesDe: Int): Set[Long] =
      Corpus.stratifiedSample(docs, "doc_id", "lang",
        Map("en" -> ratesEn, "de" -> ratesDe)).select("doc_id")
        .as[Long].collect().toSet
    assert(ids(0, 0).isEmpty)
    assert(ids(1000000, 1000000).size == 2000)
    val low = ids(200000, 100000)
    val high = ids(600000, 300000)
    assert(low.subsetOf(high), "lower rate must be a subset of higher")
    assert(low == ids(200000, 100000), "same rates ⇒ identical sample")
    // rough proportions (multiplicative hash spreads sequential ids)
    val en = high.count(_ % 3 == 0)
    assert(math.abs(en / 667.0 - 0.6) < 0.08, s"en kept $en of 667")
  }

  test("packSequences: bins respect the budget arithmetic and conserve tokens") {
    val rnd = new Random(21)
    val docs = (0L until 500L)
      .map(i => (i, s"g${i % 4}", rnd.nextInt(900) + 1))
      .toDF("doc_id", "grp", "tok")
    val budget = 2048
    val packed = Corpus.packSequences(docs, "grp", "doc_id", col("tok"), budget)
    val rows = packed.select("grp", "doc_id", "n_tok", "cum_before", "bin")
      .as[(String, Long, Long, Long, Long)].collect()
    rows.foreach { case (_, id, _, cum, bin) =>
      assert(bin == cum / budget, s"doc $id: bin $bin vs cum $cum")
    }
    // conservation + per-group recomputation of the running offsets
    rows.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._2)
      var cum = 0L
      sorted.foreach { case (_, id, tok, cumBefore, _) =>
        assert(cumBefore == cum, s"doc $id offset")
        cum += tok
      }
      assert(sorted.map(_._5).max == (cum - sorted.last._3) / budget)
    }
    assert(packed.agg(sum("n_tok")).as[Long].head() ==
      docs.agg(sum("tok")).as[Long].head())
  }
}
