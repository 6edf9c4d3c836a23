package graft

import org.apache.spark.sql.functions._

import graft.functions.{Corpus, Decontam}

/** Export-side corpus operators: benchmark decontamination, mixture
  * allocation, and deterministic shard shuffling. */
class CorpusExportSpec extends SparkSpec {
  import spark.implicits._

  // ---- decontamination ---------------------------------------------------

  test("decontamination flags exactly the docs sharing a bench n-gram") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "pack my box with five dozen liquor jugs"),          // clean
      (2L, "we saw a quick brown fox running away yesterday"),  // 1 hit
      (3L, "Quick, Brown FOX!! (normalization must catch this)"),
      (4L, "brown fox quick — right words, wrong order"),       // clean
      (5L, "")).toDF("doc_id", "text")                          // no grams
    val bench = Seq("a quick brown fox appears in the exam question")
      .toDF("snippet")
    val got = Decontam.report(docs, "doc_id", "text", bench, "snippet", 3)
      .as[(Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap // shape: id -> (hits, flag)
    // bench grams: "a quick brown", "quick brown fox", "brown fox appears",
    //   "fox appears in", "appears in the", "in the exam", "the exam question"
    assert(got(0L) == (1L, true),  "doc 0 shares 'quick brown fox'")
    assert(got(1L) == (0L, false), "doc 1 is clean")
    assert(got(2L) == (2L, true),  "doc 2 shares 'a quick brown' + 'quick brown fox'")
    assert(got(3L) == (1L, true),  "doc 3 matches after normalization")
    assert(got(4L) == (0L, false), "word order matters for n-grams")
    assert(got(5L) == (0L, false), "empty doc has no grams")
    assert(got.size == 6, "every input doc gets a report row")
  }

  test("decontamination against an empty or gram-less benchmark flags nothing") {
    val docs = Seq((0L, "the quick brown fox")).toDF("doc_id", "text")
    val empty = Seq.empty[String].toDF("snippet")
    val gotEmpty = Decontam.report(docs, "doc_id", "text", empty, "snippet", 3)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(gotEmpty == Seq((0L, 0L, false)))
    val short = Seq("too short").toDF("snippet") // < n tokens ⇒ no grams
    val gotShort = Decontam.report(docs, "doc_id", "text", short, "snippet", 3)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(gotShort == Seq((0L, 0L, false)))
  }

  test("decontamination counts DISTINCT hit grams, not occurrences") {
    val docs = Seq((0L, "alpha beta gamma then alpha beta gamma again"))
      .toDF("doc_id", "text")
    val bench = Seq("alpha beta gamma").toDF("snippet")
    val got = Decontam.report(docs, "doc_id", "text", bench, "snippet", 3)
      .as[(Long, Long, Boolean)].head()
    assert(got == ((0L, 1L, true)), "repeated gram counts once")
  }

  // ---- mixture allocation ------------------------------------------------

  private lazy val mixDocs = {
    // supply: a=600, b=150, c=250; target weights 50/25/25 →
    // binding stratum is b (150/0.25 = 600 total), a and c downsample
    val rows = (0L until 600L).map((_, "a")) ++
      (600L until 750L).map((_, "b")) ++ (750L until 1000L).map((_, "c"))
    rows.toDF("doc_id", "stratum")
  }

  test("mixture allocation honors exact proportions and the binding stratum") {
    val alloc = Corpus.mixtureAllocation(mixDocs, "stratum",
        Map("a" -> 500000L, "b" -> 250000L, "c" -> 250000L))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // t_max = min(600*1e6/5e5, 150*1e6/2.5e5, 250*1e6/2.5e5) = 600
    assert(alloc("a") == (("a", 600L, 500000L, 300L, 500000L)))
    assert(alloc("b") == (("b", 150L, 250000L, 150L, 1000000L)),
      "binding stratum keeps everything")
    assert(alloc("c") == (("c", 250L, 250000L, 150L, 600000L)))
    // realized proportions are exactly the targets
    val total = alloc.values.map(_._4).sum
    assert(total == 600L)
    assert(alloc("a")._4 * 2 == total && alloc("b")._4 * 4 == total)
  }

  test("zero-weight strata are dropped; sample respects computed rates") {
    val sampled = Corpus.mixtureSample(mixDocs, "doc_id", "stratum",
      Map("a" -> 500000L, "b" -> 250000L, "c" -> 250000L))
    val bySt = sampled.groupBy("stratum").count()
      .as[(String, Long)].collect().toMap
    assert(bySt("b") == 150L, "rate 1e6 keeps the whole binding stratum")
    // hash sampling approximates the target; 600→~300 and 250→~150
    assert(math.abs(bySt("a") - 300L) <= 60, s"a sampled ${bySt("a")}")
    assert(math.abs(bySt("c") - 150L) <= 45, s"c sampled ${bySt("c")}")
    // dropping c from the weights removes it entirely
    val noC = Corpus.mixtureSample(mixDocs, "doc_id", "stratum",
      Map("a" -> 500000L, "b" -> 500000L))
    assert(!noC.select("stratum").distinct().as[String].collect().contains("c"))
    // monotone: a smaller total (tighter weights on same supply) samples
    // a SUBSET per stratum — same coin, lower threshold
    val ids = sampled.filter(col("stratum") === "a")
      .select("doc_id").as[Long].collect().toSet
    val tighter = Corpus.mixtureSample(mixDocs, "doc_id", "stratum",
        Map("a" -> 250000L, "b" -> 250000L, "c" -> 500000L))
      .filter(col("stratum") === "a").select("doc_id").as[Long].collect().toSet
    assert(tighter.subsetOf(ids), "lower rate ⇒ subset of the higher-rate sample")
  }

  test("mixture allocation rejects bad weights") {
    intercept[IllegalArgumentException] {
      Corpus.mixtureAllocation(mixDocs, "stratum", Map("a" -> 0L))
    }
    intercept[IllegalArgumentException] {
      Corpus.mixtureAllocation(mixDocs, "stratum",
        Map("a" -> 600000L, "b" -> 600000L))
    }
  }

  // ---- shard shuffle -----------------------------------------------------

  test("shard assignment is a deterministic, balanced, append-stable permutation") {
    val docs = (0L until 2000L).toDF("doc_id")
    val a = Corpus.shardAssign(docs, "doc_id", 8, "v1")
      .as[(Long, Long, Int)].collect()
    // permutation: every doc appears once, keys are collision-free here
    assert(a.length == 2000 && a.map(_._1).distinct.length == 2000)
    assert(a.map(_._2).distinct.length == 2000, "sort keys distinct")
    assert(a.forall(r => r._3 >= 0 && r._3 < 8))
    // balance: 2000/8 = 250 expected; md5 keeps shards within ±20%
    val sizes = a.groupBy(_._3).view.mapValues(_.length)
    assert(sizes.values.min > 200 && sizes.values.max < 300,
      s"shard sizes ${sizes.toMap}")
    // deterministic rerun
    val b = Corpus.shardAssign(docs, "doc_id", 8, "v1")
      .as[(Long, Long, Int)].collect()
    assert(a.sortBy(_._1).sameElements(b.sortBy(_._1)))
    // append stability: the first 1000 docs keep their assignment
    val half = Corpus.shardAssign((0L until 1000L).toDF("doc_id"),
      "doc_id", 8, "v1").as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(half.sameElements(a.filter(_._1 < 1000L).sortBy(_._1)))
    // a different salt draws a genuinely different permutation
    val v2 = Corpus.shardAssign(docs, "doc_id", 8, "v2")
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(v2.map(_._2).toSeq != a.sortBy(_._1).map(_._2).toSeq)
  }

  test("writeShards emits one sorted parquet dir per shard") {
    val docs = (0L until 500L).toDF("doc_id")
    val out = java.nio.file.Files.createTempDirectory("shards").toString
    Corpus.writeShards(docs, "doc_id", 4, "v1", out)
    val dirs = new java.io.File(out).listFiles
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(dirs.sameElements((0 until 4).map(i => s"shard=$i")))
    val back = spark.read.parquet(out)
    assert(back.count() == 500L)
    // within every file, rows are in sort_key order (the trainer's
    // stream order); file order is what sortWithinPartitions wrote
    val perFile = back
      .select(input_file_name().as("f"), col("sort_key"))
      .withColumn("rn", monotonically_increasing_id())
    val files = perFile.as[(String, Long, Long)].collect()
      .groupBy(_._1).values
    files.foreach { rows =>
      val keys = rows.sortBy(_._3).map(_._2).toSeq
      assert(keys == keys.sorted, "rows within a shard file are key-sorted")
    }
  }
}
