package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.InvertedIndex
import graft.sources.ImpactIndex

/** Impact-index contracts: bit-identical results to the exhaustive
  * BM25 scorer, and the layout claim that pruned doc blocks are NEVER
  * read — zero file-scan contribution, asserted on the scan's
  * numFiles metric against the actual directory tree. */
class ImpactIndexSpec extends SparkSpec {
  import spark.implicits._

  /** All file scans of an EXECUTED plan — descending through the AQE
    * wrapper and into materialized query stages (both are childless
    * nodes to collectLeaves, which would otherwise see no scan at
    * all). */
  private def scans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      scans(q.plan)
    case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(scans)
  }

  private def filesScanned(df: org.apache.spark.sql.DataFrame): Long =
    scans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum

  private def filesUnder(dir: String, keep: String => Boolean): Long = {
    val root = new java.io.File(dir)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(root).count(f => f.getName.endsWith(".parquet") &&
      keep(f.getPath)).toLong
  }

  private def topk(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    df.as[(Long, Long, Long)].collect().toSeq

  test("search is bit-identical to exhaustive BM25 on a random corpus") {
    val rnd = new Random(11)
    val vocab = Vector("spark", "window", "stream", "shuffle", "join",
      "agg", "scan", "sort", "hash", "merge", "plan", "code")
    val docs = (0L until 300L).map { i =>
      val n = 3 + rnd.nextInt(40)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val path = Files.createTempDirectory("impact").toString
    ImpactIndex.build(docs, "doc_id", "text", path,
      termBuckets = 8, docBuckets = 4)
    for (terms <- Seq(Seq("spark", "window", "stream"), Seq("join"),
                      Seq("hash", "merge", "plan", "code"))) {
      val exact = topk(InvertedIndex.bm25Search(docs, "doc_id", "text", terms, 10))
      val pruned = topk(ImpactIndex.search(spark, path, "doc_id", terms, 10))
      assert(pruned == exact, s"terms=$terms")
    }
  }

  test("terms absent from the corpus return an empty top-k") {
    val docs = Seq((0L, "alpha beta"), (1L, "beta gamma"))
      .toDF("doc_id", "text")
    val path = Files.createTempDirectory("impact").toString
    ImpactIndex.build(docs, "doc_id", "text", path, 4, 2)
    assert(ImpactIndex.search(spark, path, "doc_id", Seq("zeta"), 5)
      .count() == 0)
  }

  test("pruned doc blocks contribute zero file-scan rows (never opened)") {
    val docBuckets = 4
    // choose the hot block FROM the layout's own hash, then make every
    // doc in it a strong match and every other doc a weak one-term,
    // long-document match — the weak blocks' ceilings land far under θ
    val ids = (0L until 400L).toDF("doc_id")
      .withColumn("db", pmod(xxhash64(col("doc_id")), lit(docBuckets.toLong)))
    val hot = ids.filter(col("db") === 0).select("doc_id")
      .as[Long].collect().toSet
    assert(hot.size >= 10, s"degenerate hash split: ${hot.size}")
    val docs = (0L until 400L).map { i =>
      if (hot(i)) (i, Seq.fill(10)("spark window stream").mkString(" "))
      else (i, "spark " + (0 until 300).map(j => s"w${i}x$j").mkString(" "))
    }.toDF("doc_id", "text")
    val path = Files.createTempDirectory("impact").toString
    ImpactIndex.build(docs, "doc_id", "text", path,
      termBuckets = 8, docBuckets = docBuckets)

    val (res, st) = ImpactIndex.searchWithStats(spark, path, "doc_id",
      Seq("spark", "window", "stream"), 5)
    // every block holds a 'spark' posting, so all 4 carry a bound…
    assert(st.bounds.size == docBuckets, st.toString)
    // …but θ (5 strong exact scores) kills every weak block
    assert(st.survivors == Seq(0L), st.toString)

    // the final pass must equal the exhaustive scorer… (collect() on
    // res ITSELF — .as[...] would re-plan and leave res's scan
    // metrics, read below, unexecuted)
    val got = res.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got ==
      topk(InvertedIndex.bm25Search(docs, "doc_id", "text",
        Seq("spark", "window", "stream"), 5)))
    // …while opening ONLY the surviving partitions' files: the scan's
    // numFiles equals the on-disk file count under
    // term_bucket ∈ query buckets × doc_bucket = 0, strictly less
    // than the query-term buckets' total
    val scanned = filesScanned(res)
    val tbDirs = st.termBuckets.map(tb => s"term_bucket=$tb")
    def inQueryTb(p: String) = tbDirs.exists(p.contains)
    val surviving = filesUnder(s"$path/postings",
      p => inQueryTb(p) && p.contains("doc_bucket=0"))
    val allQueryTb = filesUnder(s"$path/postings", inQueryTb)
    assert(scanned == surviving,
      s"scanned=$scanned surviving=$surviving")
    assert(scanned < allQueryTb,
      s"pruning freed no files: scanned=$scanned of $allQueryTb")
  }

  test("a uniform corpus prunes nothing and still matches (θ-tie safety)") {
    // every doc identical → every block bound == θ; strict-< keeps all
    val docs = (0L until 60L).map(i => (i, "spark window stream"))
      .toDF("doc_id", "text")
    val path = Files.createTempDirectory("impact").toString
    ImpactIndex.build(docs, "doc_id", "text", path, 4, 4)
    val (res, st) = ImpactIndex.searchWithStats(spark, path, "doc_id",
      Seq("spark", "window"), 7)
    assert(st.survivors.sorted == st.bounds.keys.toSeq.sorted)
    assert(topk(res) ==
      topk(InvertedIndex.bm25Search(docs, "doc_id", "text",
        Seq("spark", "window"), 7)))
  }
}
