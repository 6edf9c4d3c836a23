package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Focused retrieval A/B: exhaustive BM25 vs WAND-pruned vs the
  * block-max bucketed [[graft.sources.ImpactIndex]], all answering the
  * same top-k from their PERSISTED form — the stored-index access
  * path, which is what a 100-TB deployment actually queries.
  *
  * Round-8's honest negative result: max-score pruning cannot beat
  * exhaustive scoring while the bound pass still READS every posting
  * (BASELINE.md round-8 WAND row). This main measures whether the
  * layout fix — term+doc-bucketed postings with per-block ceilings, so
  * pruned buckets are never opened — finally wins, and by how much,
  * at a chosen document scale.
  *
  *   SPARK_GRAFT_CPUS=16 runMain graft.RetrievalAb <sfDir> <copies> [out.json]
  *
  * `copies` replicates the documents table with the ScaleFixture text
  * rotation (replicas share vocabulary, not shingles) — copies=10 on
  * sf0.1 is the sf1 corpus, copies=100 the sf10 one. Index/postings
  * BUILD time is reported separately: it is the nightly index job,
  * amortized over every query, not per-search cost.
  */
object RetrievalAb {
  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val copies = if (args.length > 1) args(1).toInt else 10
    val outJson = args.drop(2).headOption
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val scratch = java.nio.file.Files.createTempDirectory("retrieval_ab")
      .toString
    val terms = Seq("spark", "window", "stream")
    val k = 10

    // scaled corpus: the ScaleFixture documents rotation, inline
    val src = spark.read.parquet(s"$srcDir/documents.parquet")
      .select("doc_id", "text")
    val docS = src.agg(max("doc_id")).head().getLong(0) + 1L
    val docs = (0 until copies).map { i =>
      src.withColumn("doc_id", col("doc_id") + lit(i * docS))
        .withColumn("text", if (i == 0) col("text") else
          array_join(concat(
            slice(split(col("text"), " "), i + 1, 100000),
            slice(split(col("text"), " "), 1, i)), " "))
    }.reduce(_ unionByName _)
    val nDocs = docs.count()

    def timeIt(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      (math.rint((System.nanoTime() - t0) / 1e6) / 1000, n)
    }
    def min2(f: => Long): (Double, Long) = {
      val a = timeIt(f); val b = timeIt(f)
      (math.min(a._1, b._1), b._2)
    }

    // persisted forms: flat postings parquet (the exhaustive/WAND
    // side's stored index) and the bucketed impact index
    val (buildFlatSec, _) = timeIt {
      graft.functions.InvertedIndex.postings(docs, "doc_id", "text")
        .write.mode("overwrite").parquet(s"$scratch/postings")
      0L
    }
    val posts = spark.read.parquet(s"$scratch/postings")
    val (buildIdxSec, _) = timeIt {
      graft.sources.ImpactIndex.build(docs, "doc_id", "text",
        s"$scratch/impact", termBuckets = 64, docBuckets = 32)
      0L
    }

    def checksum(df: DataFrame): Long =
      // XOR fold, not sum: a BIGINT sum of hashes overflows under ANSI
      df.agg(expr("bit_xor(xxhash64(doc_id, score_micro, n_terms))"))
        .head().getLong(0)

    val (exhaustiveSec, exSum) = min2(checksum(
      graft.functions.InvertedIndex.bm25SearchFrom(posts, "doc_id", terms, k)))
    val (wandSec, wandSum) = min2(checksum(
      graft.functions.InvertedIndex.bm25SearchPrunedFrom(posts, "doc_id", terms, k)))
    val (bucketedSec, bkSum) = min2(checksum(
      graft.sources.ImpactIndex.search(spark, s"$scratch/impact",
        "doc_id", terms, k)))
    require(exSum == wandSum && exSum == bkSum,
      s"top-k disagree: exhaustive=$exSum wand=$wandSum bucketed=$bkSum")

    val (_, st) = graft.sources.ImpactIndex.searchWithStats(
      spark, s"$scratch/impact", "doc_id", terms, k)
    val json =
      s"""{"metric":"retrieval_ab","copies":$copies,"n_docs":$nDocs,""" +
      s""""exhaustive_sec":$exhaustiveSec,"wand_sec":$wandSec,""" +
      s""""bucketed_sec":$bucketedSec,""" +
      s""""build_flat_sec":$buildFlatSec,"build_impact_sec":$buildIdxSec,""" +
      s""""blocks_total":${st.bounds.size},""" +
      s""""blocks_survived":${st.survivors.size},""" +
      s""""theta":${st.theta},"sf":"$srcDir"}"""
    println(json)
    outJson.foreach(p => java.nio.file.Files.write(
      java.nio.file.Paths.get(p),
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    spark.stop()
  }
}
