package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.Dedup
import graft.streaming.{BandRow, StreamingOps}

/** Ingest-time (streaming) MinHash LSH vs the batch formulation: the
  * per-row band signatures must bucket exactly like the wide-agg path,
  * and the streaming anchor state must converge to the batch pairs'
  * min-partner relation when the corpus is replayed in id order. */
class DedupStreamSpec extends SparkSpec {
  import spark.implicits._

  // 60 docs in 3 generations: docs 20-39 and 40-59 are EXACT copies of
  // 0-19 (identical text ⇒ identical signatures ⇒ shared buckets, no
  // probabilistic flakiness), with enough tokens for 3-shingles
  // independent per-seed word sequences (not strided shifts of one
  // cycle, which would share shingles and LSH-collide across seeds) —
  // only the planted cross-generation copies share signatures
  private val words = Seq("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi",
    "omicron", "pi", "rho", "sigma", "tau", "upsilon", "phi", "chi", "psi")
  private def textFor(i: Long): String = {
    val rnd = new scala.util.Random((i % 20) + 1)
    (0 until 12).map(_ => words(rnd.nextInt(words.length))).mkString(" ")
  }
  private lazy val docs =
    (0L until 60L).map(i => (i, textFor(i))).toDF("doc_id", "text")

  test("per-row band signatures bucket identically to the wide-agg path") {
    val bs = Dedup.bandSignatureRows(docs, "doc_id", "text", 3, 16, 4)
    val viaRows = bs.as("a").join(bs.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct().as[(Long, Long)].collect().toSet
    val viaAgg = Dedup.lshCandidatePairs(docs, "doc_id", "text", 3, 16, 4)
      .as[(Long, Long)].collect().toSet
    assert(viaRows == viaAgg)
    assert(viaAgg.nonEmpty, "planted exact copies must pair")
  }

  test("streamed anchors converge to the batch min-partner relation") {
    // stage the corpus as 3 id-ordered files → 3 microbatches
    val dir = java.nio.file.Files.createTempDirectory("dedup_stream")
    val src = dir.resolve("src"); java.nio.file.Files.createDirectories(src)
    (0 until 3).foreach { g =>
      val tmp = dir.resolve(s"w$g").toString
      docs.filter(col("doc_id") >= g * 20 && col("doc_id") < (g + 1) * 20)
        .coalesce(1).write.parquet(tmp)
      val f = new java.io.File(tmp).listFiles
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(f.toPath, src.resolve(s"$g.parquet"))
    }
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString)
    val bandRows = Dedup.bandSignatureRows(stream, "doc_id", "text", 3, 16, 4)
      .as[BandRow]
    val q = StreamingOps.nearDupAnchors(bandRows)
      .writeStream.outputMode("update")
      .format("memory").queryName("anchors")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("anchors")
      .groupBy("doc_id").agg(min("anchor").as("anchor"))
      .as[(Long, Long)].collect().toMap
    // batch truth: min smaller-id partner over LSH pairs, else self
    val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text", 3, 16, 4)
      .as[(Long, Long)].collect()
    val expected = (0L until 60L).map { d =>
      val partners = pairs.collect { case (a, b) if b == d => a }
      d -> (if (partners.isEmpty) d else math.min(d, partners.min))
    }.toMap
    assert(streamed == expected)
    // the planted copies really were caught against PRIOR generations
    assert((20L until 60L).forall(d => streamed(d) < d),
      "every copy must anchor to an earlier generation")
    assert((0L until 20L).forall(d => streamed(d) == d),
      "first generation must self-anchor")
  }
}
