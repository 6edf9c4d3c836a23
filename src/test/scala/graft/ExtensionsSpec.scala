package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL surface via SparkSessionExtensions — a pure-SQL user's view. */
class ExtensionsSpec extends AnyFunSuite {

  // getOrCreate would silently return any session another suite already
  // made (without our extensions) — force a fresh SparkSession (the
  // SparkContext is still reused). `.withExtensions` is the
  // programmatic path; the `spark.sql.extensions` config line only
  // works when it is present at SparkContext creation (static conf).
  lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .withExtensions(new GraftExtensions)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  }

  test("custom expressions are callable from SQL") {
    val row = spark.sql("""
      SELECT simhash60(array('the', 'quick', 'fox')) AS sh,
             cosine_sim(array(1.0F, 2.0F), array(1.0F, 2.0F)) AS cs,
             dot_product(array(1.0F, 2.0F), array(3.0D, 4.0D)) AS dp,
             word_shingles(array('a', 'b', 'c'), 2) AS ws,
             normalize_text('  Hello,  WORLD!! 42 ') AS nt
    """).head()
    assert(row.getAs[Long]("sh") != 0L)
    assert(math.abs(row.getAs[Double]("cs") - 1.0) < 1e-12)
    assert(row.getAs[Double]("dp") == 11.0)
    assert(row.getSeq[String](3).toList == List("a b", "b c"))
    assert(row.getAs[String]("nt") == "hello world 42")
  }

  test("rabin_boundaries and topk_pairs are callable from SQL") {
    val r = spark.sql("""
      SELECT rabin_boundaries(repeat('abcdefghij', 40), 16, 8) AS rb,
             g, topk_pairs(s, i, 2) AS tk
      FROM VALUES (1, 5.0D, 10L), (1, 7.0D, 11L), (1, 7.0D, 9L),
                  (1, 1.0D, 12L) AS t(g, s, i)
      GROUP BY g
    """).head()
    assert(r.getSeq[Int](0).nonEmpty)
    val tk = r.getSeq[org.apache.spark.sql.Row](2)
      .map(x => (x.getDouble(0), x.getLong(1)))
    assert(tk.toList == List((7.0, 9L), (7.0, 11L)))
    // parameter validation is analysis-time, not a builder-time CCE
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT topk_pairs(1.0D, 1L, 0)").head()
    }
    assert(e.getMessage.contains("positive integral literal"))
  }

  test("word_shingles n: integral literals of any width are accepted") {
    val r = spark.sql(
      "SELECT word_shingles(array('a','b','c'), 2L) AS l, " +
      "       word_shingles(array('a','b','c'), CAST(2 AS SMALLINT)) AS s")
      .head()
    assert(r.getSeq[String](0).toList == List("a b", "b c"))
    assert(r.getSeq[String](1).toList == List("a b", "b c"))
  }

  test("word_shingles n: invalid arguments raise AnalysisException") {
    import org.apache.spark.sql.AnalysisException
    // non-integral literal
    val e1 = intercept[AnalysisException] {
      spark.sql("SELECT word_shingles(array('a'), 'two')").head()
    }
    assert(e1.getMessage.contains("integral literal"))
    // non-foldable argument (a column reference)
    val e2 = intercept[AnalysisException] {
      spark.sql("SELECT word_shingles(array('a'), n) FROM (SELECT 2 AS n)")
        .head()
    }
    assert(e2.getMessage.toLowerCase.contains("foldable"))
    // wrong arity
    intercept[AnalysisException] {
      spark.sql("SELECT word_shingles(array('a'))").head()
    }
    // out-of-INT-range bigint
    val e3 = intercept[AnalysisException] {
      spark.sql("SELECT word_shingles(array('a'), 5000000000L)").head()
    }
    assert(e3.getMessage.contains("integral literal"))
  }

  test("heavy_hitters is callable from SQL and validates its k literal") {
    import org.apache.spark.sql.AnalysisException
    val rows = spark.sql("""
      SELECT e.token, e.est
      FROM (SELECT explode(heavy_hitters(t, 4)) AS e
            FROM VALUES ('a'), ('b'), ('a'), ('c'), ('a'), ('b') v(t))
    """).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(("a", 3L), ("b", 2L), ("c", 1L)),
      "exact counts, est DESC / token ASC order")
    val bad = intercept[AnalysisException] {
      spark.sql("SELECT heavy_hitters(t, 0) FROM VALUES ('a') v(t)").head()
    }
    assert(bad.getMessage.contains("positive integral literal"))
    val nonLit = intercept[AnalysisException] {
      spark.sql("SELECT heavy_hitters(t, length(t)) FROM VALUES ('a') v(t)").head()
    }
    assert(nonLit.getMessage.toLowerCase.contains("foldable") ||
           nonLit.getMessage.contains("literal"))
  }

  // ---- docs/SQL.md — the SQL front door, spec-tested verbatim ----

  /** Every fenced ```sql block in docs/SQL.md carries a
    * `-- recipe: <name>` tag; this parses them so the DOC is the test
    * input — a doc edit that breaks a recipe fails here. */
  private lazy val recipes: Map[String, String] = {
    val md = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("docs/SQL.md")), "UTF-8")
    val re = "(?s)```sql\\s*\\n-- recipe: (\\w+)\\n(.*?)```".r
    re.findAllMatchIn(md).map(m => m.group(1) -> m.group(2)).toMap
  }

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val installed: Unit = GraftSql.install(spark, sfDir)

  private def run(name: String) = {
    installed
    assert(recipes.contains(name), s"docs/SQL.md lost recipe '$name'")
    spark.sql(recipes(name))
  }

  test("docs/SQL.md recipes run verbatim: retention views match the " +
       "Scala pipeline") {
    import org.apache.spark.sql.functions._
    val cfg = graft.retention.StarAdapter.config(spark, sfDir)
    val ranges = graft.retention.Retention.householdRanges(
      graft.retention.StarAdapter.persons(spark, sfDir),
      graft.retention.StarAdapter.encounters(spark, sfDir), cfg)
    val viaSql = run("retention_retained_households").collect().toSet
    val viaScala = ranges.filter(col("retained"))
      .select("household_id", "gte", "lte", "start_date", "end_date")
      .collect().toSet
    assert(viaSql == viaScala && viaSql.nonEmpty)
    val hist = run("retention_person_history")
    assert(hist.count() > 0)
    // every person's range count reconciles with the history view
    val n = spark.sql(
      "SELECT sum(n_ranges) FROM (" + recipes("retention_person_history") + ")")
      .head().getLong(0)
    assert(n == spark.table("retention_history").count())
  }

  test("docs/SQL.md recipes run verbatim: dedup family") {
    import spark.implicits._
    val dup = run("exact_dedup_groups").as[(String, Long, Long)].collect()
    dup.foreach { case (_, copies, _) => assert(copies > 1) }
    val pairsSql = run("near_dup_sources")
    assert(pairsSql.columns.toList == List("src_a", "src_b", "dup_pairs"))
    val nPairsViaView = spark.table("dedup_pairs").count()
    assert(pairsSql.agg(org.apache.spark.sql.functions.sum("dup_pairs"))
      .head().getLong(0) == nPairsViaView)
    val kept = run("deduped_count").head().getLong(0)
    val expected = graft.functions.Dedup.dropNearDuplicates(
      Tables.load(spark, sfDir, "documents"), "doc_id", "text", 3, 16, 4)
      .count()
    assert(kept == expected && kept > 0)
  }

  test("docs/SQL.md recipes run verbatim: BM25 over the postings view " +
       "equals the Scala scorer") {
    import spark.implicits._
    val viaSql = run("bm25_topk").as[(Long, Long, Long)].collect().toList
    val viaScala = graft.functions.InvertedIndex.bm25Search(
        Tables.load(spark, sfDir, "documents"), "doc_id", "text",
        Seq("spark", "window", "stream"), 10)
      .as[(Long, Long, Long)].collect().toList
    assert(viaSql == viaScala && viaSql.nonEmpty)
  }

  test("docs/SQL.md recipes run verbatim: similarity + simhash") {
    import spark.implicits._
    val top = run("cosine_topk").as[(Long, Double)].collect().toList
    assert(top.size == 5)
    assert(top.head._1 == 7L && math.abs(top.head._2 - 1.0) < 1e-6,
      "the query vector must be its own best match")
    assert(top.map(-_._2) == top.map(-_._2).sorted, "cos DESC order")
    val sh = run("shingle_simhash")
    // Scala-API twin of the exact recipe composition: 3-shingles of the
    // normalized tokens through the same Catalyst expressions
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.functions.{col, length, split}
    import graft.functions.expressions.{SimHash60, WordShingles}
    val toks = split(graft.functions.TextAnalysis.normalized(col("text")), " ")
    val viaScala = Tables.load(spark, sfDir, "documents")
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), GraftSqlBridge.column(SimHash60(
        WordShingles(GraftSqlBridge.expression(toks), 3))).as("sh"))
    assert(sh.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      viaScala.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
  }

  test("docs/SQL.md recipes run verbatim: graph + corpus-composition " +
       "views match the Scala operators") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val coEdges = QueryHelpers.coEdgesFor(spark, sfDir).select("u", "v")
    // communities: recipe top-5 vs the operator's own label sizes
    val viaScala = graft.operators.LabelPropagation
      .run(coEdges, "u", "v", rounds = 3)
      .groupBy("label").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("label")).limit(5)
      .as[(Long, Long)].collect().toSeq
    val viaSql = run("community_sizes").as[(Long, Long)].collect().toSeq
    assert(viaSql == viaScala && viaSql.nonEmpty)
    // walk sentences: one sentence per (seed, walk_no), node sequence
    // equal to the operator's step-ordered output
    val sentences = run("walk_sentences")
      .as[(Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val walks = graft.operators.RandomWalk.deterministicWalks(
        coEdges, "u", "v",
        Tables.load(spark, sfDir, "supplier").select(col("s_suppkey")),
        "s_suppkey", walksPerSeed = 2, steps = 3)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(r => (r._1, r._2))
      .map { case (k, rs) =>
        k -> rs.sortBy(_._3).map(_._4).mkString(" ") }
    assert(sentences == walks && sentences.nonEmpty)
    // stratum signature terms: rank-1 rows of the operator output
    val sig = run("source_signature_terms")
      .as[(String, String, Long)].collect().toSet
    val sigScala = graft.functions.TextAnalysis
      .distinctiveTerms(spark.table("documents"), "source", "text")
      .filter(col("rank") === 1)
      .select(col("stratum"), col("term"), col("lift_ppm"))
      .as[(String, String, Long)].collect().toSet
    assert(sig == sigScala && sig.nonEmpty)
  }

  test("docs/SQL.md recipes run verbatim: multimodal views match the " +
       "Scala decode tier") {
    import spark.implicits._
    val qa = run("media_shard_qa")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val scalaQa = graft.multimodal.Multimodal
      .decodeHeaders(QueryHelpers.mediaCorpus(spark)).collect()
      .groupBy(_.kind).map { case (k, rs) =>
        k -> (rs.length.toLong, rs.count(_.meta_ok == 0L).toLong,
              rs.map(_.n_bytes).sum) }
    assert(qa == scalaQa && qa.keySet == Set("image", "audio", "video"))
    assert(qa.values.forall(_._2 == 0L), "fixture must not drift")
    val bright = run("media_brightest_images")
      .as[(Long, Long, Long, Long)].collect()
    assert(bright.length == 5)
    val lumas = bright.map(_._4)
    assert(lumas.sameElements(lumas.sorted.reverse), "luma DESC order")
    val loud = run("media_loud_audio").as[(Long, Long, Long, Long)].collect()
    val scalaLoud = graft.multimodal.Multimodal
      .audioStats(QueryHelpers.mediaCorpus(spark)).collect()
      .filter(_.peak_abs > 8000)
      .map(a => (a.media_id, a.n_samples, a.peak_abs,
                 a.energy / a.n_samples)).toSet
    assert(loud.toSet == scalaLoud && loud.nonEmpty)
  }
}
