package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted index over a document corpus: term → posting list, plus
  * conjunctive (AND) keyword search expressed as posting-list
  * intersection.
  *
  * The reference's engine-side is literally a search index (ES bool/
  * term/range queries — reference HouseholdRetentionProcessing.scala:
  * 167-186 build the query DSL); this is the other direction: BUILD
  * the index relationally. The postings relation is the thing a 100 TB
  * deployment persists bucketed by `term` — then every search is a
  * bucket-pruned scan of |query terms| buckets and the intersection an
  * exchange-free partial aggregate, never a full-corpus text scan.
  */
object InvertedIndex {

  /** Normalized, empty-free tokens — same canonical form as
    * [[TextAnalysis.normalized]] so the SQL oracle tokenizes
    * identically (`string_split` of the trimmed normalization). */
  def termsOf(text: Column): Column =
    filter(split(TextAnalysis.normalized(text), " "), t => t =!= "")

  /** The postings relation: one row per (term, doc) with the term
    * frequency. This is the scale-out layout (bucket by `term`);
    * [[index]] is its per-term rollup. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), explode(termsOf(col(textCol))).as("term"))
      .groupBy(col("term"), col(idCol))
      .agg(count(lit(1)).as("tf"))

  /** Per-term index rollup: document frequency, total term frequency,
    * and the sorted posting list (stringified — the cross-engine-
    * stable surface for an array aggregate). `minDf`/`maxDf` drop
    * hapaxes and stopword-grade terms — the standard cap that keeps a
    * web-scale index's heaviest posting lists out of a single task.
    * `maxDfPct` is the SCALE-INVARIANT form of the cap (df ≤ pct% of
    * the corpus): an absolute maxDf tuned at one corpus size silently
    * empties the index at 10× (caught by the sf1 ANSI sweep — every
    * term's df outgrew the absolute cap). Applied relationally (one
    * broadcast 1-row count), integer-exact (df·100 ≤ n·pct). */
  def index(docs: DataFrame, idCol: String, textCol: String,
            minDf: Long = 1L, maxDf: Long = Long.MaxValue,
            maxDfPct: Int = 100): DataFrame = {
    val rolled = postings(docs, idCol, textCol)
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_total"),
           concat_ws(",",
             transform(array_sort(collect_list(col(idCol))),
                       x => x.cast("string"))).as("posting_list"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
    if (maxDfPct >= 100) rolled
    else rolled
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("n_docs"))))
      .filter(expr(s"df * 100 <= n_docs * $maxDfPct"))
      .drop("n_docs")
  }

  /** Positional postings: one row per (doc, position, term) over the
    * normalized token sequence — the layout phrase queries need
    * (bucket by term at scale, positions ride along as payload). */
  def positionalPostings(docs: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    docs.select(col(idCol),
                posexplode(termsOf(col(textCol))).as(Seq("pos", "term")))

  /** Phrase search: documents containing the exact consecutive token
    * sequence. Each term's postings shift their positions back by the
    * term's phrase offset; a phrase start exists where ALL shifted
    * sets agree on (doc, position) — equi-joins on (doc, pos), no text
    * rescan. Handles repeated terms (each offset joins the posting set
    * independently). */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val p = positionalPostings(docs, idCol, textCol)
    val frames = phrase.zipWithIndex.map { case (t, i) =>
      p.filter(col("term") === t)
        .select(col(idCol), (col("pos") - i).as("p0"))
    }
    val starts = frames.reduce((a, b) => a.join(b, Seq(idCol, "p0")))
    docs.join(starts.select(col(idCol)).distinct(), Seq(idCol), "left_semi")
  }

  /** Disjunctive ranked search: integer tf-idf-surface score
    * (`tf·10⁶ div df`, the cross-engine-exact ranking used by
    * [[TextAnalysis]] term stats) summed over matched query terms;
    * global top-k plans as TakeOrderedAndProject. df is counted over
    * the query terms' postings only — filter first, then count — so
    * the scan touches |query terms| posting buckets, not the corpus. */
  def rankedSearch(docs: DataFrame, idCol: String, textCol: String,
                   terms: Seq[String], k: Int): DataFrame =
    rankedSearchFrom(postings(docs, idCol, textCol), idCol, terms, k)

  /** [[rankedSearch]] over a pre-built (ideally materialized) postings
    * relation — the persisted-index shape: at 100 TB the postings ARE
    * the stored artifact and every search reuses them. */
  def rankedSearchFrom(posts: DataFrame, idCol: String,
                       terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size)
    import org.apache.spark.sql.expressions.Window
    val hits = posts
      .filter(col("term").isin(terms: _*))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .withColumn("score_micro", expr("tf * 1000000 div df"))
    hits.groupBy(col(idCol))
      .agg(sum(col("score_micro")).as("score_micro"),
           count(lit(1)).as("n_terms"))
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(k)
  }

  /** BM25 ranked retrieval (k1 = 1.2, b = 0.75), integer-exact. The
    * classic saturated-tf × length-normalized × rarity-weighted score,
    * re-derived so every step is BIGINT arithmetic both engines
    * reproduce bit-identically:
    *
    *   sat = tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))     — clear the
    *   rational k1/b and avgdl denominators (×20·avgdl_milli):
    *   sat_micro  = 44·tf·S·10⁶ div (20·tf·S + 6·S + 18·d)
    *     where S = avgdl in milli-tokens (tot·1000 div n_docs) and
    *           d = dl·1000
    *   w_ppm      = N·10⁶ div df            — log-free rarity weight
    *                (N/df instead of ln-idf: keeps the score integral;
    *                same ranking direction, spec'd contract)
    *   term_score = sat_micro·w_ppm div 10⁶
    *
    * Doc length comes from the SAME postings relation the scorer uses
    * (dl = Σ tf over all the doc's terms), so tokenization stays
    * single-sourced. N = docs with ≥1 token. Scale shape identical to
    * [[rankedSearch]]: postings groupBy, a df window per query term,
    * one broadcast 1-row stats frame — no text rescan. */
  def bm25Search(docs: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], k: Int): DataFrame =
    bm25SearchFrom(postings(docs, idCol, textCol), idCol, terms, k)

  /** The ONE definition of the integer BM25 term score (micro units) —
    * shared by every scorer here plus [[graft.sources.ImpactIndex]]'s
    * index-time builder and delta scorer, whose contract is BIT
    * parity with [[bm25Search]]: a tuning edit to a private copy
    * would silently break index-time vs query-time score equality.
    * `tf`/`dlMilli` are SQL sub-expressions (WAND's ceiling passes
    * `max_tf` / `min_dl * 1000`); `s_milli`, `nd`, `df` must be in
    * scope. */
  private[graft] def termScoreSql(tf: String, dlMilli: String): String =
    s"(44 * ($tf) * s_milli * 1000000 div" +
    s" (20 * ($tf) * s_milli + 6 * s_milli + 18 * ($dlMilli)))" +
    " * (nd * 1000000 div df) div 1000000"

  /** [[bm25Search]] over a pre-built postings relation. */
  def bm25SearchFrom(posts: DataFrame, idCol: String,
                     terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size)
    import org.apache.spark.sql.expressions.Window
    val dl = posts.groupBy(col(idCol)).agg(sum("tf").as("dl"))
    val stats = dl.agg(sum("dl").as("tot"), count(lit(1)).as("nd"))
    posts.filter(col("term").isin(terms: _*))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("s_milli", expr("tot * 1000 div nd"))
      .withColumn("term_score", expr(termScoreSql("tf", "dl * 1000")))
      .groupBy(col(idCol))
      .agg(sum("term_score").as("score_micro"),
           count(lit(1)).as("n_terms"))
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(k)
  }

  /** BM25 top-k with WAND-style max-score pruning — the 100-TB scale
    * path next to [[bm25Search]] (identical results, differential- and
    * oracle-tested). At scale the disjunctive-query cost is posting
    * volume: every posting of every query term flows through the dl
    * join + saturation arithmetic + global top-k. The max-score trick
    * prunes whole documents BEFORE the expensive exact scoring using
    * per-term score ceilings — the metadata a production index stores
    * next to each posting list:
    *
    *   u_t   = sat_micro(max tf of t, min dl anywhere) · w_ppm(t)
    *           — an upper bound on ANY doc's score contribution from t
    *           (sat is monotone ↑ in tf, ↓ in dl)
    *   θ     = k-th best EXACT score among the docs of the rarest
    *           query term (shortest posting list → cheapest to score;
    *           any ≥k exactly-scored docs give a sound lower bound on
    *           the global k-th score; θ=0 when it has <k docs)
    *   prune = drop every doc with Σ_{t ∈ doc} u_t < θ — its exact
    *           score is ≤ the bound, so it cannot reach the top k
    *
    * The bound pass touches only (term, doc, tf) — no dl join, no
    * saturation math; survivors alone pay exact scoring. Soundness:
    * score(d) ≤ bound(d) < θ ≤ score of ≥k other docs ⇒ d is not in
    * the top k (strict <, so θ-ties are kept). */
  def bm25SearchPruned(docs: DataFrame, idCol: String, textCol: String,
                       terms: Seq[String], k: Int): DataFrame =
    bm25SearchPrunedFrom(postings(docs, idCol, textCol), idCol, terms, k)

  /** [[bm25SearchPruned]] over a pre-built postings relation. */
  def bm25SearchPrunedFrom(posts: DataFrame, idCol: String,
                           terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty && terms.distinct.size == terms.size)
    import org.apache.spark.sql.expressions.Window
    // dl and hits feed 3-4 consumers below (θ seed, bound pass, final
    // scoring); materialize each ONCE — without this the full-postings
    // dl aggregation re-ran 3× and the hits window 4×, a fixed cost
    // that buried the pruning win at moderate posting volume (measured
    // 2.5 → ~1.2 s warm at sf1). At 100 TB both ARE the stored index
    // metadata (doc-length table, per-term postings), so the
    // materialization models the real access path, not a bench trick.
    val dl = graft.operators.LoopCheckpoint(
      posts.groupBy(col(idCol)).agg(sum("tf").as("dl")))
    val stats = dl.agg(sum("dl").as("tot"), count(lit(1)).as("nd"),
                       min("dl").as("min_dl"))
    val hits = graft.operators.LoopCheckpoint(
      posts.filter(col("term").isin(terms: _*))
        .withColumn("df", count(lit(1)).over(Window.partitionBy("term"))))
    // per-term ceiling u_t from index metadata (max tf) + corpus stats
    val ub = hits.groupBy(col("term"))
      .agg(max("tf").as("max_tf"), first("df").as("df"))
      .crossJoin(broadcast(stats))
      .withColumn("s_milli", expr("tot * 1000 div nd"))
      .withColumn("u_t", expr(termScoreSql("max_tf", "min_dl * 1000")))
      .select(col("term"), col("u_t"))
    def exactScores(subset: DataFrame): DataFrame =
      hits.join(subset, Seq(idCol), "left_semi")
        .join(dl, idCol)
        .crossJoin(broadcast(stats))
        .withColumn("s_milli", expr("tot * 1000 div nd"))
        .withColumn("term_score", expr(termScoreSql("tf", "dl * 1000")))
        .groupBy(col(idCol))
        .agg(sum("term_score").as("score_micro"),
             count(lit(1)).as("n_terms"))
    // θ: exact k-th best within the rarest term's (shortest) postings
    val rarest = hits.select(col("term"), col("df")).distinct()
      .orderBy(col("df"), col("term")).limit(1).select(col("term"))
    val seedDocs = hits.join(broadcast(rarest), "term")
      .select(col(idCol)).distinct()
    val theta = exactScores(seedDocs)
      .orderBy(col("score_micro").desc).limit(k)
      .agg(coalesce(
        when(count(lit(1)) >= k, min("score_micro")).otherwise(lit(0L)),
        lit(0L)).as("theta"))
    // cheap bound pass: no dl join, no saturation math — then prune
    val survivors = hits.join(broadcast(ub), "term")
      .groupBy(col(idCol)).agg(sum("u_t").as("bound"))
      .crossJoin(broadcast(theta))
      .filter(col("bound") >= col("theta"))
      .select(col(idCol))
    exactScores(survivors)
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(k)
  }

  /** Reciprocal-rank fusion of two retrieval runs (the standard
    * hybrid-search combiner): each run contributes 10⁶ div (60 + rank)
    * for the docs it returned, fused score is the sum — integer-exact,
    * score-scale-free (only ranks matter, so a micro-scaled run and a
    * ppm-scaled run fuse cleanly). Here the two runs are the rarity
    * ranking ([[rankedSearch]]) and BM25 ([[bm25Search]]) over the
    * same query; the general shape fuses any two (id, rank) lists.
    * Both inputs are top-`pool` LIMITed — the fusion join is bounded
    * on both sides at any corpus size. */
  def rrfFusion(docs: DataFrame, idCol: String, textCol: String,
                terms: Seq[String], pool: Int, k: Int): DataFrame =
    rrfFusionFrom(postings(docs, idCol, textCol), idCol, terms, pool, k)

  /** [[rrfFusion]] over a pre-built postings relation (both fused runs
    * share it). */
  def rrfFusionFrom(posts: DataFrame, idCol: String,
                    terms: Seq[String], pool: Int, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def ranked(run: DataFrame, tag: String): DataFrame = run
      .withColumn(s"rank_$tag", row_number().over(
        Window.orderBy(col("score_micro").desc, col(idCol))).cast("long"))
      .select(col(idCol), col(s"rank_$tag"))
    val a = ranked(rankedSearchFrom(posts, idCol, terms, pool), "a")
    val b = ranked(bm25SearchFrom(posts, idCol, terms, pool), "b")
    a.join(b, Seq(idCol), "full_outer")
      .select(col(idCol),
        expr("coalesce(1000000 div (60 + rank_a), 0)" +
          " + coalesce(1000000 div (60 + rank_b), 0)").as("rrf_micro"),
        coalesce(col("rank_a"), lit(0L)).as("rank_a"),
        coalesce(col("rank_b"), lit(0L)).as("rank_b"))
      .orderBy(col("rrf_micro").desc, col(idCol))
      .limit(k)
  }

  /** Kendall tau-a rank agreement between the rarity and BM25 runs,
    * over the docs BOTH runs returned: tau = (C − D) / (m(m−1)/2)
    * where C/D count concordant/discordant doc pairs. Emitted as the
    * exact BIGINT fraction (tau is signed; negative integer division
    * is not cross-engine portable) plus the pair counts. The pair
    * join is over the two LIMIT-bounded runs' intersection — ≤ pool²
    * pairs at any corpus size, broadcast both sides. */
  def rankAgreement(docs: DataFrame, idCol: String, textCol: String,
                    terms: Seq[String], pool: Int): DataFrame =
    rankAgreementFrom(postings(docs, idCol, textCol), idCol, terms, pool)

  /** [[rankAgreement]] over a pre-built postings relation. */
  def rankAgreementFrom(posts: DataFrame, idCol: String,
                        terms: Seq[String], pool: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def ranked(run: DataFrame, tag: String): DataFrame = run
      .withColumn(s"r$tag", row_number().over(
        Window.orderBy(col("score_micro").desc, col(idCol))).cast("long"))
      .select(col(idCol), col(s"r$tag"))
    val common = ranked(rankedSearchFrom(posts, idCol, terms, pool), "a")
      .join(ranked(bm25SearchFrom(posts, idCol, terms, pool), "b"),
        Seq(idCol))
    val pairs = common.select(col(idCol).as("i"),
        col("ra").as("rai"), col("rb").as("rbi"))
      .join(broadcast(common.select(col(idCol).as("j"),
        col("ra").as("raj"), col("rb").as("rbj"))),
        col("i") < col("j"))
      .select(expr("sign((rai - raj) * (rbi - rbj))").as("s"))
    pairs
      .agg(sum(when(col("s") > 0, 1L).otherwise(0L)).as("concordant"),
           sum(when(col("s") < 0, 1L).otherwise(0L)).as("discordant"),
           count(lit(1)).as("n_pairs"))
      .select(col("concordant"), col("discordant"), col("n_pairs"),
        expr("concordant - discordant").as("tau_num"),
        col("n_pairs").as("tau_den"))
  }

  /** Conjunctive search: documents containing EVERY query term, via
    * posting-list intersection — a doc qualifies iff it appears in all
    * |terms| posting sets. One aggregate keyed on the doc id; no text
    * rescan, no join explosion. */
  def searchAll(docs: DataFrame, idCol: String, textCol: String,
                terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "search needs at least one term")
    require(terms.distinct.size == terms.size, "query terms must be distinct")
    val hits = postings(docs, idCol, textCol)
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("nhit"))
      .filter(col("nhit") === terms.size)
    docs.join(hits.select(col(idCol)), Seq(idCol), "left_semi")
  }
}
