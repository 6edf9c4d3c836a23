package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.retention.{EventsAdapter, Retention, StarAdapter}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in `queries` is an operator from SURVEY.md §2 (or an
  * additive LLM-pipeline operator) expressed Spark-first; `oracleSql`
  * holds the DuckDB-dialect equivalent the driver hash-compares
  * against. Column names are aliased identically on both sides.
  */
object SparkEntry {

  /** Flagship: the full two-phase household-retention pipeline on
    * sf0.001 (driver smoke-checks rows>0). */
  def entry(spark: SparkSession): DataFrame =
    retentionFlagship(spark, "/root/testdata/sf0.001")

  private def retentionFlagship(s: SparkSession, dir: String): DataFrame =
    retentionCore(s, dir).fullHistory

  /** One cached retention core per (session, sf dir): the flagship /
    * collapsed / nested entries are three views over the SAME run, so
    * they share one Spark-cached household-ranges stage
    * ([[graft.retention.RetentionCore]]) instead of re-evaluating the
    * person⋈encounter subtree per view — the library pattern a real
    * consumer of several retention views would use. */
  private val retentionCores =
    scala.collection.concurrent.TrieMap[(SparkSession, String),
                                        graft.retention.RetentionCore]()
  private def retentionCore(s: SparkSession,
                            dir: String): graft.retention.RetentionCore =
    retentionCores.getOrElseUpdate((s, dir),
      new graft.retention.RetentionCore(
        StarAdapter.persons(s, dir), StarAdapter.encounters(s, dir),
        StarAdapter.config(s, dir)))

  /** Shared real-format media fixture for the q_media_* family: written
    * once per JVM (the corpus is seeded-deterministic, so the write is
    * idempotent — the guard just avoids 5 redundant rewrites when the
    * whole family runs in one session). */
  @volatile private var mediaCorpusWritten = false
  private def mediaCorpus(s: SparkSession)
      : org.apache.spark.sql.Dataset[graft.multimodal.MediaRecord] =
    if (mediaCorpusWritten) {
      import s.implicits._
      s.read.parquet(graft.multimodal.Multimodal.CorpusPath)
        .as[graft.multimodal.MediaRecord]
    } else synchronized {
      val ds = graft.multimodal.Multimodal.corpusParquet(s, 200)
      mediaCorpusWritten = true
      ds
    }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- retention pipeline (flagship + staged parity) ----
    "q_retention_flagship" -> ((s, dir) => retentionFlagship(s, dir)),
    "q_retention_collapsed" -> ((s, dir) =>
      retentionCore(s, dir).householdRanges),
    // scanYears=1 so the "household with no qualifying encounters"
    // branch actually fires on this dataset (every customer has orders
    // inside the default 5y window — the branch would be vacuous).
    "q_retention_phase2" -> ((s, dir) =>
      Retention.phase2Ranges(
        StarAdapter.persons(s, dir), StarAdapter.encounters(s, dir),
        StarAdapter.config(s, dir).copy(scanYears = 1))),
    // client_code tenant isolation (P5): same pipeline scoped to one
    // market segment's persons.
    "q_retention_tenant" -> ((s, dir) =>
      Retention.fullHistory(
        StarAdapter.personsForTenant(s, dir, "BUILDING"),
        StarAdapter.encounters(s, dir),
        StarAdapter.config(s, dir))),
    // second source instantiation: events stream as encounters
    "q_retention_events" -> ((s, dir) =>
      Retention.fullHistory(
        EventsAdapter.persons(s, dir), EventsAdapter.encounters(s, dir),
        EventsAdapter.config(s, dir))),
    "q_retention_nested" -> ((s, dir) =>
      // A7 array-of-struct shape, stringified so the oracle compare is
      // order-stable across engines.
      retentionCore(s, dir).fullHistory
        .select(col("person_id"),
                concat_ws(",", col("gte"), col("lte"), col("start_date"),
                          col("end_date"), col("retained")).as("h"))
        .groupBy("person_id")
        .agg(concat_ws("|", array_sort(collect_list(col("h"))))
          .as("history"))),

    // ---- scans / filters / projections (S2, P2-P7) ----
    "q_filter_project" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 100000.0)
        .select(col("o_orderkey"), col("o_custkey"),
                to_date(col("o_orderdate")).as("order_date"),
                col("o_totalprice").as("price"),
                (col("o_orderkey") * 2 + 1).as("derived_key"))),

    // ---- aggregation (A1-A3, A6; TPC-H Q1 shape) ----
    "q_agg_sum" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_quantity") > 0)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
             round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
             round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
               .as("sum_disc_price"),
             round(avg(col("l_quantity")), 6).as("avg_qty"),
             count(lit(1)).as("count_order"))),

    // multiple DISTINCT aggregates (Catalyst Expand-based rewrite)
    "q_multi_distinct" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_suppkey")).as("n_supps"),
             round(sum(col("l_quantity")), 2).as("sum_qty"))),

    // ---- joins (J1, J8, J10) ----
    "q_join_inner" -> ((s, dir) =>
      Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders"),
              col("c_custkey") === col("o_custkey"))
        .select(col("o_orderkey"), col("c_custkey"), col("c_nationkey"),
                col("c_mktsegment"))),
    "q_join_semi" -> ((s, dir) =>
      Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders")
                .filter(col("o_totalprice") > 150000.0),
              col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))),
    "q_join_anti" -> ((s, dir) =>
      Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders")
                .filter(col("o_totalprice") > 400000.0),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_nationkey"))),

    // ---- windows (W1-W4) ----
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .withColumn("order_rank", row_number().over(w))
        .select(col("o_orderkey"), col("o_custkey"), col("order_rank"))
    }),
    "q_window_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
                lag(col("o_totalprice"), 1, 0.0).over(w).as("prev_price"),
                lead(col("o_totalprice"), 1).over(w).as("next_price"),
                lag(to_date(col("o_orderdate")), 1).over(w).as("prev_date"))
    }),

    // ---- argmin/argmax aggregates (min_by/max_by) ----
    "q_minmax_by" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(max_by(col("o_totalprice"), col("o_orderkey"))
               .as("last_order_price"),
             min_by(col("o_totalprice"), col("o_orderkey"))
               .as("first_order_price"),
             count(lit(1)).as("n_orders"))),

    // ---- sorted top-k (O1/A5: ES terms-agg parity) ----
    "q_topk" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_custkey"))
        .limit(100)),

    // ---- scalar date functions (§2.7) ----
    "q_dates_scalar" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
                date_format(col("o_orderdate"), "yyyy-MM-dd").as("d_str"),
                date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
                trunc(to_date(col("o_orderdate")), "MM").as("month_start"),
                add_months(to_date(col("o_orderdate")), 1).as("next_month"),
                date_add(to_date(col("o_orderdate")), -365).as("lookback"),
                (unix_timestamp(col("o_orderdate")) * 1000).as("epoch_ms"))),

    // ---- CASE WHEN / COALESCE (P10, P11) ----
    "q_case_coalesce" -> ((s, dir) => {
      val oc = Tables.load(s, dir, "orders")
        .groupBy("o_custkey").agg(count(lit(1)).as("n"))
      Tables.load(s, dir, "customer")
        .join(oc, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
                coalesce(col("n"), lit(0L)).as("n_orders"),
                when(coalesce(col("n"), lit(0L)) > 10, "frequent")
                  .otherwise("rare").as("band"))
    }),

    // ---- nested collect (A7 standalone) ----
    "q_nested_collect" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(concat_ws("|",
          array_sort(collect_list(col("o_orderkey").cast("string"))))
          .as("order_keys"))),

    // ---- dedup: exact (additive) ----
    "q_dedup_exact" -> ((s, dir) =>
      graft.functions.Dedup.exactGroups(
        Tables.load(s, dir, "documents"), "doc_id", "text")),

    // ---- text analysis (additive) ----
    "q_text_stats" -> ((s, dir) => {
      val cols = graft.functions.TextAnalysis.qualityColumns(col("text"))
        .map { case (n, c) => c.as(n) }
      Tables.load(s, dir, "documents").select(col("doc_id") +: cols: _*)
    }),
    "q_lang_id" -> ((s, dir) => {
      val scores = graft.functions.TextAnalysis.langScores(col("text"))
        .map { case (l, c) => c.cast("long").as(s"s_$l") }
      Tables.load(s, dir, "documents")
        .select((col("doc_id") +: scores) :+
          graft.functions.TextAnalysis.langId(col("text")).as("lang_pred"): _*)
    }),
    "q_fingerprint" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .groupBy(graft.functions.TextAnalysis.fingerprint(col("text")).as("fp"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))),

    // ---- dedup: n-gram Jaccard + MinHash LSH (additive) ----
    "q_dedup_ngram" -> ((s, dir) =>
      graft.functions.Dedup.ngramJaccardPairs(
        Tables.load(s, dir, "documents"), "doc_id", "text", 3, 0.8)),
    "q_dedup_minhash_lsh" -> ((s, dir) =>
      graft.functions.Dedup.lshCandidatePairs(
        Tables.load(s, dir, "documents"), "doc_id", "text", 3, 16, 4)),
    // candidate pairs → duplicate CLUSTERS (connected components):
    // the step that makes pair output actionable (keep min id per
    // component, drop the rest)
    "q_dedup_clusters" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val pairs = graft.functions.Dedup.lshCandidatePairs(
        docs, "doc_id", "text", 3, 16, 4)
      graft.operators.ConnectedComponents.run(
        docs.select(col("doc_id").as("node")),
        pairs.select(col("doc_a"), col("doc_b")))
    }),
    // connected components on an adversarial PATH graph (dedup graphs
    // are near-cliques; this pins the pointer-jumping O(log n) path at
    // bench scale): orders chained by consecutive orderkey within
    // 4096-key buckets → component = bucket-min orderkey, which the
    // oracle reproduces with a plain window
    "q_cc_path" -> ((s, dir) => {
      // keyspace bounded at 60000 (≈15k nodes): the adversarial part is
      // the PATH SHAPE (≈1k-node chains per bucket → ~11 pointer-jump
      // rounds), not bulk — unbounded, the per-round fixed cost times
      // 150k nodes at sf0.1 made this one query ~25% of the bench
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") < 60000)
        .select(col("o_orderkey").as("id"),
                expr("o_orderkey div 4096").as("b"))
      val w = Window.partitionBy("b").orderBy("id")
      val edges = o.withColumn("u", lag(col("id"), 1).over(w))
        .filter(col("u").isNotNull)
        .select(col("u"), col("id").as("v"))
      graft.operators.ConnectedComponents.run(o.select("id"), edges)
    }),

    // ---- corpus assembly: leak-free splits, mixing, packing, PII ----
    // train/val/test that never separates near-duplicates: split is a
    // function of the dedup COMPONENT, so a test doc's near-copy can't
    // sit in train (the leakage the naive per-doc split causes)
    "q_split_leakfree" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val pairs = graft.functions.Dedup.lshCandidatePairs(
        docs, "doc_id", "text", 3, 16, 4)
      graft.functions.Corpus.leakFreeSplit(
        docs.select("doc_id", "lang"), "doc_id",
        pairs.select(col("doc_a"), col("doc_b")))
    }),
    // domain-mixture sampling: deterministic per-language keep rates
    "q_stratified_sample" -> ((s, dir) =>
      graft.functions.Corpus.stratifiedSample(
        Tables.load(s, dir, "documents").select("doc_id", "lang"),
        "doc_id", "lang",
        Map("en" -> 750000, "de" -> 500000, "fr" -> 250000, "es" -> 125000),
        defaultPpm = 100000)),
    // concat-and-chunk packing into 2048-token bins, sharded by source
    "q_pack_sequences" -> ((s, dir) =>
      graft.functions.Corpus.packSequences(
          Tables.load(s, dir, "documents"), "source", "doc_id",
          graft.functions.TextAnalysis.tokenCount(col("text")), 2048)
        .groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))),
    // per-row (aggregation-free) LSH band signatures — the streaming-
    // safe bucketing stage, pinned batch-equal to the wide-agg path
    "q_band_signatures" -> ((s, dir) =>
      graft.functions.Dedup.bandSignatureRows(
        Tables.load(s, dir, "documents"), "doc_id", "text", 3, 16, 4)),
    // symmetric int8 embedding quantization (integer-exact surface)
    "q_embed_quant" -> ((s, dir) => {
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
                graft.functions.Similarity.maxAbs(col("embedding")).as("s"))
      e.select(col("vec_id"), graft.functions.Similarity
          .int8Quantize(col("embedding"), col("s")).as("q"))
        .select(col("vec_id"),
                aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"),
                aggregate(col("q"), lit(0L), (a, x) => a + abs(x)).as("q_abs_sum"),
                array_min(col("q")).as("q_min"),
                array_max(col("q")).as("q_max"))
    }),
    // heavy-hitter sketch, run in its EXACT regime (capacity 8 > 5
    // distinct langs ⇒ no decrement ever fires ⇒ oracle = GROUP BY);
    // the lossy regime's error bounds are spec-pinned (SketchSpec)
    "q_heavy_hitters" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .agg(graft.functions.Sketches.heavyHitters(col("lang"), 8).as("hh"))
        .select(explode(col("hh")).as("e"))
        .select(col("e.token").as("token"), col("e.est").as("est"))),
    // RAG passage chunking: 24-token windows every 12 (50% overlap)
    "q_chunk_passages" -> ((s, dir) =>
      graft.functions.TextAnalysis.chunkPassages(
        Tables.load(s, dir, "documents"), "doc_id", "text", 24, 12)),
    // eval-set decontamination: benchmark = 6-token prefixes of every
    // 50th doc; flag any doc sharing a 3-gram with that eval set
    "q_decontaminate" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
        .select(array_join(slice(split(
          graft.functions.TextAnalysis.normalized(col("text")), " "), 1, 6),
          " ").as("snippet"))
      graft.functions.Decontam.report(docs, "doc_id", "text",
        bench, "snippet", 3)
    }),
    // largest-feasible-corpus mixture allocation (integer-exact)
    "q_mixture_alloc" -> ((s, dir) =>
      graft.functions.Corpus.mixtureAllocation(
        Tables.load(s, dir, "documents"), "lang",
        Map("en" -> 400000L, "de" -> 300000L, "fr" -> 200000L,
            "es" -> 100000L))),
    // ...and the sampled corpus that allocation induces
    "q_mixture_sample" -> ((s, dir) =>
      graft.functions.Corpus.mixtureSample(
        Tables.load(s, dir, "documents").select("doc_id", "lang"),
        "doc_id", "lang",
        Map("en" -> 400000L, "de" -> 300000L, "fr" -> 200000L,
            "es" -> 100000L))),
    // deterministic global shuffle into 8 export shards
    "q_shard_shuffle" -> ((s, dir) =>
      graft.functions.Corpus.shardAssign(
          Tables.load(s, dir, "documents").select("doc_id"),
          "doc_id", 8, "v1")
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"),
             min("sort_key").as("min_key"), max("sort_key").as("max_key"),
             min_by(col("doc_id"), col("sort_key")).as("first_doc"))),
    // PII scrub: the synthetic corpus carries no PII, so inject a
    // deterministic payload (IDENTICAL expression in the oracle), then
    // detect + redact — all map-side codegen'd string expressions
    "q_pii_redact" -> ((s, dir) => {
      val id = col("doc_id")
      val pii = concat(col("text"),
        lit(" contact user"), id.cast("string"), lit("@example.com call "),
        lit("415-555-"), lpad(pmod(id, lit(10000)).cast("string"), 4, "0"),
        lit(" ssn 078-05-"), lpad(pmod(id * 7, lit(10000)).cast("string"), 4, "0"),
        lit(" ip 10.0."), pmod(id, lit(256)).cast("string"), lit("."),
        pmod(id * 3, lit(256)).cast("string"))
      val cnts = graft.functions.Scrub.counts(col("text_pii"))
        .map { case (n, c) => c.cast("long").as(n) }
      Tables.load(s, dir, "documents")
        .withColumn("text_pii", pii)
        .select((id +: cnts) :+
          graft.functions.Scrub.redact(col("text_pii")).as("redacted"): _*)
    }),
    // top-k distinctive terms per doc (tf/df rarity ranking; the
    // ln-based tf-idf variant is TextAnalysis.tfIdf — see SEMANTICS.md
    // on why the oracle surface avoids transcendentals)
    "q_tfidf_topk" -> ((s, dir) =>
      graft.functions.TextAnalysis.topTermsExact(
        Tables.load(s, dir, "documents"), "doc_id", "text", 3)
        .select("doc_id", "token", "tf", "df", "score_micro", "rank")),
    // generator surface (UDTF-shape): positional token explode
    "q_explode_pos" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), posexplode(filter(
          split(graft.functions.TextAnalysis.normalized(col("text")), " "),
          t => t =!= "")))
        .withColumnRenamed("col", "token")),
    "q_dedup_simhash" -> ((s, dir) =>
      graft.functions.Dedup.simhashPairs(
        Tables.load(s, dir, "documents"), "doc_id", "text", 12)),

    // ---- embedding similarity (additive) ----
    "q_sim_cosine_topk" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      graft.functions.Similarity.cosineTopK(
        emb.filter(col("vec_id") < 5), emb, 10)
    }),
    // the same top-k ranked over the 4×-smaller int8 corpus (recall
    // vs the float baseline is spec-pinned; scores integer-exact)
    "q_sim_quant_topk" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      graft.functions.Similarity.quantizedTopK(
        emb.filter(col("vec_id") < 5), emb, 10)
    }),
    "q_dedup_embedding" -> ((s, dir) =>
      graft.functions.Similarity.labelBlockedNearDup(
        Tables.load(s, dir, "embeddings"), 0.4)),
    // MMR diversified top-k: greedy coverage-aware selection from the
    // relevance top-20, integer dot products end to end (see
    // Similarity.mmrSelect for the portability contract)
    "q_mmr_rerank" -> ((s, dir) =>
      graft.functions.Similarity.mmrSelect(
        Tables.load(s, dir, "embeddings"), 0L, 20, 5)),
    "q_sim_lsh_buckets" -> ((s, dir) =>
      graft.functions.Similarity.hyperplaneLshBuckets(
        Tables.load(s, dir, "embeddings"), 16, 4)),
    // one-call semantic dedup: near-dup pairs → components → survivors
    "q_semantic_dedup" -> ((s, dir) =>
      graft.functions.Similarity.semanticDedup(
        Tables.load(s, dir, "embeddings"), 0.4)),
    "q_sim_ann_ivf" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      graft.functions.Similarity.annIvf(
        emb.filter(col("vec_id") < 5), emb, 2, 5)
    }),

    // Gopher-style repetition stats (top-bigram dominance)
    "q_repetition" -> ((s, dir) =>
      graft.functions.TextAnalysis.repetitionStats(
        Tables.load(s, dir, "documents"), "doc_id", "text")),

    // chunk-granularity (passage) duplication stats
    "q_chunk_dedup" -> ((s, dir) =>
      graft.functions.Dedup.chunkDupStats(
        Tables.load(s, dir, "documents"), "doc_id", "text", 8)),
    // cross-document n-gram duplication share (corpus-level
    // boilerplate signal; integer-exact ppm)
    "q_crossdoc_dup" -> ((s, dir) =>
      graft.functions.Dedup.crossDocDupStats(
        Tables.load(s, dir, "documents"), "doc_id", "text", 3)),

    // ---- exact percentiles per group (distribution stats) ----
    "q_percentile" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))")
               .as("p"),
             count(lit(1)).as("n"))
        .select(col("l_returnflag"),
                round(col("p")(0), 6).as("p25"),
                round(col("p")(1), 6).as("p50"),
                round(col("p")(2), 6).as("p75"),
                col("n"))),

    // ---- collection scalar functions (array/map/struct surface) ----
    "q_collection_funcs" -> ((s, dir) => {
      val toks = array_distinct(split(
        graft.functions.TextAnalysis.normalized(col("text")), " "))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
                concat_ws(",", array_sort(array_intersect(toks,
                  lit(Array("the", "a", "table", "value", "row")))))
                  .as("common_toks"),
                size(toks).as("n_distinct_toks"),
                concat_ws(",", slice(array_sort(toks), 1, 3)).as("first3"),
                element_at(map_from_arrays(
                  array(lit("len")), array(length(col("text")).cast("long"))),
                  "len").as("len_via_map"),
                struct(col("doc_id").as("id"), length(col("text")).as("n"))
                  .getField("n").as("len_via_struct"))
    }),

    // ---- full curation pipeline (quality → lang → exact dedup →
    //      near-dup components), one composed query ----
    "q_curation" -> ((s, dir) =>
      graft.functions.Curation.curate(
        Tables.load(s, dir, "documents"), "doc_id", "text", "en", 5)),

    // ---- embedding norms (sequential-fold float contract) ----
    "q_embed_norm" -> ((s, dir) =>
      Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
                size(col("embedding")).as("dim"),
                round(graft.functions.Similarity.norm(col("embedding")), 6)
                  .as("l2_norm"))),

    // ---- full outer join (both null sides populated) ----
    "q_join_full_outer" -> ((s, dir) => {
      val big = Tables.load(s, dir, "customer")
        .filter(col("c_acctbal") > 7000.0)
        .select(col("c_custkey"), col("c_acctbal"))
      val active = Tables.load(s, dir, "orders")
        .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 20)
      big.join(active, col("c_custkey") === col("o_custkey"), "full")
        .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
                col("c_acctbal"), col("n_orders"))
    }),

    // ---- multimodal REAL decode (pure-JVM codecs: 24-bit BMP, PCM16
    //      WAV, concatenated-BMP video stacks — graft.multimodal.Codecs)
    //      as mapPartitions batch stages over binary payload columns.
    //      The corpus of genuine encoded files is materialized to a
    //      shared parquet fixture so DuckDB re-derives the SAME
    //      features from the payload bytes with fixed-offset hex
    //      arithmetic — the decode math itself is cross-engine
    //      verified, not trusted ----
    // header parse + claimed-metadata cross-check (shard QA gate)
    "q_media_decode" -> ((s, dir) =>
      graft.multimodal.Multimodal.decodeHeaders(mediaCorpus(s)).toDF()),
    // decoded-pixel channel sums + integer Rec.601 luma (stride/padding
    // and bottom-up row handling exercised: widths 8..20)
    "q_media_image_stats" -> ((s, dir) =>
      graft.multimodal.Multimodal.imageStats(mediaCorpus(s)).toDF()),
    // decoded PCM stats: sum/abs/energy/peak/zero-crossings
    "q_media_audio_stats" -> ((s, dir) =>
      graft.multimodal.Multimodal.audioStats(mediaCorpus(s)).toDF()),
    // per-frame decode of video stacks via offset-arithmetic seek
    "q_media_frames" -> ((s, dir) =>
      graft.multimodal.Multimodal.frameStats(mediaCorpus(s)).toDF()),
    // decode → nearest-neighbor 8×8 resize → re-encode → decode again:
    // the full thumbnail round-trip, verified against DuckDB computing
    // the identical integer source-pixel mapping
    "q_media_resize" -> ((s, dir) =>
      graft.multimodal.Multimodal.imageStats(
        graft.multimodal.Multimodal.resizeImages(mediaCorpus(s), 8))
        .toDF().select("media_id", "sum_r", "sum_g", "sum_b")),

    // ---- events: windowed agg + sessionization ----
    "q_events_window" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
             round(sum(col("value")), 6).as("sum_value"))),
    // interval (range) self-join: click→purchase attribution within
    // 24h — the SAME function is the streaming stream-stream join
    // (StreamingOps.attributionJoin; watermark no-ops on batch)
    "q_attribution" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      graft.streaming.StreamingOps.attributionJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"),
        "24 hours", "1 hour")
    }),
    "q_events_sessionize" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
      val gapNs = 30L * 60 * 1000 * 1000 * 1000
      Tables.events(s, dir)
        .withColumn("prev", lag(col("ts_ns"), 1).over(w))
        .withColumn("new_s",
          when(col("prev").isNull || col("ts_ns") - col("prev") > gapNs, 1)
            .otherwise(0))
        .withColumn("session_id",
          sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
             min(col("ts_ns")).as("start_ns"), max(col("ts_ns")).as("end_ns"))
    }),

    // ---- built-in session windows (native session_window agg) ----
    "q_session_window" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
                col("session_window.start").as("s_start"),
                col("session_window.end").as("s_end"),
                col("n_events"))),

    // ---- VARIANT semi-structured type (Spark 4 parse_json) ----
    "q_variant" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
                expr("variant_get(parse_json(props), '$.k', 'long')")
                  .as("k"),
                expr("cast(parse_json(props):k as string)").as("k_str"))
        .filter(col("k") > 50)),

    // ---- JSON column parsing (S5/P1) ----
    "q_json_extract" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
                get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k") > 50)),
    // ---- count gates (A6/A8: the reference's hits.total probes) ----
    "q_count_gate" -> ((s, dir) =>
      Tables.load(s, dir, "customer")
        .agg(count(lit(1)).as("n_persons"),
             countDistinct(col("c_nationkey")).as("n_households"),
             count(when(col("c_acctbal") > 0, 1)).as("n_positive_bal"))),
    // ---- parent-side semi join (J9: ES has_parent) ----
    "q_join_semi_parent" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer")
                .filter(col("c_acctbal") > 5000.0),
              col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("o_orderkey"), col("o_custkey"))),

    // ---- set operations ----
    "q_set_ops" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val big = c.filter(col("c_acctbal") > 5000.0).select("c_custkey")
      val building = c.filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      big.intersect(building)
        .withColumn("tag", lit("rich_building"))
        .unionByName(building.exceptAll(big)
          .withColumn("tag", lit("building_only")))
    }),

    // ---- string scalar functions ----
    "q_string_funcs" -> ((s, dir) =>
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"),
                upper(col("c_name")).as("name_upper"),
                substring(col("c_name"), 1, 8).as("name_prefix"),
                length(col("c_name")).as("name_len"),
                concat_ws("/", col("c_mktsegment"),
                          col("c_nationkey").cast("string")).as("seg_nation"),
                regexp_extract(col("c_name"), "([0-9]+)", 1).as("name_digits"),
                col("c_name").like("%1%").as("has_one"))),

    // ---- fuzzy matching: edit distance (integer-exact) ----
    "q_edit_distance" -> ((s, dir) =>
      Tables.load(s, dir, "customer")
        .select(col("c_custkey"),
                levenshtein(col("c_name"), lit("Customer#000000100"))
                  .as("edit_dist"))
        .filter(col("edit_dist") <= 3)),

    // ---- pivot (conditional aggregation) ----
    "q_pivot" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy("o_custkey")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .withColumnsRenamed(Map("F" -> "n_f", "O" -> "n_o", "P" -> "n_p"))),

    // ---- as-of join (operator Spark lacks; union-and-carry rewrite) ----
    "q_asof_join" -> ((s, dir) => {
      val dayNs = 86400L * 1000 * 1000 * 1000
      val ev = Tables.events(s, dir).select(
        col("event_id"), col("user_id"), col("ts_ns"))
      val cp = ev
        .withColumn("cp_ns", (col("ts_ns") / dayNs).cast("long") * dayNs)
        .groupBy("user_id", "cp_ns")
        .agg(count(lit(1)).as("cp_events"))
        .filter(col("cp_events") >= 5)
      graft.operators.AsOfJoin.joinAsOf(
          ev, cp, Seq("user_id"), "ts_ns", "cp_ns", Seq("cp_ns", "cp_events"))
        .select(col("event_id"), col("user_id"), col("ts_ns"),
                coalesce(col("cp_ns"), lit(-1L)).as("cp_ns"),
                coalesce(col("cp_events"), lit(-1L)).as("cp_events"))
    }),

    // same as-of contract through the NATIVE physical operator
    // (AsOfJoinPlan → AsOfJoinStrategy → AsOfJoinExec merge)
    "q_asof_native" -> ((s, dir) => {
      val dayNs = 86400L * 1000 * 1000 * 1000
      val ev = Tables.events(s, dir).select(
        col("event_id"), col("user_id"), col("ts_ns"))
      val cp = ev
        .withColumn("cp_ns", (col("ts_ns") / dayNs).cast("long") * dayNs)
        .groupBy("user_id", "cp_ns")
        .agg(count(lit(1)).as("cp_events"))
        .filter(col("cp_events") >= 5)
      graft.plans.AsOfJoinNative.joinAsOf(
          ev, cp, Seq("user_id"), "ts_ns", "cp_ns", Seq("cp_ns", "cp_events"))
        .select(col("event_id"), col("user_id"), col("ts_ns"),
                coalesce(col("cp_ns"), lit(-1L)).as("cp_ns"),
                coalesce(col("cp_events"), lit(-1L)).as("cp_events"))
    }),

    // the native operator under deliberate key skew: collapsing even
    // user_ids onto one key puts ~half of BOTH sides on a single key —
    // the hot-partition shape the O(1)-state merge must stream through
    // (the memory contract itself is spill-asserted in
    // AsOfJoinNativeSpec; this entry pins correctness + benches it)
    "q_asof_skew" -> ((s, dir) => {
      val dayNs = 86400L * 1000 * 1000 * 1000
      val ev = Tables.events(s, dir).select(
        col("event_id"),
        when(col("user_id") % 2 === 0, lit(0L))
          .otherwise(col("user_id")).as("sk"),
        col("ts_ns"))
      val cp = ev
        .withColumn("cp_ns", (col("ts_ns") / dayNs).cast("long") * dayNs)
        .groupBy("sk", "cp_ns")
        .agg(count(lit(1)).as("cp_events"))
        .filter(col("cp_events") >= 5)
      graft.plans.AsOfJoinNative.joinAsOf(
          ev, cp, Seq("sk"), "ts_ns", "cp_ns", Seq("cp_ns", "cp_events"))
        .select(col("event_id"), col("sk"), col("ts_ns"),
                coalesce(col("cp_ns"), lit(-1L)).as("cp_ns"),
                coalesce(col("cp_events"), lit(-1L)).as("cp_events"))
    }),

    // ---- running aggregates over an explicit frame ----
    "q_running_total" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
                count(lit(1)).over(w).as("n_so_far"),
                round(sum(col("o_totalprice")).over(w), 2).as("spent_so_far"))
    }),

    // ---- rollup / cube (multi-level aggregation, beyond the reference) ----
    "q_rollup" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
             count(lit(1)).as("n"))),
    "q_cube" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(grouping_id().as("gid"),
             round(sum(col("l_quantity")), 2).as("sum_qty"),
             count(lit(1)).as("n"))),

    "q_grouping_sets" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus))
      """)
    }),

    // ---- analytic window functions beyond the reference's four ----
    "q_window_analytics" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
                ntile(4).over(w).as("quartile"),
                dense_rank().over(w).as("drank"),
                percent_rank().over(w).as("pct_rank"),
                cume_dist().over(w).as("cdist"),
                nth_value(col("o_totalprice"), 2)
                  .over(w.rowsBetween(Window.unboundedPreceding,
                                      Window.unboundedFollowing))
                  .as("second_price"))
    }),

    // ---- correlated + uncorrelated scalar subqueries (SQL surface) ----
    "q_scalar_subquery" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT c_custkey, c_acctbal,
               (SELECT max(o_totalprice) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS max_order,
               (SELECT count(*) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer c
        WHERE c_acctbal > 0.9 * (SELECT max(c_acctbal) FROM customer)
      """)
    }),

    // ---- month spine standalone (S6) + reference band join (J3) ----
    "q_month_spine" -> ((s, dir) =>
      graft.operators.MonthSpine.spine(
        s, StarAdapter.asOf(s, dir), 48)),
    "q_band_join" -> ((s, dir) => {
      val admits = Retention.householdAdmitDates(
        StarAdapter.persons(s, dir), StarAdapter.encounters(s, dir),
        StarAdapter.config(s, dir))
      admits.as("cur").join(admits.as("prv"),
          col("cur.household_id") === col("prv.household_id") &&
          col("prv.admit_date") < col("cur.admit_date") &&
          col("prv.admit_date") >= date_add(col("cur.admit_date"), -365))
        .groupBy(col("cur.household_id").as("household_id"),
                 col("cur.admit_date").as("admit_date"))
        .agg(count(lit(1)).as("n_prior"))
    }),

    // ---- ordered-step funnel over the event stream ----
    "q_funnel" -> ((s, dir) =>
      graft.operators.Funnel.funnel(
        Tables.events(s, dir), "user_id", "event_type", "ts_ns",
        Seq("view", "click", "purchase"))),

    // ---- first-seen-month cohort retention grid ----
    "q_cohort" -> ((s, dir) =>
      graft.operators.Cohort.retentionGrid(
        Tables.load(s, dir, "orders"), "o_custkey", "o_orderdate")),

    // ---- SCD2 validity intervals from the event log ----
    "q_scd2" -> ((s, dir) =>
      graft.operators.ChangeCapture.scd2(
        Tables.events(s, dir), "user_id", "event_type", "ts_ns",
        "event_id")),

    // ---- CDC latest-per-key compaction (delete-aware) ----
    "q_cdc_latest" -> ((s, dir) =>
      graft.operators.ChangeCapture.cdcLatest(
        Tables.events(s, dir), "user_id", "event_type", "ts_ns",
        "event_id", deleteState = "error")),

    // ---- temporal (point-in-time) join: each event labeled with its
    //      active SCD2 version — the native as-of join against the
    //      windowed interval build (valid_from ≤ ts, greatest wins) ----
    "q_temporal_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts_ns"))
      val versions = graft.operators.ChangeCapture.scd2(
          Tables.events(s, dir), "user_id", "event_type", "ts_ns",
          "event_id")
        .select(col("user_id"), col("valid_from"), col("state"),
                col("version"))
      graft.plans.AsOfJoinNative.joinAsOf(
          ev, versions, Seq("user_id"), "ts_ns", "valid_from",
          Seq("state", "version"))
        .select(col("event_id"), col("user_id"), col("ts_ns"),
                col("state"), col("version"))
    }),

    // ---- integer-exact PageRank over the customer↔supplier graph
    //      (disjoint node ids: cust·2, supp·2+1); fixed iterations,
    //      oracle unrolls them — the kmeans recipe for graphs ----
    "q_pagerank" -> ((s, dir) => {
      // orderkey-bounded like q_cc_path: the measured object is the
      // iteration mechanics, not bulk edge volume
      val edges = Tables.load(s, dir, "orders")
        .filter(col("o_orderkey") < 60000)
        .join(Tables.load(s, dir, "lineitem"),
              col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("u"),
                (col("l_suppkey") * 2 + 1).as("v"))
      graft.operators.PageRank.integerPageRank(
        edges.union(edges.select(col("v").as("u"), col("u").as("v"))), 3)
    }),

    // ---- state-transition (Markov) counts over the event stream ----
    "q_transitions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
      Tables.events(s, dir)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
                 col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
    }),

    // ---- Markov stationary distribution of the event-type chain:
    //      3 unrolled power-iteration steps in ppm integers. Per step,
    //      each edge contributes v_i · p_ij div 10⁶ (floor per edge —
    //      the deterministic contract; mass may leak a few ppm to
    //      flooring, which is the point: bit-identical on any engine).
    //      The state space is |event_type| (~5), so every frame after
    //      the transition groupBy is a broadcast-size matrix; the one
    //      corpus-scale pass is the same lead-window q_transitions
    //      runs ----
    "q_markov_stationary" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
      val trans = Tables.events(s, dir)
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
        .agg(count(lit(1)).as("n"))
      val p = trans
        .withColumn("out_n", sum("n").over(Window.partitionBy("src")))
        .withColumn("p_ppm", expr("n * 1000000 div out_n"))
        .select("src", "dst", "p_ppm")
        .localCheckpoint(eager = true) // ≤ |states|² rows, reused 3×
      val states = p.select(col("src").as("state")).distinct()
      val nStates = states.agg(count(lit(1)).as("k"))
      var v = states.crossJoin(broadcast(nStates))
        .select(col("state"), expr("1000000 div k").as("v_ppm"))
      for (_ <- 1 to 3) {
        v = p.join(v.withColumnRenamed("state", "src"), Seq("src"))
          .select(col("dst").as("state"),
            expr("v_ppm * p_ppm div 1000000").as("c"))
          .groupBy("state").agg(sum("c").as("v_ppm"))
      }
      v.orderBy("state")
    }),

    // ---- bloom-prefiltered join (runtime semi-join filter as a
    //      library operator; results exact, oracle = plain join) ----
    "q_bloom_join" -> ((s, dir) =>
      graft.operators.BloomJoin.prefilteredJoin(
        Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
                  col("l_quantity")),
        Tables.load(s, dir, "orders")
          .filter(col("o_totalprice") > 480000.0)
          .select(col("o_orderkey"), col("o_totalprice")),
        "l_orderkey", "o_orderkey", expectedItems = 1L << 16)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
                col("o_totalprice"))),

    // ---- inverted index build + conjunctive search ----
    "q_inverted_index" -> ((s, dir) =>
      graft.functions.InvertedIndex.index(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        minDf = 1L, maxDf = 400L)),
    "q_index_search" -> ((s, dir) =>
      graft.functions.InvertedIndex.searchAll(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "window", "stream"))
        .select(col("doc_id"), col("lang"), col("n_chars"))),
    "q_phrase_search" -> ((s, dir) =>
      graft.functions.InvertedIndex.phraseSearch(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "window"))
        .select(col("doc_id"), col("lang"))),
    "q_ranked_search" -> ((s, dir) =>
      graft.functions.InvertedIndex.rankedSearch(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "window", "stream"), 10)),
    // BM25 (k1=1.2, b=0.75) with the integer-exact saturation/length
    // normalization derivation — see InvertedIndex.bm25Search
    "q_bm25_search" -> ((s, dir) =>
      graft.functions.InvertedIndex.bm25Search(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "window", "stream"), 10)),
    // hybrid-retrieval rank fusion: RRF over the rarity and BM25 runs
    "q_rrf_fusion" -> ((s, dir) =>
      graft.functions.InvertedIndex.rrfFusion(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "window", "stream"), 20, 10)),
    // Kendall tau-a agreement between the two retrieval runs
    "q_rank_tau" -> ((s, dir) =>
      graft.functions.InvertedIndex.rankAgreement(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "window", "stream"), 20)),

    // ---- exact k-NN self-join (all-pairs baseline for the ANN ops) ----
    "q_knn_join" -> ((s, dir) =>
      graft.functions.Similarity.knnJoin(
        Tables.load(s, dir, "embeddings"), 3)),

    // ---- TPC-H Q5-shape star join: one fact chain, four broadcast
    //      dims, Catalyst picks the join order. Revenue in integer
    //      cents: the per-row product is one deterministic IEEE
    //      expression, the SUM is then order-independent BIGINT ----
    "q_star_join" -> ((s, dir) =>
      Tables.load(s, dir, "customer")
        .join(Tables.load(s, dir, "orders"),
              col("c_custkey") === col("o_custkey"))
        .join(Tables.load(s, dir, "lineitem"),
              col("l_orderkey") === col("o_orderkey"))
        .join(Tables.load(s, dir, "supplier"),
              col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
        .join(Tables.load(s, dir, "nation"),
              col("s_nationkey") === col("n_nationkey"))
        .join(Tables.load(s, dir, "region"),
              col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA" &&
                year(col("o_orderdate")) === 1996)
        .groupBy(col("n_name"))
        .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
                       * 100 + 0.5).cast("long")).as("revenue_cents"),
             count(lit(1)).as("n_items"))),

    // ---- wide→long unpivot (Dataset.unpivot / SQL UNPIVOT) ----
    "q_unpivot" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_orderkey") < 1000)
        .select(col("l_orderkey"), col("l_linenumber"),
                col("l_quantity").as("quantity"),
                col("l_extendedprice").as("price"),
                col("l_discount").as("discount"))
        .unpivot(Array(col("l_orderkey"), col("l_linenumber")),
                 Array(col("quantity"), col("price"), col("discount")),
                 "measure", "value")),

    // ---- recursive CTE (Spark 4 UnionLoop): ancestor walk over the
    //      implicit c_custkey div 2 binary-tree hierarchy ----
    "q_recursive_cte" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        WITH RECURSIVE anc(node, parent, depth) AS (
          SELECT c_custkey, c_custkey div 2, 1
          FROM customer WHERE c_custkey > 1 AND c_custkey < 200
          UNION ALL
          SELECT node, parent div 2, depth + 1 FROM anc WHERE parent > 1
        )
        SELECT node, max(depth) AS depth_to_root FROM anc GROUP BY node
      """)
    }),

    // ---- correlated LATERAL subquery: per-customer top-2 orders
    //      (the join-then-rank alternative to a window) ----
    "q_lateral" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""
        SELECT c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      """)
    }),

    // ---- running distinct count over a window (Spark lacks DISTINCT
    //      window aggregates; size∘collect_set is the idiomatic dual
    //      of the oracle's count(DISTINCT) OVER) ----
    "q_window_distinct" -> ((s, dir) => {
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "lineitem").filter(col("l_orderkey") < 3000)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
                size(collect_set(col("l_partkey")).over(w))
                  .as("distinct_parts"))
    }),

    // ---- deterministic quantized k-means: computes the coarse cells
    //      q_sim_ann_ivf otherwise takes as given; integer-exact
    //      iterations, oracle unrolls them as CTE stages ----
    "q_kmeans" -> ((s, dir) =>
      graft.functions.Similarity.kmeansQuantized(
        Tables.load(s, dir, "embeddings"), 8, 2)),
    // the composed pipeline: quantize → cluster → probe nearest cells
    "q_sim_ann_kmeans" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      graft.functions.Similarity.annIvfKmeans(
        emb.filter(col("vec_id") < 5), emb, 8, 2, 2, 5)
    }),

    // ---- RANGE window frame (value-based, not row-count): 30-day
    //      rolling spend per customer; integer day index + cents so
    //      frame contents and sums are deterministic cross-engine ----
    "q_range_frame" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("d"))
        .rangeBetween(-29, 0)
      Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
                datediff(to_date(col("o_orderdate")),
                         lit("1990-01-01").cast("date")).as("d"),
                floor(col("o_totalprice") * 100 + 0.5).cast("long")
                  .as("cents"))
        .select(col("o_custkey"), col("o_orderkey"), col("d"),
                count(lit(1)).over(w).as("n_30d"),
                sum(col("cents")).over(w).as("spend_cents_30d"))
    }),

    // ---- equi-width histogram via integer binning (floor of an IEEE
    //      division — deterministic cross-engine, unlike width_bucket
    //      edge semantics) ----
    "q_histogram" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy((floor(col("o_totalprice") / 50000) * 50000)
                   .cast("long").as("bucket_lo"))
        .agg(count(lit(1)).as("n"),
             min(col("o_totalprice")).as("min_price"),
             max(col("o_totalprice")).as("max_price"))),

    // ---- ordered-series family (operators.Series): one window pass
    //      each, no self-joins ----
    // forward fill: carry the last purchase amount (integer millis —
    // floor(x*1000) is IEEE-exact cross-engine) onto every later event
    "q_gap_fill" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("event_type") === "purchase",
            floor(col("value") * 1000).cast("long")).as("pv"))
      graft.operators.Series
        .forwardFill(e, "user_id", "pv", "filled_milli",
                     col("ts"), col("event_id"))
        .select("event_id", "user_id", "filled_milli")
    }),
    // merge overlapping spans: event intervals [ts, ts + (id%7+1) min)
    // in integer epoch-micros, coalesced per user
    "q_interval_merge" -> ((s, dir) => {
      val start = unix_micros(col("ts"))
      val iv = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), start.as("start_us"),
          (start + (pmod(col("event_id"), lit(7)) + 1) * 60000000L)
            .as("end_us"))
      graft.operators.Series
        .mergeIntervals(iv, "user_id", "start_us", "end_us", col("event_id"))
    }),
    // 2-sigma spend outliers per user, float-free (the k-sigma test
    // multiplied through by n² stays in BIGINT)
    "q_anomaly" -> ((s, dir) =>
      graft.operators.Series.sigmaOutliers(
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"),
                  floor(col("value") * 1000).cast("long").as("v_milli"))
          .filter(col("v_milli").isNotNull),
        "user_id", "v_milli", 2, 10)
        .select("user_id", "event_id", "v_milli", "n_key_rows")),

    // ---- graph: triangle count over the supplier co-occurrence graph
    //      (suppliers sharing ≥5 orders — at sf0.1 the ≥3 graph has
    //      avg degree 428 and ~22M wedges; ≥5 keeps the sf0.01
    //      correctness graph near-complete while the bench graph
    //      stays wedge-bounded), degree-ordered wedge join ----
    "q_triangles" -> ((s, dir) => {
      val edges = graft.operators.CoOccurrence.edges(
        Tables.load(s, dir, "lineitem"), "l_orderkey", "l_suppkey", 5L)
      graft.operators.Triangles.count(edges)
    }),

    // ---- oracle-exact sketches (functions.Sketches): the sketch
    //      CONTENTS reproduce cross-engine via the md5-derived hash ----
    "q_hll_registers" -> ((s, dir) =>
      graft.functions.Sketches.hllRegisters(
        Tables.load(s, dir, "lineitem").select(col("l_partkey")),
        "l_partkey", 8)),
    "q_countmin" -> ((s, dir) =>
      graft.functions.Sketches.countMinEstimates(
        Tables.events(s, dir)
          .select(concat(col("event_type"), lit(":"),
            pmod(col("user_id"), lit(100)).cast("string")).as("k")),
        "k", 4, 256)),

    // ---- asymmetric near-dup: n-gram containment (quote/subset
    //      detection), stopgram-capped posting join ----
    "q_containment" -> ((s, dir) =>
      graft.functions.Dedup.containmentPairs(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        3, 600000L, 50)),

    // ---- skew-salted two-stage aggregation: 6 hot keys spread over
    //      16 salts; the RESULT is the plain GROUP BY (salting is pure
    //      execution strategy, which is exactly what the oracle pins) ----
    "q_salted_agg" -> ((s, dir) =>
      graft.operators.Skew.saltedSumCount(
        Tables.load(s, dir, "lineitem")
          .select(col("l_returnflag").as("rf"),
                  floor(col("l_extendedprice") * 100 + 0.5).cast("long")
                    .as("cents")),
        Seq("rf"), "cents", 16)),

    // ---- weight-proportional systematic sampling per stratum: take
    //      the doc that crosses each 500-token stride of the per-lang
    //      cumulative token count — deterministic, one window pass ----
    "q_systematic_sample" -> ((s, dir) => {
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          graft.functions.TextAnalysis.tokenCount(col("text")).cast("long")
            .as("wt"))
        .withColumn("cum", sum("wt").over(w))
        .filter(expr("cum div 500") > expr("(cum - wt) div 500"))
    }),

    // ---- content-defined chunking (Rabin rolling hash, custom
    //      one-pass codegen expression; oracle rehashes each window
    //      from scratch — same value mod M) ----
    "q_cdc_chunks" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
          graft.functions.TextAnalysis.cdcBoundaries(col("text"), 16, 64)
            .as("b"))
        .select(col("doc_id"), col("n_chars"),
          size(col("b")).cast("long").as("n_boundaries"),
          (size(col("b")) + 1).cast("long").as("n_chunks"),
          aggregate(col("b"), lit(0L), (a, x) => a + x).as("boundary_sum"),
          coalesce(try_element_at(col("b"), lit(1)).cast("long"), lit(0L))
            .as("first_cut"))),

    // ---- per-group top-k via the bounded-heap aggregate (NOT a
    //      row_number window: no per-group sort, k-row partial aggs
    //      map-side) — top-3 orders by price per (custkey mod 64) ----
    "q_topk_agg" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(pmod(col("o_custkey"), lit(64)).as("grp"))
        .agg(graft.functions.Sketches.topKPairs(
          col("o_totalprice"), col("o_orderkey"), 3).as("tk"))
        .select(col("grp"), posexplode(col("tk")))
        .select(col("grp"), (col("pos") + 1).cast("long").as("rank"),
                col("col.score").as("price"), col("col.id").as("okey"))),

    // ---- mergeable per-group HLL (native aggregate) beside the exact
    //      distinct it approximates — integer-only state crosses the
    //      oracle; the float estimate stays consumer-side ----
    "q_hll_groups" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(graft.functions.Sketches
               .hllDistinct(col("user_id").cast("string"), 8).as("h"),
             countDistinct(col("user_id")).as("exact_distinct"))
        .select(col("event_type"), col("h.n_zero_registers"),
                col("h.sum_rho"), col("h.inv_scaled"),
                col("exact_distinct"))),

    // ---- per-node local clustering coefficient over the supplier
    //      co-occurrence graph (same edge rule as q_triangles) ----
    "q_cluster_coeff" -> ((s, dir) => {
      val edges = graft.operators.CoOccurrence.edges(
        Tables.load(s, dir, "lineitem"), "l_orderkey", "l_suppkey", 5L)
      graft.operators.Triangles.clusteringCoefficient(edges)
    }),

    // ---- bitmask membership aggregation: which order-priority
    //      classes each customer has used, as one BIGINT mask ----
    "q_bitmap_membership" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_custkey"),
          substring(col("o_orderpriority"), 1, 1).cast("int").as("pri"))
        .groupBy("o_custkey")
        .agg(expr("bit_or(1 << (pri - 1))").cast("long").as("pri_mask"),
             count(lit(1)).as("n_orders"))
        .withColumn("n_priorities", expr("bit_count(pri_mask)").cast("long"))),

    // ---- as-of join directions (pandas merge_asof parity): the next
    //      checkpoint at-or-after each event, and the closer of the
    //      two — same data shape as q_asof_join ----
    "q_asof_fwd" -> ((s, dir) => {
      val dayNs = 86400L * 1000 * 1000 * 1000
      val ev = Tables.events(s, dir).select(
        col("event_id"), col("user_id"), col("ts_ns"))
      val cp = ev
        .withColumn("cp_ns", (col("ts_ns") / dayNs).cast("long") * dayNs)
        .groupBy("user_id", "cp_ns")
        .agg(count(lit(1)).as("cp_events"))
        .filter(col("cp_events") >= 5)
      graft.operators.AsOfJoin.joinAsOfForward(
          ev, cp, Seq("user_id"), "ts_ns", "cp_ns", Seq("cp_ns", "cp_events"))
        .select(col("event_id"), col("user_id"), col("ts_ns"),
                coalesce(col("cp_ns"), lit(-1L)).as("cp_ns"),
                coalesce(col("cp_events"), lit(-1L)).as("cp_events"))
    }),
    "q_asof_nearest" -> ((s, dir) => {
      val dayNs = 86400L * 1000 * 1000 * 1000
      val ev = Tables.events(s, dir).select(
        col("event_id"), col("user_id"), col("ts_ns"))
      val cp = ev
        .withColumn("cp_ns", (col("ts_ns") / dayNs).cast("long") * dayNs)
        .groupBy("user_id", "cp_ns")
        .agg(count(lit(1)).as("cp_events"))
        .filter(col("cp_events") >= 5)
      graft.operators.AsOfJoin.joinAsOfNearest(
          ev, cp, Seq("user_id"), "ts_ns", "cp_ns", Seq("cp_ns", "cp_events"))
        .select(col("event_id"), col("user_id"), col("ts_ns"),
                coalesce(col("cp_ns"), lit(-1L)).as("cp_ns"),
                coalesce(col("cp_events"), lit(-1L)).as("cp_events"))
    }),

    // ---- binned interval-overlap join: the equi-join rewrite of the
    //      interval theta-join (no BroadcastNestedLoopJoin) — which
    //      event intervals overlap, per user ----
    "q_range_join" -> ((s, dir) => {
      val start = unix_micros(col("ts"))
      val iv = Tables.events(s, dir).select(col("user_id"), col("event_id"),
        start.as("s"),
        (start + (pmod(col("event_id"), lit(7)) + 1) * 60000000L).as("e"))
      graft.operators.RangeJoin
        .overlapJoin(iv, iv, "user_id", "event_id", "s", "e", 300000000L)
        .filter(col("l_id") < col("r_id"))
    }),

    // ---- link prediction scores: common-neighbor count + resource-
    //      allocation index (integer micro-units, 10⁶ div deg) for
    //      every 2-hop pair, flagged is_edge — consumers filter
    //      is_edge = 0 for candidate links (co-occurrence density
    //      varies with sf, so the non-edge set alone can be empty at
    //      small scale; scoring both classes keeps the oracle
    //      non-vacuous everywhere) ----
    "q_link_predict" -> ((s, dir) => {
      val canon = graft.operators.CoOccurrence.edges(
        Tables.load(s, dir, "lineitem"), "l_orderkey", "l_suppkey", 8L)
      val sym = canon.union(canon.select(col("v").as("u"), col("u").as("v")))
      val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
      val adj = sym.join(deg, "u")
        .select(col("u").as("z"), col("v").as("n"), col("deg"))
      val wedges = adj.as("x").join(adj.as("y"),
          col("x.z") === col("y.z") && col("x.n") < col("y.n"))
        .select(col("x.n").as("n1"), col("y.n").as("n2"),
                col("x.deg").as("zdeg"))
      wedges.groupBy("n1", "n2")
        .agg(count(lit(1)).as("cn"),
             sum(expr("1000000 div zdeg")).as("ra_micro"))
        .filter(col("cn") >= 2)
        .join(canon.select(col("u").as("n1"), col("v").as("n2"),
                           lit(1L).as("is_edge")),
              Seq("n1", "n2"), "left")
        .withColumn("is_edge", coalesce(col("is_edge"), lit(0L)))
    }),

    // ---- weighted median per group, integer-exact: smallest value
    //      whose doubled cumulative weight reaches the total ----
    "q_weighted_median" -> ((s, dir) => {
      val byVal = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag").as("rf"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"),
          col("l_quantity").cast("long").as("qty"))
        .groupBy("rf", "cents").agg(sum("qty").as("w"))
      val wc = Window.partitionBy("rf").orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy("rf")
      byVal
        .withColumn("cum", sum("w").over(wc))
        .withColumn("total", sum("w").over(wt))
        .filter(col("cum") * 2 >= col("total"))
        .groupBy("rf")
        .agg(min("cents").as("median_cents"), max("total").as("total_weight"))
    }),

    // ---- keyed pseudonymization (GDPR-style): stable md5 surrogate
    //      keys that preserve referential integrity across tables ----
    "q_pseudonymize" -> ((s, dir) => {
      def pseud(c: org.apache.spark.sql.Column) = graft.functions.Dedup.md5Hash60(
        concat(lit("v1:"), c.cast("string")))
      val cust = Tables.load(s, dir, "customer")
        .select(pseud(col("c_custkey")).as("pid"),
                col("c_nationkey").as("nation"))
      val ord = Tables.load(s, dir, "orders")
        .select(pseud(col("o_custkey")).as("pid"))
      cust.join(ord.groupBy("pid").agg(count(lit(1)).as("n_orders")),
                Seq("pid"), "left")
        .groupBy("nation")
        .agg(count(lit(1)).as("n_customers"),
             sum(coalesce(col("n_orders"), lit(0L))).as("n_orders"),
             min("pid").as("min_pid"), max("pid").as("max_pid"))
    }),

    // ---- survival/tenure curve: per day-offset k, users whose
    //      observed lifespan reaches k and users churning exactly at k
    //      (integer counts only; the survival ratio is a consumer-side
    //      division) ----
    "q_survival" -> ((s, dir) => {
      val life = Tables.events(s, dir)
        .select(col("user_id"), expr("ts_ns div 86400000000000").as("day"))
        .groupBy("user_id")
        .agg((max("day") - min("day")).as("tenure_days"))
      life.select(col("user_id"), col("tenure_days"),
          explode(sequence(lit(0L), col("tenure_days"))).as("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("at_risk"),
             count(when(col("tenure_days") === col("k"), 1)).as("churned"))
    }),

    // ---- data profiling: per-column null rate / distinct count /
    //      min-max, emitted long-form (one row per column) ----
    "q_profile" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      def prof(c: String) = o.agg(
        lit(c).as("col_name"),
        count(lit(1)).as("n_rows"),
        count(when(col(c).isNull, 1)).as("n_null"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c).cast("string")).as("min_str"),
        max(col(c).cast("string")).as("max_str"))
      Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
        .map(prof).reduce(_ unionByName _)
    }),

    // ---- dbt-style data-quality checks: one row per constraint with
    //      its violation count (all zero on healthy data — the oracle
    //      proves the CHECKS, not just the data) ----
    "q_quality_checks" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val fkViolations = o.join(c, col("o_custkey") === col("c_custkey"),
          "left_anti")
        .agg(lit("orders_custkey_fk").as("check_name"),
             count(lit(1)).as("violations"))
      val pkDupes = o.groupBy("o_orderkey")
        .agg(count(lit(1)).as("n")).filter(col("n") > 1)
        .agg(lit("orders_orderkey_unique").as("check_name"),
             count(lit(1)).as("violations"))
      val notNull = o.agg(lit("orders_orderdate_not_null").as("check_name"),
        count(when(col("o_orderdate").isNull, 1)).as("violations"))
      val accepted = o.agg(lit("orders_status_accepted_values").as("check_name"),
        count(when(!col("o_orderstatus").isin("O", "F", "P"), 1))
          .as("violations"))
      Seq(fkViolations, pkDupes, notNull, accepted).reduce(_ unionByName _)
    }),

    // ---- snapshot diff: keyed added/removed/changed classification
    //      between two versions of a table (full outer join on key) ----
    "q_snapshot_diff" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey").as("k"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("price"))
      val old = o.filter(pmod(col("k"), lit(10)) < 8)
        .withColumn("price", when(pmod(col("k"), lit(7)) === 0,
          col("price") + 1).otherwise(col("price")))
      val neu = o.filter(pmod(col("k"), lit(10)) < 9)
      old.select(col("k"), col("price").as("old_price"))
        .join(neu.select(col("k"), col("price").as("new_price")),
              Seq("k"), "full_outer")
        .select(col("k"),
          when(col("old_price").isNull, lit("added"))
            .when(col("new_price").isNull, lit("removed"))
            .when(col("old_price") =!= col("new_price"), lit("changed"))
            .otherwise(lit("unchanged")).as("change"))
        .groupBy("change").agg(count(lit(1)).as("n"))
    }),

    // ---- time-weighted average (metrics/billing): value held over
    //      [ts, next_ts) intervals; numerator/denominator kept as
    //      exact BIGINTs (ms durations bound the products ≪ 2^63) ----
    "q_time_weighted" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          expr("ts_ns div 1000000").as("ts_ms"),
          floor(col("value") * 1000).cast("long").as("v_milli"))
        .withColumn("next_ms", lead(col("ts_ms"), 1).over(w))
        .filter(col("next_ms").isNotNull)
        .withColumn("dur", col("next_ms") - col("ts_ms"))
        .groupBy("user_id")
        .agg(sum(col("v_milli") * col("dur")).as("twa_num"),
             sum("dur").as("twa_den"))
        .filter(col("twa_den") > 0)
        .withColumn("twa_milli", expr("twa_num div twa_den"))
    }),

    // ---- time-decayed engagement, float-free: half-life = 1 day as a
    //      power-of-two weight 2^(40−age_days) — exponential decay in
    //      exact BIGINTs (weights > 40 days old round to zero, which a
    //      decayed counter does anyway) ----
    "q_decayed_count" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"),
        expr("ts_ns div 86400000000000").as("day"))
      ev.crossJoin(ev.agg(max(col("day")).as("anchor")))
        .withColumn("age", col("anchor") - col("day"))
        .filter(col("age") <= 40)
        .groupBy("user_id")
        .agg(sum(expr("shiftleft(cast(1 as bigint), cast(40 - age as int))"))
               .as("decayed_e40"),
             count(lit(1)).as("n_recent"))
    }),

    // ---- market-basket association rules over order→brand baskets:
    //      ppm support/confidence/lift, decimal-exact ----
    "q_assoc_rules" -> ((s, dir) => {
      val items = Tables.load(s, dir, "lineitem")
        .join(Tables.load(s, dir, "part"),
              col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey"), col("p_brand"))
      graft.operators.MarketBasket.pairRules(
        items, "l_orderkey", "p_brand", minSupportPpm = 10000L)
    }),

    // ---- bounded-hop multi-source BFS over the thresholded supplier
    //      co-occurrence graph (same edge rule as q_triangles) ----
    "q_shortest_path" -> ((s, dir) => {
      val edges = graft.operators.CoOccurrence.edges(
        Tables.load(s, dir, "lineitem"), "l_orderkey", "l_suppkey", 5L)
      val sources = Tables.load(s, dir, "supplier")
        .filter(col("s_suppkey") < 3).select(col("s_suppkey"))
      graft.operators.Bfs.boundedDistances(edges, sources, maxHops = 3)
    }),

    // ---- largest-remainder apportionment of a 1M-token budget across
    //      document sources by total chars: quotas sum EXACTLY to the
    //      budget, remainder ties broken by source ----
    "q_apportion" -> ((s, dir) =>
      graft.operators.Allocation.largestRemainder(
        Tables.load(s, dir, "documents").select(col("source"), col("n_chars")),
        "source", "n_chars", budget = 1000000L)
        .withColumnRenamed("k", "source")),

    // ---- grouped OLS: price-vs-quantity trend per return flag,
    //      integer-exact sufficient statistics + fixed-point fit ----
    "q_regression" -> ((s, dir) =>
      graft.operators.Stats.linearFitGrouped(
        Tables.load(s, dir, "lineitem")
          .select(col("l_returnflag").as("rf"),
            col("l_quantity").cast("long").as("qty"),
            floor(col("l_extendedprice") * 100 + 0.5).cast("long")
              .as("cents")),
        Seq("rf"), col("qty"), col("cents"))),

    // ---- top user-journey trigrams: double-lead over the µs-exact
    //      event order (ties broken by event_id) ----
    "q_event_paths" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_ns"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("ts_ns"), col("event_id"),
                col("event_type"))
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .filter(col("e3").isNotNull)
        .groupBy(col("event_type").as("s1"), col("e2").as("s2"),
                 col("e3").as("s3"))
        .agg(count(lit(1)).as("n"))
    }),

    // ---- BPE-style tokenizer-training primitive: adjacent character
    //      pair counts over the document corpus (first 512 chars,
    //      lowercased), kept at ≥0.1% relative support ----
    "q_bpe_merge" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(lower(substring(col("text"), 1, 512)).as("t"))
        .filter(length(col("t")) >= 2)
      // aggregate once, derive the total from the (tiny) grouped
      // result — the support gate never rescans the corpus.
      // Pairs come from zipping the char array with itself shifted by
      // one: substring(t, i, 2) in a position loop is O(i) per call on
      // UTF8 strings (chars must be counted from the start), i.e. O(n²)
      // per document; the split+zip form is O(n).
      val g = d
        .withColumn("ch", expr("slice(split(t, ''), 1, length(t))"))
        .select(explode(expr(
          "filter(zip_with(ch, slice(ch, 2, size(ch) - 1), " +
          "(a, b) -> concat(a, b)), x -> x is not null)")).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("n"))
        .localCheckpoint(eager = true)
      g.crossJoin(broadcast(g.agg(sum("n").as("total"))))
        .filter(col("n") * 1000 >= col("total"))
        .select(col("pair"), col("n"))
    }),

    // ---- k-core extraction (3 peels at k=2) on the part
    //      co-occurrence graph — sparse at every scale, so the peel
    //      genuinely removes the degree-1 fringe each round ----
    "q_kcore" -> ((s, dir) => {
      val edges = graft.operators.CoOccurrence.edges(
        Tables.load(s, dir, "lineitem"), "l_orderkey", "l_partkey", 2L)
      graft.operators.KCore.peel(edges, k = 2, rounds = 3)
    }),

    // ---- robust location/scale per group: median + MAD over price
    //      cents, crossing-rule exact (no interpolation) ----
    "q_mad" -> ((s, dir) =>
      graft.operators.Stats.medianAbsDev(
        Tables.load(s, dir, "lineitem")
          .select(col("l_returnflag").as("rf"),
            floor(col("l_extendedprice") * 100 + 0.5).cast("long")
              .as("cents")),
        Seq("rf"), col("cents"))),

    // ---- entity resolution: blocked fuzzy name matching — block on
    //      the noun, bounded edit distance within the block (the
    //      blocking equi-join IS the 100-TB shape: no all-pairs) ----
    "q_entity_match" -> ((s, dir) => {
      val names = Tables.load(s, dir, "part").select(col("p_name")).distinct()
        .select(col("p_name").as("name"),
                element_at(split(col("p_name"), " "), -1).as("blk"))
      names.as("a").join(names.as("b"),
          col("a.blk") === col("b.blk") && col("a.name") < col("b.name"))
        .select(col("a.name").as("name_a"), col("b.name").as("name_b"),
                levenshtein(col("a.name"), col("b.name")).as("dist"))
        .filter(col("dist") <= 3)
    }),

    // ---- equi-depth quartile assignment per group: (rank−1)·4 div n
    //      (ntile semantics differ across engines; the rank formula
    //      with value-only ties is the portable contract) ----
    "q_quartile_assign" -> ((s, dir) => {
      val wr = Window.partitionBy("l_returnflag")
      val wn = Window.partitionBy("l_returnflag")
      Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
                col("l_quantity").cast("long").as("qty"))
        .withColumn("rk", rank().over(wr.orderBy(col("qty"))))
        .withColumn("n", count(lit(1)).over(wn))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
                col("qty"), expr("(rk - 1) * 4 div n").as("quartile"))
    }),

    // ---- rolling OLS trend: slope of value over the last 10 events
    //      per user (event-index x-axis), emitted only on full
    //      windows; all-BIGINT sufficient statistics ----
    "q_rolling_slope" -> ((s, dir) => {
      val wo = Window.partitionBy("user_id").orderBy(col("ts_ns"), col("event_id"))
      val wf = wo.rowsBetween(-9, Window.currentRow)
      Tables.events(s, dir)
        .select(col("user_id"), col("ts_ns"), col("event_id"),
                floor(col("value") * 1000).cast("long").as("y"))
        .withColumn("x", row_number().over(wo).cast("long"))
        .withColumn("cnt", count(lit(1)).over(wf))
        .withColumn("sx", sum("x").over(wf))
        .withColumn("sy", sum("y").over(wf))
        .withColumn("sxy", sum(expr("x * y")).over(wf))
        .withColumn("sxx", sum(expr("x * x")).over(wf))
        .filter(col("cnt") === 10)
        .withColumn("num", expr("10 * sxy - sx * sy"))
        // den = 10·Σx² − (Σx)² over 10 consecutive ints = 825, constant
        .select(col("user_id"), col("event_id"),
          expr("""(case when num < 0 then -1 else 1 end)
                  * (abs(num) * 1000000 div 825)""").as("slope_ppm"))
    }),

    // ---- 2-D skyline (Pareto frontier: min price, min size) per part
    //      type. Spark side: two value-range window minima — dominated
    //      iff some strictly-cheaper row has size ≤ s, or some
    //      equal-price row has size < s. O(n log n), partition-
    //      parallel; the oracle states the same dominance as a
    //      NOT EXISTS anti-join ----
    "q_skyline" -> ((s, dir) => {
      graft.operators.Skyline.pareto2d(
        Tables.load(s, dir, "part")
          .select(col("p_type"), col("p_partkey"),
            floor(col("p_retailprice") * 100 + 0.5).cast("long").as("cents"),
            col("p_size").cast("long").as("size")),
        Seq("p_type"), col("cents"), col("size"))
    }),

    // ---- per-group mode with deterministic tie-break (highest count,
    //      then lexicographically smallest value) ----
    "q_mode" -> ((s, dir) => {
      val counts = Tables.load(s, dir, "part")
        .groupBy(col("p_type"), col("p_brand"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("p_type")
        .orderBy(col("n").desc, col("p_brand"))
      counts.withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("p_type"), col("p_brand").as("mode_brand"), col("n"))
    }),

    // ---- throttle/debounce: keep an event only if ≥60 s after its
    //      predecessor in the same (user, type) stream ----
    "q_throttle" -> ((s, dir) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts_ns"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("event_id"),
                col("ts_ns"))
        .withColumn("prev_ns", lag(col("ts_ns"), 1).over(w))
        .filter(col("prev_ns").isNull ||
                col("ts_ns") - col("prev_ns") >= expr("60000000000"))
        .select(col("user_id"), col("event_type"), col("event_id"))
    }),

    // ---- Benford first-digit profile of order totals (data-quality /
    //      fraud screen): leading digit via string head — portable,
    //      no float log10 ----
    "q_benford" -> ((s, dir) => {
      val d = Tables.load(s, dir, "orders")
        .select(floor(col("o_totalprice") * 100 + 0.5).cast("long")
          .as("cents"))
        .filter(col("cents") > 0)
        .select(substring(col("cents").cast("string"), 1, 1).as("digit"))
        .groupBy("digit").agg(count(lit(1)).as("n"))
      d.crossJoin(broadcast(d.agg(sum("n").as("total"))))
        .select(col("digit"), col("n"),
          expr("cast(n as decimal(38,0)) * 1000000 div total")
            .as("share_ppm"))
    }),

    // ---- market concentration: Herfindahl index of order volume per
    //      customer nation, ppm shares squared (integer-exact) ----
    "q_hhi" -> ((s, dir) => {
      val perCust = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"),
              col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("c_custkey"))
        .agg(count(lit(1)).as("cnt"))
      val wn = Window.partitionBy("c_nationkey")
      perCust
        .withColumn("tot", sum("cnt").over(wn))
        .select(col("c_nationkey"),
          expr("cnt * 1000000 div tot").as("share_ppm"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_customers"),
             sum(expr("share_ppm * share_ppm")).as("hhi_pps"))
    }),

    // ---- bigram language-model counts over normalized tokens:
    //      next-token conditional frequencies, the n-gram LM training
    //      table; unigram heads derived from the bigram relation
    //      (no second corpus scan) ----
    "q_token_bigrams" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(expr("filter(" +
          "split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' '), " +
          "x -> x != '')").as("t"))
        .filter(size(col("t")) >= 2)
      val bg = d.select(explode(expr(
          "filter(zip_with(t, slice(t, 2, size(t) - 1), " +
          "(a, b) -> concat(a, ' ', b)), x -> x is not null)")).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .localCheckpoint(eager = true)
      val uni = bg
        .groupBy(substring_index(col("bigram"), " ", 1).as("w1"))
        .agg(sum("n").as("n_w1"))
      bg.filter(col("n") >= 10)
        .join(uni, substring_index(col("bigram"), " ", 1) === uni("w1"))
        .select(col("bigram"), col("n"),
          expr("cast(n as decimal(38,0)) * 1000000 div n_w1").as("cond_ppm"))
    }),

    // ---- training-mix construction end-to-end: apportion a 200-doc
    //      budget across sources by char mass, then keep each source's
    //      `quota` longest documents — Allocation + ranking composed ----
    "q_budget_select" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val quotas = graft.operators.Allocation.largestRemainder(
        docs.select(col("source"), col("n_chars")),
        "source", "n_chars", budget = 200L)
        .select(col("k").as("source"), col("quota"))
      val w = Window.partitionBy("source")
        .orderBy(col("n_chars").desc, col("doc_id"))
      docs.join(broadcast(quotas), "source")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= col("quota"))
        .select(col("doc_id"), col("source"))
    }),

    // ---- pairwise source vocabulary overlap: MarketBasket on
    //      token→source baskets, projected to Jaccard ppm ----
    "q_vocab_overlap" -> ((s, dir) => {
      val occ = Tables.load(s, dir, "documents")
        .select(col("source"), explode(expr("filter(" +
          "split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' '), " +
          "x -> x != '')")).as("token"))
      graft.operators.MarketBasket.pairRules(occ, "token", "source", 0L)
        .select(col("item_a").as("src_a"), col("item_b").as("src_b"),
          col("pair_cnt").as("inter"),
          col("cnt_a").as("vocab_a"), col("cnt_b").as("vocab_b"),
          expr("cast(pair_cnt as decimal(38,0)) * 1000000 " +
               "div (cnt_a + cnt_b - pair_cnt)").as("jaccard_ppm"))
    }),

    // ---- deterministic round-robin interleave across sources (the
    //      training-order shuffle that balances sources without a
    //      global sort): consumers order by (round, src_idx) ----
    "q_interleave" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val srcIdx = docs.select("source").distinct()
        .withColumn("src_idx",
          row_number().over(Window.orderBy("source")).cast("long"))
      val w = Window.partitionBy("source").orderBy("doc_id")
      docs.join(broadcast(srcIdx), "source")
        .select(col("doc_id"), col("source"),
          row_number().over(w).cast("long").as("round"), col("src_idx"))
    }),

    // ---- trailing-7-day distinct active users per day, EXACT at
    //      scale: each (user, active-day) covers the 7 window-ends it
    //      participates in (bounded ×7 explode), then one distinct +
    //      one count — no per-day set union, no window over sets ----
    "q_rolling_distinct" -> ((s, dir) => {
      val ud = Tables.events(s, dir)
        .select(col("user_id"), expr("ts_ns div 86400000000000").as("day"))
        .distinct()
      val cov = ud
        .select(col("user_id"),
                explode(expr("sequence(day, day + 6)")).as("d"))
        .distinct()
      cov.crossJoin(broadcast(ud.agg(max("day").as("mxd"))))
        .filter(col("d") <= col("mxd"))
        .groupBy("d").agg(count(lit(1)).as("n_users"))
    }),

    // ---- period-over-period: day-over-day revenue delta in signed
    //      ppm (sign factored out of the floor-div, year-partitioned
    //      lag so no single global window) ----
    "q_period_change" -> ((s, dir) => {
      val daily = Tables.load(s, dir, "orders")
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .as("cents"))
      val w = Window.partitionBy(year(col("day"))).orderBy(col("day"))
      daily.withColumn("prev_cents", lag(col("cents"), 1).over(w))
        .filter(col("prev_cents").isNotNull)
        .select(col("day"), col("cents"), col("prev_cents"),
          expr("""(case when cents < prev_cents then -1 else 1 end)
                  * (abs(cents - prev_cents) * 1000000 div prev_cents)""")
            .as("change_ppm"))
    }),

    // ---- HLL set algebra: audience-overlap estimation from MERGED
    //      register states (union = per-register max — the property
    //      that lets pre-computed per-segment sketches answer overlap
    //      questions without rescanning users). Integer surface: raw
    //      rho sums + inv-scaled sums (Σ 2^(53−rho) over all 256
    //      registers); the float harmonic estimate + inclusion-
    //      exclusion stay consumer-side ----
    "q_sketch_intersect" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      def regs(t: String, nm: String) =
        graft.functions.Sketches.hllRegisters(
          ev.filter(col("event_type") === t).select(col("user_id")),
          "user_id", 8)
          .withColumnRenamed("max_rho", nm)
      regs("click", "rho_a")
        .join(regs("purchase", "rho_b"), Seq("register"), "full_outer")
        .select(coalesce(col("rho_a"), lit(0L)).as("ra"),
                coalesce(col("rho_b"), lit(0L)).as("rb"))
        .withColumn("ru", greatest(col("ra"), col("rb")))
        .agg(count(lit(1)).as("n_obs"),
          sum("ra").as("sum_rho_a"), sum("rb").as("sum_rho_b"),
          sum("ru").as("sum_rho_union"),
          sum(expr("shiftleft(cast(1 as bigint), cast(53 - ra as int))"))
            .as("ia"),
          sum(expr("shiftleft(cast(1 as bigint), cast(53 - rb as int))"))
            .as("ib"),
          sum(expr("shiftleft(cast(1 as bigint), cast(53 - ru as int))"))
            .as("iu"))
        .select(col("n_obs"), col("sum_rho_a"), col("sum_rho_b"),
          col("sum_rho_union"),
          (col("ia") + (lit(256L) - col("n_obs")) * lit(1L << 53))
            .as("inv_a"),
          (col("ib") + (lit(256L) - col("n_obs")) * lit(1L << 53))
            .as("inv_b"),
          (col("iu") + (lit(256L) - col("n_obs")) * lit(1L << 53))
            .as("inv_union"))
    }),

    // ---- multi-touch attribution with EXACT integer credit: each
    //      purchase's 10⁶ ppm split equally over its 24 h-lookback
    //      clicks, remainder units to the EARLIEST clicks (largest-
    //      remainder per purchase) — Σ credit ≡ 10⁶ per purchase ----
    "q_multitouch" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
                expr("ts_ns div 1000").as("us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
                col("us").as("click_us"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
                col("us").as("buy_us"))
      val touches = buys.join(clicks, "user_id")
        .filter(col("click_us") <= col("buy_us") &&
                col("buy_us") - col("click_us") <= lit(86400000000L))
      val w = Window.partitionBy("purchase_id")
        .orderBy(col("click_us"), col("click_id"))
      touches
        .withColumn("n", count(lit(1)).over(Window.partitionBy("purchase_id")))
        .withColumn("rk", row_number().over(w))
        .select(col("purchase_id"), col("click_id"),
          (expr("1000000 div n") +
            when(col("rk") <= expr("1000000 % n"), 1L).otherwise(0L))
            .as("credit_ppm"))
    }),

    // ---- floor-at-zero running balance WITHOUT a sequential
    //      recurrence: b_i = max(0, b_{i-1} + d_i) unrolls to
    //      prefix_i − least(0, min_{j≤i} prefix_j) — two window
    //      passes over one sort, fully parallel per part ----
    "q_capped_balance" -> ((s, dir) =>
      graft.operators.Series.cappedBalance(
        Tables.load(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_shipdate"), col("l_orderkey"),
            col("l_linenumber"),
            when(col("l_linestatus") === "F", col("l_quantity"))
              .otherwise(-col("l_quantity")).cast("long").as("delta")),
        "l_partkey", Seq("l_shipdate", "l_orderkey", "l_linenumber"),
        "delta")
        .select("l_partkey", "l_orderkey", "l_linenumber", "delta",
                "balance")),

    // ---- hierarchical contribution: each nation's share of its
    //      region's customer order volume, ppm ----
    "q_share_of_parent" -> ((s, dir) => {
      val vol = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"),
              col("o_custkey") === col("c_custkey"))
        .join(Tables.load(s, dir, "nation"),
              col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_regionkey"), col("n_nationkey"))
        .agg(count(lit(1)).as("n_orders"))
      val wr = Window.partitionBy("n_regionkey")
      vol.withColumn("region_orders", sum("n_orders").over(wr))
        .select(col("n_regionkey"), col("n_nationkey"), col("n_orders"),
          col("region_orders"),
          expr("n_orders * 1000000 div region_orders").as("share_ppm"))
    }),

    // ---- state-machine dwell times: how long each user spends in
    //      each event-type state (state held until the next event) ----
    "q_dwell_time" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("event_id"),
                expr("ts_ns div 1000").as("us"))
        .withColumn("next_us", lead(col("us"), 1).over(w))
        .filter(col("next_us").isNotNull)
        .groupBy("user_id", "event_type")
        .agg(sum(col("next_us") - col("us")).as("dwell_us"),
             count(lit(1)).as("n_spells"))
    }),

    // ---- order-independent dataset fingerprint: bit_xor of 60-bit
    //      row hashes — partition/order/engine independent, the
    //      manifest-level "did replication change anything" check ----
    "q_table_checksum" -> ((s, dir) => {
      val rowHash = graft.functions.Dedup.md5Hash60(
        concat_ws("", col("o_orderkey"), col("o_custkey"),
          col("o_orderstatus"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long"),
          date_format(col("o_orderdate"), "yyyy-MM-dd"),
          col("o_orderpriority")))
      Tables.load(s, dir, "orders")
        .select(rowHash.as("h"))
        .agg(expr("bit_xor(h)").as("xor_hash"), count(lit(1)).as("n_rows"),
             sum(expr("h % 1000000007")).as("mod_sum"))
    }),

    // ---- burstiness: each user's PEAK trailing-1-hour event count
    //      (a value-range window — the rate-limiter / abuse signal) ----
    "q_burstiness" -> ((s, dir) => {
      val frame = Window.partitionBy("user_id").orderBy(col("us"))
        .rangeBetween(-3599999999L, Window.currentRow)
      Tables.events(s, dir)
        .select(col("user_id"), expr("ts_ns div 1000").as("us"))
        .withColumn("in_hour", count(lit(1)).over(frame))
        .groupBy("user_id")
        .agg(max("in_hour").as("peak_hourly"), count(lit(1)).as("n_events"))
    }),

    // ---- bounded Bellman-Ford: cheapest ≤3-hop path cost from the
    //      seed suppliers, edge cost = inverse co-occurrence affinity
    //      (weighted sibling of q_shortest_path) ----
    "q_weighted_path" -> ((s, dir) => {
      val we = graft.operators.CoOccurrence.weighted(
          Tables.load(s, dir, "lineitem"), "l_orderkey", "l_suppkey")
        .filter(col("w") >= 5)
        .select(col("u"), col("v"), expr("1000000 div w").as("cost"))
      val sources = Tables.load(s, dir, "supplier")
        .filter(col("s_suppkey") < 3).select(col("s_suppkey"))
      graft.operators.Bfs.boundedMinCost(we, sources, rounds = 3)
    }),

    // ---- rank movers: per-brand revenue rank shift between the
    //      early (<1997) and late halves of the shipping range ----
    "q_rank_movers" -> ((s, dir) => {
      val rev = Tables.load(s, dir, "lineitem")
        .withColumn("period",
          when(year(col("l_shipdate")) < 1997, "early").otherwise("late"))
        .join(Tables.load(s, dir, "part")
                .select(col("p_partkey"), col("p_brand")),
              col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("period"), col("p_partkey"))
        .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
          .as("rev"))
      val w = Window.partitionBy("p_brand", "period")
        .orderBy(col("rev").desc, col("p_partkey"))
      val ranked = rev.withColumn("rk", row_number().over(w))
      ranked.filter(col("period") === "early")
        .select(col("p_brand"), col("p_partkey"), col("rk").as("rk_early"))
        .join(ranked.filter(col("period") === "late")
          .select(col("p_brand"), col("p_partkey"), col("rk").as("rk_late")),
          Seq("p_brand", "p_partkey"))
        .select(col("p_brand"), col("p_partkey"), col("rk_early"),
          col("rk_late"), (col("rk_early") - col("rk_late")).as("delta"))
    }),

    // ---- winsorized aggregates: clamp price cents to the crossing-
    //      rule P05/P95 per group, then sum — the outlier-robust total
    //      (crossing rule: smallest v with 20·cum ≥ total / ≥ 19·total,
    //      integer-exact, same family as weighted median and MAD) ----
    "q_winsorize" -> ((s, dir) => {
      val d = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag").as("rf"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("v"))
      // ONE raw-data aggregation; bounds AND the clipped sum both come
      // from the materialized per-value counts (clip(v) carries v's
      // weight) — the corpus is scanned once, the MAD pattern
      val byVal = d.groupBy("rf", "v").agg(count(lit(1)).as("w"))
        .localCheckpoint(eager = true)
      val wc = Window.partitionBy("rf").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy("rf")
      val cum = byVal.withColumn("cum", sum("w").over(wc))
        .withColumn("total", sum("w").over(wt))
      val bounds = cum.filter(col("cum") * 20 >= col("total"))
        .groupBy("rf").agg(min("v").as("p05"))
        .join(cum.filter(col("cum") * 20 >= col("total") * 19)
          .groupBy("rf").agg(min("v").as("p95")), "rf")
      byVal.join(broadcast(bounds), "rf")
        .groupBy("rf", "p05", "p95")
        .agg(sum(greatest(col("p05"), least(col("p95"), col("v"))) * col("w"))
               .as("winsorized_cents"),
             sum("w").as("n"))
        .select("rf", "p05", "p95", "winsorized_cents", "n")
    }),

    // ---- Gini inequality of customer order volume per nation,
    //      integer-exact via the rank-sum identity:
    //      G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx), xᵢ ascending ----
    "q_gini" -> ((s, dir) => {
      val perCust = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "customer"),
              col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"), col("c_custkey"))
        .agg(count(lit(1)).as("x"))
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("x"), col("c_custkey"))
      perCust
        .withColumn("i", row_number().over(w).cast("long"))
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"),
             sum(expr("i * x")).as("six"))
        .select(col("c_nationkey"), col("n"), col("sx"),
          expr("(2 * six - (n + 1) * sx) * 1000000 div (n * sx)")
            .as("gini_ppm"))
    }),

    // ---- calendar seasonality: day-of-week share of order volume
    //      (ISO weekday 1-7, portable across engines) ----
    "q_seasonality" -> ((s, dir) => {
      val d = Tables.load(s, dir, "orders")
        .select(dayofweek(col("o_orderdate")).as("dow_sun1"))
        // normalize to ISO (Mon=1..Sun=7): Spark dayofweek is Sun=1
        .select(expr("((dow_sun1 + 5) % 7) + 1").as("iso_dow"))
        .groupBy("iso_dow").agg(count(lit(1)).as("n"))
      d.crossJoin(broadcast(d.agg(sum("n").as("total"))))
        .select(col("iso_dow"), col("n"),
          expr("n * 1000000 div total").as("share_ppm"))
    }),

    // ---- greedy max-coverage subset selection (diverse
    //      representative picking for a curation budget): k rounds,
    //      each picks the doc adding the most UNCOVERED trigrams
    //      (ties → smallest doc_id), then anti-joins its grams out.
    //      The k argmaxes are the only driver actions (one row each);
    //      the gram relation stays distributed throughout ----
    "q_max_coverage" -> ((s, dir) => {
      import s.implicits._
      val g0 = Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(array_distinct(
          graft.functions.TextAnalysis.shingles(col("text"), 3))).as("g"))
        .distinct()
        .localCheckpoint(eager = true)
      var remaining = g0
      val picks = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
      for (round <- 1 to 3) {
        val top = remaining.groupBy("doc_id").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("doc_id")).limit(1).head()
        val docId = top.getLong(0)
        picks += ((round, docId, top.getLong(1)))
        val covG = remaining.filter(col("doc_id") === docId).select("g")
        remaining = remaining.join(covG, Seq("g"), "left_anti")
          .filter(col("doc_id") =!= docId)
          .localCheckpoint(eager = true)
      }
      picks.toSeq.toDF("pick_order", "doc_id", "new_grams")
    }),

    // ---- deterministic experiment assignment: salted-hash 50/50
    //      variant split, exposure-balance surface per event type
    //      (the sample-ratio-mismatch check's integer inputs) ----
    "q_ab_assign" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_type"), col("user_id"))
        .distinct()
        .withColumn("variant",
          when(pmod(graft.functions.Dedup.md5Hash60(
            concat(lit("exp1:"), col("user_id"))), lit(100)) < 50, "A")
            .otherwise("B"))
        .groupBy("event_type")
        .agg(sum(when(col("variant") === "A", 1L).otherwise(0L)).as("n_a"),
             sum(when(col("variant") === "B", 1L).otherwise(0L)).as("n_b"))
        .withColumn("delta", col("n_a") - col("n_b"))),

    // ---- longest consecutive-day activity streak per user: calendar
    //      gaps-and-islands via the day − row_number constant trick ----
    "q_streaks" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("day")
      Tables.events(s, dir)
        .select(col("user_id"), expr("ts_ns div 86400000000000").as("day"))
        .distinct()
        .withColumn("grp", col("day") - row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(count(lit(1)).as("len"), min("day").as("start_day"))
        .groupBy("user_id")
        .agg(max("len").as("longest_streak"),
             // longest streak's start day, earliest on length ties
             (max(struct(col("len"), (-col("start_day")).as("neg_start")))
               .getField("neg_start") * -1).as("streak_start_day"),
             count(lit(1)).as("n_streaks"))
    }),

    // ---- percentile rank (relative standing) of each order within
    //      its priority class: (rank−1)·10⁶ div (n−1), value ties
    //      share a rank — engine-portable cume alternative ----
    "q_percentile_rank" -> ((s, dir) => {
      val wr = Window.partitionBy("o_orderpriority")
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        .withColumn("rk", rank().over(wr.orderBy(col("cents"))).cast("long"))
        .withColumn("n", count(lit(1)).over(wr))
        .select(col("o_orderkey"), col("o_orderpriority"), col("cents"),
          expr("(rk - 1) * 1000000 div (n - 1)").as("pct_rank_ppm"))
    }),

    // ---- tabular ML feature prep: per-event lag features + trailing
    //      window sum over the µs-exact order — the feature-table
    //      generation step before model training ----
    "q_lag_features" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val wf = w.rowsBetween(-4, Window.currentRow)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          expr("ts_ns div 1000").as("us"),
          floor(col("value") * 1000).cast("long").as("v_milli"))
        .withColumn("lag1", lag(col("v_milli"), 1).over(w))
        .withColumn("lag2", lag(col("v_milli"), 2).over(w))
        .withColumn("roll5_sum", sum("v_milli").over(wf))
        .withColumn("roll5_n", count(lit(1)).over(wf))
        .select("user_id", "event_id", "v_milli", "lag1", "lag2",
                "roll5_sum", "roll5_n")
    }),

    // ---- leave-one-out target encoding: category → mean target with
    //      the row's own value excluded ((Σ − x) div (n−1) in milli
    //      units) — the leakage-safe categorical encoder ----
    "q_target_encode" -> ((s, dir) => {
      val wg = Window.partitionBy("o_orderpriority")
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        .withColumn("sum_c", sum("cents").over(wg))
        .withColumn("n", count(lit(1)).over(wg))
        .filter(col("n") > 1)
        .select(col("o_orderkey"), col("o_orderpriority"),
          expr("(sum_c - cents) * 1000 div (n - 1)").as("loo_milli"))
    }),

    // ---- experiment outcome contingency: per variant, users who did
    //      vs did not convert (purchase) — the chi-square test's
    //      integer inputs, completing q_ab_assign's exposure side ----
    "q_ab_outcomes" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val users = ev.select(col("user_id")).distinct()
        .withColumn("variant",
          when(pmod(graft.functions.Dedup.md5Hash60(
            concat(lit("exp1:"), col("user_id"))), lit(100)) < 50, "A")
            .otherwise("B"))
      val converted = ev.filter(col("event_type") === "purchase")
        .select(col("user_id")).distinct().withColumn("conv", lit(1L))
      users.join(converted, Seq("user_id"), "left")
        .groupBy("variant")
        .agg(sum(coalesce(col("conv"), lit(0L))).as("n_converted"),
             count(lit(1)).as("n_users"))
        .withColumn("conv_ppm",
          expr("n_converted * 1000000 div n_users"))
    }),

    // ---- lag-1 autocovariance sufficient statistics per user:
    //      Σxₜxₜ₊₁ over the adjacent pairs + the marginal sums — the
    //      integer surface for serial-correlation diagnostics ----
    "q_autocorr" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          expr("ts_ns div 1000").as("us"),
          floor(col("value") * 1000).cast("long").as("x"))
        .withColumn("x_next", lead(col("x"), 1).over(w))
        .filter(col("x_next").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"),
             sum(expr("x * x_next")).as("sxy"),
             sum("x").as("sx"), sum("x_next").as("sy"),
             sum(expr("x * x")).as("sxx"))
    }),

    // ---- RFM segmentation: recency/frequency/monetary quartile codes
    //      per customer, each via the portable (rank−1)·4 div n rule
    //      (higher code = better on every axis) ----
    "q_rfm" -> ((s, dir) => {
      val per = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(max(to_date(col("o_orderdate"))).as("last_day"),
             count(lit(1)).as("freq"),
             sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
               .as("monetary"))
      // three global ranks over the customer DIMENSION (bounded
      // relation — the fact table was already aggregated away);
      // quartile code = (rank−1)·4 div n, ties broken by custkey so
      // higher code = better on every axis
      def code(c: String) =
        expr(s"(cast(rk_$c as bigint) - 1) * 4 div n_cust")
      per
        .withColumn("rk_last_day", row_number().over(
          Window.orderBy(col("last_day"), col("o_custkey"))))
        .withColumn("rk_freq", row_number().over(
          Window.orderBy(col("freq"), col("o_custkey"))))
        .withColumn("rk_monetary", row_number().over(
          Window.orderBy(col("monetary"), col("o_custkey"))))
        .crossJoin(broadcast(per.agg(count(lit(1)).as("n_cust"))))
        .select(col("o_custkey"),
          code("last_day").as("r_code"),
          code("freq").as("f_code"),
          code("monetary").as("m_code"))
        .withColumn("rfm", expr("r_code * 100 + f_code * 10 + m_code"))
    }),

    // ---- 80/20 concentration: revenue share of the top-20% customers
    //      (ceil(n/5) by revenue desc, ties to smaller custkey) ----
    "q_pareto_8020" -> ((s, dir) => {
      val per = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .as("rev"))
      val ranked = per.withColumn("rk", row_number().over(
        Window.orderBy(col("rev").desc, col("o_custkey"))))
      val tot = per.agg(sum("rev").as("total_rev"),
                        count(lit(1)).as("n_cust"))
      ranked.crossJoin(broadcast(tot))
        .filter(col("rk") * 5 <= col("n_cust") + 4) // rk <= ceil(n/5)
        .groupBy("total_rev", "n_cust")
        .agg(count(lit(1)).as("top_cust"), sum("rev").as("top_rev"))
        .select(col("n_cust"), col("top_cust"), col("total_rev"),
          col("top_rev"),
          expr("top_rev * 1000000 div total_rev").as("top_share_ppm"))
    }),

    // ---- CUSUM change detection: per-(user, type) upward-drift
    //      statistic vs the type's global floor-mean. The recurrence
    //      c_t = max(0, c_{t-1} + (x_t − mean)) IS the floor-at-zero
    //      balance, so it reuses Series.cappedBalance's closed form —
    //      two windows over one sort, no sequential fold ----
    "q_cusum" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .filter(col("value").isNotNull)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
      val means = e.groupBy("event_type")
        .agg(expr("sum(cents) div count(1)").as("mean_c"))
      val d = e.join(broadcast(means), "event_type")
        .withColumn("delta", col("cents") - col("mean_c"))
        .withColumn("ck", concat_ws(":", col("user_id"), col("event_type")))
      graft.operators.Series.cappedBalance(
          d, "ck", Seq("ts", "event_id"), "delta")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("delta"), col("balance").as("cusum"),
          when(col("balance") > col("mean_c") * 4, 1L).otherwise(0L)
            .as("alarm"))
    }),

    // ---- Lorenz curve: cumulative revenue share by customer decile
    //      (ascending revenue) — the curve whose area gap is q_gini ----
    "q_lorenz" -> ((s, dir) => {
      val per = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .as("rev"))
      val tot = per.agg(count(lit(1)).as("n_cust"),
                        sum("rev").as("total_rev"))
      per
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rev"), col("o_custkey"))).cast("long"))
        .crossJoin(broadcast(tot))
        .withColumn("decile", expr("(rk - 1) * 10 div n_cust"))
        .groupBy("decile", "total_rev")
        .agg(count(lit(1)).as("n_cust"), sum("rev").as("dec_rev"))
        .withColumn("cum_rev", sum("dec_rev").over(
          Window.orderBy("decile")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("decile"), col("n_cust"), col("dec_rev"),
          col("cum_rev"),
          expr("cum_rev * 1000000 div total_rev").as("cum_share_ppm"))
    }),

    // ---- chi-square contingency surface: priority × status observed
    //      vs independence-expected counts; per-cell χ² contribution
    //      ×10⁶ computed in DECIMAL(38,0) so the squared numerator
    //      never overflows at any scale (final value ≤ n·10⁶ → BIGINT) ----
    "q_chisq" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderpriority").as("pri"),
                col("o_orderstatus").as("st"))
      val obs = o.groupBy("pri", "st").agg(count(lit(1)).as("obs"))
      val rt = o.groupBy("pri").agg(count(lit(1)).as("row_tot"))
      val ct = o.groupBy("st").agg(count(lit(1)).as("col_tot"))
      val n = o.agg(count(lit(1)).as("n"))
      obs.join(broadcast(rt), "pri").join(broadcast(ct), "st")
        .crossJoin(broadcast(n))
        .select(col("pri"), col("st"), col("obs"), col("row_tot"),
          col("col_tot"), col("n"),
          expr("cast(row_tot as decimal(38,0)) * col_tot * 1000000 div n")
            .cast("long").as("expected_micro"),
          expr("""cast(
                    (cast(n as decimal(38,0)) * obs - cast(row_tot as decimal(38,0)) * col_tot) *
                    (cast(n as decimal(38,0)) * obs - cast(row_tot as decimal(38,0)) * col_tot) * 1000000 div
                    (cast(n as decimal(38,0)) * row_tot * col_tot)
                  as bigint)""").as("chi_micro"))
    }),

    // ---- k-anonymity audit: quasi-identifier group sizes at the fine
    //      level (nation, segment, balance bucket) with the coarse
    //      generalization (drop the balance bucket) joined beside it —
    //      per group: is it re-identifiable (k < 5), and does
    //      generalizing rescue it? Balance buckets shift cents by +1e6
    //      before integer div so negative balances bucket by FLOOR in
    //      both engines (Spark `div` truncates toward zero, DuckDB `//`
    //      floors — they agree only on non-negatives) ----
    "q_k_anon" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
        .select(col("c_nationkey").cast("long").as("nation"),
          col("c_mktsegment").as("segment"),
          expr("(cast(floor(c_acctbal * 100 + 0.5) as bigint) + 1000000) div 100000")
            .as("bal_bucket"))
      val fine = c.groupBy("nation", "segment", "bal_bucket")
        .agg(count(lit(1)).as("k_fine"))
      val coarse = c.groupBy("nation", "segment")
        .agg(count(lit(1)).as("k_coarse"))
      fine.join(broadcast(coarse), Seq("nation", "segment"))
        .select(col("nation"), col("segment"), col("bal_bucket"),
          col("k_fine"), col("k_coarse"),
          when(col("k_fine") < 5, 1L).otherwise(0L).as("risky"),
          when(col("k_fine") < 5 && col("k_coarse") >= 5, 1L)
            .otherwise(0L).as("generalize_rescues"))
    }),

    // ---- cross-source quantile normalization: calibrate each source's
    //      n_chars onto the pooled distribution by rank. Per-source
    //      percentile is a source-partitioned window; the pooled
    //      quantile function is built from DISTINCT-VALUE COUNTS (the
    //      q_mad pre-aggregation trick), so the only unpartitioned
    //      window runs over ~|distinct values| rows, never the corpus,
    //      and the rank→value lookup is a broadcast range join against
    //      that small relation ----
    "q_quantile_norm" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      val wSrc = Window.partitionBy("source")
        .orderBy(col("n_chars"), col("doc_id"))
      val ranked = d
        .withColumn("rk", row_number().over(wSrc).cast("long"))
        .withColumn("n_src", count(lit(1)).over(
          Window.partitionBy("source")))
        .withColumn("p_ppm",
          when(col("n_src") > 1,
            expr("(rk - 1) * 1000000 div (n_src - 1)")).otherwise(0L))
      val vals = d.groupBy("n_chars").agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum("cnt").over(
          Window.orderBy("n_chars")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("cum_before", col("cum") - col("cnt"))
        .select(col("n_chars").as("pool_chars"),
                col("cum_before"), col("cum"))
      val total = d.agg(count(lit(1)).as("n_tot"))
      ranked.crossJoin(broadcast(total))
        .withColumn("target_rk",
          expr("1 + p_ppm * (n_tot - 1) div 1000000"))
        .join(broadcast(vals),
          col("target_rk") > col("cum_before") &&
            col("target_rk") <= col("cum"))
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("p_ppm"), col("pool_chars").as("norm_chars"))
    }),

    // ---- churn-risk / dormancy signal: per user, idle time since the
    //      last event vs that user's own mean inter-event gap, as an
    //      exact ppm ratio. Millisecond granularity keeps the ×10⁶
    //      numerator inside BIGINT for any realistic corpus span
    //      (µs × 10⁶ would overflow); one groupBy + one broadcast
    //      scalar, no windows ----
    "q_churn_risk" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"), expr("ts_ns div 1000000").as("ms"))
      val asOf = e.agg(max("ms").as("as_of_ms"))
      e.groupBy("user_id")
        .agg(min("ms").as("first_ms"), max("ms").as("last_ms"),
             count(lit(1)).as("n_events"))
        .filter(col("n_events") > 1)
        .crossJoin(broadcast(asOf))
        .withColumn("mean_gap_ms",
          expr("(last_ms - first_ms) div (n_events - 1)"))
        .filter(col("mean_gap_ms") > 0)
        .withColumn("idle_ms", col("as_of_ms") - col("last_ms"))
        .withColumn("overdue_ppm",
          expr("idle_ms * 1000000 div mean_gap_ms"))
        .select(col("user_id"), col("n_events"), col("mean_gap_ms"),
          col("idle_ms"), col("overdue_ppm"),
          when(col("overdue_ppm") > 3000000L, 1L).otherwise(0L)
            .as("at_risk"))
    }),

    // ---- growth accounting: daily actives decomposed into new /
    //      retained / resurrected, plus how many churn out after the
    //      period. Integer epoch-day index sidesteps engine-specific
    //      date-interval coercion; one distinct on (user, day) then
    //      one user-partitioned window pass ----
    "q_growth_accounting" -> ((s, dir) => {
      val um = Tables.events(s, dir)
        .select(col("user_id"),
          expr("ts_ns div 86400000000000").as("m_idx"))
        .distinct()
      val w = Window.partitionBy("user_id").orderBy("m_idx")
      um
        .withColumn("first_m", min("m_idx").over(
          Window.partitionBy("user_id")))
        .withColumn("prev_m", lag("m_idx", 1).over(w))
        .withColumn("next_m", lead("m_idx", 1).over(w))
        .groupBy("m_idx")
        .agg(count(lit(1)).as("n_active"),
          sum(when(col("m_idx") === col("first_m"), 1L).otherwise(0L))
            .as("n_new"),
          sum(when(col("prev_m") === col("m_idx") - 1, 1L).otherwise(0L))
            .as("n_retained"),
          sum(when(col("m_idx") > col("first_m") &&
                   (col("prev_m").isNull ||
                    col("prev_m") < col("m_idx") - 1), 1L).otherwise(0L))
            .as("n_resurrected"),
          sum(when(col("next_m").isNull ||
                   col("next_m") > col("m_idx") + 1, 1L).otherwise(0L))
            .as("n_churned_after"))
    }),

    // ---- PPS systematic sampling: draw ~k customers with probability
    //      proportional to revenue, deterministically — a fixed stride
    //      walks the cumulative-weight line from offset stride/2; a
    //      unit is drawn once per grid point inside its interval (a
    //      weight > stride can be drawn multiple times, the textbook
    //      PPS behavior). Integer cents throughout; the cumulative
    //      window runs over the customer DIMENSION (per-key revenue
    //      pre-aggregated), not the fact table ----
    "q_pps_sample" -> ((s, dir) => {
      val per = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .as("rev"))
      val tot = per.agg(sum("rev").as("total_rev"))
      val cumW = Window.orderBy("o_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      per
        .withColumn("cum", sum("rev").over(cumW))
        .crossJoin(broadcast(tot))
        .withColumn("stride", expr("total_rev div 500"))
        .filter(col("stride") > 0)
        .withColumn("off", expr("stride div 2"))
        .withColumn("n_hits",
          expr("""(CASE WHEN cum >= off
                        THEN (cum - off) div stride + 1 ELSE 0 END) -
                  (CASE WHEN cum - rev >= off
                        THEN (cum - rev - off) div stride + 1 ELSE 0 END)"""))
        .filter(col("n_hits") > 0)
        .select(col("o_custkey"), col("rev"), col("cum"), col("n_hits"))
    }),

    // ---- cross-source contamination matrix: NEAR-duplicate pair
    //      counts for every source pair (how much of source A leaked
    //      into source B — the corpus-level complement of
    //      q_decontaminate's train/test check). Pairs come from the
    //      same MinHash-LSH candidate generator as q_dedup_minhash_lsh
    //      (band-bucket equi-join, never document × document); the
    //      source lookup is two equi-joins on doc_id and the matrix
    //      itself is a tiny groupBy ----
    "q_contamination_matrix" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val src = docs.select(col("doc_id"), col("source"))
      graft.functions.Dedup.lshCandidatePairs(docs, "doc_id", "text", 3, 16, 4)
        .join(src.select(col("doc_id").as("doc_a"),
          col("source").as("sa")), "doc_a")
        .join(src.select(col("doc_id").as("doc_b"),
          col("source").as("sb")), "doc_b")
        .select(least(col("sa"), col("sb")).as("src_a"),
                greatest(col("sa"), col("sb")).as("src_b"))
        .groupBy("src_a", "src_b")
        .agg(count(lit(1)).as("dup_pairs"))
    }),

    // ---- ABC inventory classification: parts ranked by revenue,
    //      classed A/B/C at 80% / 95% cumulative share (the inventory
    //      twin of q_pareto_8020's customer view). Cumulative window
    //      over the pre-aggregated part dimension; ppm-exact cuts ----
    "q_abc_class" -> ((s, dir) => {
      val per = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
          .as("rev"))
      val tot = per.agg(sum("rev").as("total_rev"))
      val cumW = Window.orderBy(col("rev").desc, col("l_partkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      per
        .withColumn("cum", sum("rev").over(cumW))
        .crossJoin(broadcast(tot))
        .withColumn("cum_ppm", expr("cum * 1000000 div total_rev"))
        .withColumn("abc",
          when(col("cum_ppm") <= 800000L, "A")
            .when(col("cum_ppm") <= 950000L, "B").otherwise("C"))
        .groupBy("abc")
        .agg(count(lit(1)).as("n_parts"), sum("rev").as("class_rev"),
          min("cum_ppm").as("min_cum_ppm"), max("cum_ppm").as("max_cum_ppm"))
    }),

    // ---- discount-response curve: per discount band (cents), volume
    //      and revenue response — one map-side bucketing + one groupBy,
    //      ppm-exact mean quantity ----
    "q_discount_response" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .groupBy(floor(col("l_discount") * 100 + 0.5).cast("long")
          .as("disc_pct"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("long")).as("total_qty"),
          sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
            .as("rev_cents"))
        .withColumn("qty_per_item_ppm",
          expr("total_qty * 1000000 div n_items"))),

    // ---- grouped embedding centroids: per-label mean vector in exact
    //      micro units — posexplode + (label, pos) groupBy, the vector
    //      aggregation behind IVF seeding and drift monitoring. The
    //      +10000·n shift makes the division numerator positive so
    //      Spark's truncating `div` and DuckDB's flooring `//` agree
    //      on negative component sums ----
    "q_emb_centroid" -> ((s, dir) =>
      Tables.load(s, dir, "embeddings")
        .select(col("label").cast("long").as("label"),
          posexplode(col("embedding")))
        .select(col("label"), col("pos").cast("long").as("pos"),
          floor(col("col").cast("double") * 1000 + 0.5).cast("long")
            .as("v_milli"))
        .groupBy("label", "pos")
        .agg(count(lit(1)).as("n"), sum("v_milli").as("sum_milli"))
        .withColumn("centroid_micro",
          expr("(sum_milli + 10000 * n) * 1000 div n - 10000000"))),

    // ---- dataset card: the per-source corpus summary sheet — doc and
    //      char counts, language spread, length extremes, short-doc
    //      share; one groupBy over the documents table ----
    "q_dataset_card" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("total_chars"),
          countDistinct("lang").as("n_langs"),
          min("n_chars").as("min_chars"),
          max("n_chars").as("max_chars"),
          sum(when(col("n_chars") < 200, 1L).otherwise(0L)).as("n_short"))
        .withColumn("mean_chars_micro",
          expr("total_chars * 1000000 div n_docs"))
        .withColumn("short_ppm", expr("n_short * 1000000 div n_docs"))),

    // ---- exact join-size prediction: |A ⋈ B| on a key WITHOUT
    //      executing the join — the inner product of the two per-key
    //      count vectors (what a cost-based optimizer estimates with
    //      sketches, computed exactly here on the pre-aggregated key
    //      dimension). Also surfaces the largest single-key
    //      contribution, the number AQE's skew handling cares about ----
    "q_join_size" -> ((s, dir) => {
      val a = Tables.load(s, dir, "orders")
        .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("cnt_a"))
      val b = Tables.events(s, dir)
        .groupBy(col("user_id").as("k")).agg(count(lit(1)).as("cnt_b"))
      a.join(b, "k")
        .agg(sum(col("cnt_a") * col("cnt_b")).as("join_rows"),
          count(lit(1)).as("shared_keys"),
          max(col("cnt_a") * col("cnt_b")).as("max_key_contrib"))
    }),

    // ---- skew report: per candidate shuffle key, the numbers that
    //      decide partitioning strategy — key count, heaviest key's
    //      row share (ppm), and heaviest-vs-mean skew ratio. One
    //      groupBy per column, union'd; all map-side-combinable ----
    "q_skew_report" -> ((s, dir) => {
      def stats(df: DataFrame, keyCol: String, name: String) = {
        df.groupBy(col(keyCol).cast("long").as("k"))
          .agg(count(lit(1)).as("cnt"))
          .agg(sum("cnt").as("n_rows"), count(lit(1)).as("n_keys"),
            max("cnt").as("max_cnt"))
          .select(lit(name).as("join_key"), col("n_rows"), col("n_keys"),
            col("max_cnt"),
            expr("max_cnt * 1000000 div n_rows").as("top1_ppm"),
            expr("max_cnt * n_keys * 1000000 div n_rows")
              .as("skew_ratio_ppm"))
      }
      stats(Tables.load(s, dir, "orders"), "o_custkey", "orders.o_custkey")
        .unionByName(stats(Tables.load(s, dir, "lineitem"), "l_partkey",
          "lineitem.l_partkey"))
        .unionByName(stats(Tables.load(s, dir, "lineitem"), "l_suppkey",
          "lineitem.l_suppkey"))
        .unionByName(stats(Tables.events(s, dir), "user_id",
          "events.user_id"))
    }),

    // ---- cohort LTV curve: cumulative purchase revenue per user by
    //      account age (days since the user's first event). Per-age
    //      revenue aggregates first, so the cumulative window runs
    //      over ~|corpus days| rows; exact cents and ppm-per-user ----
    "q_ltv_curve" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .select(col("user_id"),
          expr("ts_ns div 86400000000000").as("day"),
          when(col("event_type") === "purchase",
            floor(col("value") * 100 + 0.5).cast("long")).otherwise(0L)
            .as("cents"))
      val f = e.groupBy("user_id").agg(min("day").as("first_day"))
      val nU = f.agg(count(lit(1)).as("n_users"))
      e.join(f, "user_id")
        .groupBy((col("day") - col("first_day")).as("age"))
        .agg(sum("cents").as("age_rev"))
        .crossJoin(broadcast(nU))
        .withColumn("cum_rev", sum("age_rev").over(
          Window.orderBy("age")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("age"), col("age_rev"), col("cum_rev"),
          expr("cum_rev * 1000000 div n_users").as("ltv_micro"))
    }),

    // ---- conversion-lag distribution: hours from a user's first view
    //      to their first purchase, as an hour-bucket histogram —
    //      funnel TIMING beside q_funnel's stage counts. Two
    //      conditional mins in one groupBy (no join, no window), then
    //      a tiny bucket aggregate ----
    "q_conversion_lag" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          expr("ts_ns div 1000000").as("ms"))
        .groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("ms")))
          .as("first_view_ms"),
          min(when(col("event_type") === "purchase", col("ms")))
            .as("first_purchase_ms"))
        .filter(col("first_view_ms").isNotNull &&
          col("first_purchase_ms").isNotNull &&
          col("first_purchase_ms") >= col("first_view_ms"))
        .withColumn("lag_hours",
          expr("(first_purchase_ms - first_view_ms) div 3600000"))
        .groupBy("lag_hours")
        .agg(count(lit(1)).as("n_users"),
          min(col("first_purchase_ms") - col("first_view_ms"))
            .as("min_lag_ms"),
          max(col("first_purchase_ms") - col("first_view_ms"))
            .as("max_lag_ms"))),

    // ---- survivorship election: per near-dup cluster, keep ONE
    //      canonical document by (longest text, then lowest id) — the
    //      curation step after q_dedup_clusters labels components.
    //      Election is a row_number window partitioned by component;
    //      output one row per MULTI-document cluster with the kept id
    //      and how many it displaces ----
    "q_survivorship" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val pairs = graft.functions.Dedup.lshCandidatePairs(
        docs, "doc_id", "text", 3, 16, 4)
      val comp = graft.operators.ConnectedComponents.run(
        docs.select(col("doc_id").as("node")),
        pairs.select(col("doc_a"), col("doc_b")))
      val labeled = comp.join(docs.select(col("doc_id").as("node"),
        col("n_chars")), "node")
      val w = Window.partitionBy("component")
        .orderBy(col("n_chars").desc, col("node"))
      labeled
        .withColumn("rk", row_number().over(w))
        .groupBy("component")
        .agg(count(lit(1)).as("n_docs"),
          min(when(col("rk") === 1, col("node"))).as("keep_id"),
          max(when(col("rk") === 1, col("n_chars"))).as("keep_chars"))
        .filter(col("n_docs") > 1)
    }),

    // ---- p-chart (statistical process control): per day, error share
    //      vs the corpus-wide rate with the 3σ binomial control limit,
    //      decided entirely in integers — err/n > p̄ + 3·√(p̄(1−p̄)/n)
    //      squared and cleared of denominators becomes
    //      (err·N − E·n)²·N > 9·E·(N−E)·n, evaluated in DECIMAL(38,0)
    //      so the squared term never overflows (the q_chisq pattern) ----
    "q_control_chart" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(expr("ts_ns div 86400000000000").as("day"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("err"))
      val tot = daily.agg(sum("n").as("big_n"), sum("err").as("big_e"))
      daily.crossJoin(broadcast(tot))
        .select(col("day"), col("n"), col("err"),
          expr("err * 1000000 div n").as("rate_ppm"),
          expr("big_e * 1000000 div big_n").as("base_ppm"),
          when(
            expr("""cast(err as decimal(38,0)) * big_n - cast(big_e as decimal(38,0)) * n > 0 AND
                    (cast(err as decimal(38,0)) * big_n - cast(big_e as decimal(38,0)) * n) *
                    (cast(err as decimal(38,0)) * big_n - cast(big_e as decimal(38,0)) * n) * big_n >
                    9 * cast(big_e as decimal(38,0)) * (big_n - big_e) * n"""),
            1L).otherwise(0L).as("out_of_control"))
    }),

    // ---- order backlog over time: open-order queue depth per day via
    //      the interval→delta→cumsum identity (+1 at placement, −1 the
    //      day after the order's LAST shipment). Deltas aggregate per
    //      day before the cumulative window, so it runs over distinct
    //      days, not orders ----
    "q_backlog" -> ((s, dir) => {
      val opens = Tables.load(s, dir, "orders")
        .select(expr("datediff(o_orderdate, date'1970-01-01')")
          .cast("long").as("day"), lit(1L).as("delta"))
      val closes = Tables.load(s, dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(max(col("l_shipdate")).as("done"))
        .select(expr("datediff(done, date'1970-01-01') + 1")
          .cast("long").as("day"), lit(-1L).as("delta"))
      opens.unionByName(closes)
        .groupBy("day")
        .agg(sum("delta").as("net_delta"))
        .withColumn("backlog", sum("net_delta").over(
          Window.orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    }),

    // ---- Laspeyres price index per brand: year-over-year price level
    //      weighted by BASE-year quantities. Unit values are integer
    //      milli-cents (sum_cents·1000 div sum_qty) so both engines
    //      floor identically; base/current years derived from the data
    //      and broadcast; only parts traded in both years contribute ----
    "q_price_index" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .join(broadcast(Tables.load(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand").as("brand"), col("l_partkey"),
          year(col("l_shipdate")).cast("long").as("yr"),
          floor(col("l_extendedprice") * 100 + 0.5).cast("long")
            .as("cents"),
          col("l_quantity").cast("long").as("qty"))
      val yrs = li.agg(min("yr").as("y0"), max("yr").as("y1"))
      val uv = li.crossJoin(broadcast(yrs))
        .filter(col("yr") === col("y0") || col("yr") === col("y1"))
        .groupBy("brand", "l_partkey", "yr", "y0")
        .agg(sum("cents").as("c"), sum("qty").as("q"))
        .withColumn("uv_milli", expr("c * 1000 div q"))
      val base = uv.filter(col("yr") === col("y0"))
        .select(col("brand"), col("l_partkey"),
          col("uv_milli").as("uv0"), col("q").as("q0"))
      val cur = uv.filter(col("yr") =!= col("y0"))
        .select(col("brand"), col("l_partkey"),
          col("uv_milli").as("uv1"))
      base.join(cur, Seq("brand", "l_partkey"))
        .groupBy("brand")
        .agg(count(lit(1)).as("n_parts"),
          sum(expr("uv1 * q0")).as("num"),
          sum(expr("uv0 * q0")).as("den"))
        // num reaches ~1.5e12 per brand at sf0.1, so num * 1e6 overflows
        // BIGINT — widen the intermediate to decimal(38,0) (DuckDB's
        // mirror is already HUGEINT); the quotient is ppm-scale, well
        // inside long
        .withColumn("index_ppm",
          expr("cast(cast(num as decimal(38,0)) * 1000000 div den as bigint)"))
    }),

    // ---- robust stats: 10%-trimmed mean per segment. Values shift by
    //      +100000 cents before the integer division so every operand
    //      stays positive (Spark `div` truncates toward zero, DuckDB
    //      `//` floors — they only agree on non-negatives; the shift
    //      is a whole multiple of the divisor path so it subtracts
    //      back out exactly) ----
    "q_trimmed_mean" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
        .select(col("c_mktsegment").as("segment"),
          floor(col("c_acctbal") * 100 + 0.5).cast("long").as("cents"),
          col("c_custkey"))
      val w = Window.partitionBy("segment")
        .orderBy(col("cents"), col("c_custkey"))
      c.withColumn("rk", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("segment")))
        .filter(col("rk") > expr("n div 10") &&
                col("rk") <= col("n") - expr("n div 10"))
        .groupBy("segment")
        .agg(count(lit(1)).as("n_kept"),
          expr("sum(cents + 100000) * 10000 div count(1) - 1000000000")
            .as("trimmed_mean_micro"))
    }),

    // ---- two-sample Kolmogorov–Smirnov distance between the F and O
    //      order-price distributions, exactly: D = max|F1−F2| over the
    //      pooled support, cleared of denominators as
    //      max|cum_f·n_o − cum_o·n_f| (pure integers; the ppm figure
    //      divides once at the end). One global window over DISTINCT
    //      price points, not orders ----
    "q_ks_test" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderstatus").isin("F", "O"))
        .select(floor(col("o_totalprice") * 100 + 0.5).cast("long")
          .as("cents"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("is_f"))
      val byV = o.groupBy("cents")
        .agg(sum("is_f").as("cf"), sum(expr("1 - is_f")).as("co"))
      val w = Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = byV.select(
        sum("cf").over(w).as("cum_f"), sum("co").over(w).as("cum_o"))
      val tot = o.agg(sum("is_f").as("n_f"), sum(expr("1 - is_f")).as("n_o"))
      cum.crossJoin(broadcast(tot))
        .groupBy("n_f", "n_o")
        .agg(max(abs(expr("cum_f * n_o - cum_o * n_f"))).as("d_num"))
        .withColumn("ks_ppm", expr("d_num * 1000000 div (n_f * n_o)"))
    }),

    // ---- Mann–Whitney U between click and purchase event values,
    //      tie-correct and exact: doubled midranks (2·avgrank of a
    //      tied block at offset s, size t, is 2s+t+1 — an integer), so
    //      2R and 2U never see a fraction. Per-value counts first, so
    //      the rank window runs over distinct values ----
    "q_mann_whitney" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(floor(col("value") * 1000000 + 0.5).cast("long").as("v"),
          when(col("event_type") === "click", 1L).otherwise(0L).as("is_a"))
      val byV = e.groupBy("v")
        .agg(sum("is_a").as("ca"), count(lit(1)).as("ct"))
      val w = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val ranked = byV.withColumn("before",
        coalesce(sum("ct").over(w), lit(0L)))
      val tot = e.agg(sum("is_a").as("n_a"),
        sum(expr("1 - is_a")).as("n_b"))
      ranked.crossJoin(broadcast(tot))
        .groupBy("n_a", "n_b")
        .agg(sum(expr("ca * (2 * before + ct + 1)")).as("r2_a"))
        .withColumn("u2_a", expr("r2_a - n_a * (n_a + 1)"))
    }),

    // ---- threshold classification metrics: 2×2 confusion matrix +
    //      integer-exact precision/recall/F1 for a scored column vs a
    //      label. One map-side conditional aggregation — no shuffle of
    //      data rows at any scale ----
    "q_confusion" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(floor(col("o_totalprice") * 100 + 0.5).cast("long")
            .as("cents"),
          (col("o_orderstatus") === "F").as("lbl"))
      graft.functions.Eval.confusion(o, col("cents") >= 15000000L, col("lbl"))
    }),

    // ---- score calibration table: equi-depth decile bins by the
    //      portable crossing rule, positive rate per bin — the
    //      monotonicity of pos_rate_ppm IS the calibration check ----
    "q_calibration" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(floor(col("o_totalprice") * 100 + 0.5).cast("long")
            .as("cents"),
          (col("o_orderstatus") === "F").as("lbl"))
      graft.functions.Eval.calibration(o, col("cents"), col("lbl"), 10)
    }),

    // ---- inter-rater agreement (Cohen's kappa) between two boolean
    //      quality filters over the corpus; kappa emitted as an exact
    //      BIGINT fraction (it can be negative, and negative integer
    //      division is not portable cross-engine) ----
    "q_rater_kappa" -> ((s, dir) =>
      graft.functions.Eval.raterAgreement(Tables.load(s, dir, "documents"),
        col("lang") === "en", col("n_chars") >= 200)),

    // ---- one-way ANOVA over account balances by segment, with a
    //      floor-exact contract: each group's sum-of-squares term takes
    //      ONE positive floor division (s² div n), so SSW/SSB/F are
    //      bit-identical across engines — no variance doubles anywhere.
    //      One groupBy + one 5-row reduce; v shifts +100000 cents so
    //      every operand stays nonnegative (negative integer division
    //      is not portable). Squares widen to decimal(38,0) (the
    //      oracle's HUGEINT): s_g² brushes the BIGINT ceiling at sf0.1 ----
    "q_anova" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
        .select(col("c_mktsegment").as("seg"),
          (floor(col("c_acctbal") * 100 + 0.5).cast("long") + 100000L)
            .as("v"))
      val g = c.groupBy("seg").agg(count(lit(1)).as("n_g"),
        sum("v").as("s_g"),
        sum(expr("cast(v as decimal(38,0)) * v")).as("ss_g"))
      g.select(col("n_g"), col("s_g"), col("ss_g"),
          expr("ss_g - cast(s_g as decimal(38,0)) * s_g div n_g").as("w_g"))
        .agg(count(lit(1)).as("k"), sum("n_g").as("n"),
          sum("s_g").as("s"), sum("ss_g").as("ss_tot"),
          sum("w_g").as("ssw_d"))
        .select(col("k"), col("n"),
          expr("cast(ss_tot - cast(s as decimal(38,0)) * s div n - ssw_d" +
            " as bigint)").as("ssb"),
          expr("cast(ssw_d as bigint)").as("ssw"))
        .withColumn("f_ppm", expr(
          "cast(cast(ssb as decimal(38,0)) * (n - k) * 1000000" +
          " div (ssw * (k - 1)) as bigint)"))
    }),

    // ---- Spearman rank correlation between order price and date,
    //      exact: ranks are row_number over a deterministic total order
    //      (value, key tiebreak). rho's exact fraction n(n²−1) − 6Σd²
    //      over n(n²−1) grows as n³ (BIGINT wraps at n ≈ 2.1M), so the
    //      whole computation runs in decimal(38,0) — the oracle's
    //      HUGEINT — and the surface is the bounded shifted form
    //      rho_shift_ppm = (rho+1)/2 · 10⁶ ∈ [0, 10⁶]: nonnegative
    //      (so integer division is portable — Spark div truncates,
    //      DuckDB // floors, they agree only on nonnegatives) and
    //      BIGINT at any n. Two value-ranked windows + one reduce ----
    "q_spearman" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
          col("o_orderdate"))
      o.withColumn("rx", row_number().over(
          Window.orderBy(col("cents"), col("o_orderkey"))).cast("long"))
        .withColumn("ry", row_number().over(
          Window.orderBy(col("o_orderdate"), col("o_orderkey"))).cast("long"))
        .agg(count(lit(1)).as("n"),
          sum(expr("cast((rx - ry) * (rx - ry) as decimal(38,0))"))
            .as("sum_d2_w"))
        .select(col("n"),
          expr("cast(sum_d2_w as bigint)").as("sum_d2"),
          expr("cast((2 * cast(n as decimal(38,0)) *" +
            " (cast(n as decimal(38,0)) * n - 1) - 6 * sum_d2_w)" +
            " * 1000000 div (2 * cast(n as decimal(38,0)) *" +
            " (cast(n as decimal(38,0)) * n - 1)) as bigint)")
            .as("rho_shift_ppm"))
    }),

    // ---- functional-dependency audit: does LHS determine RHS? Three
    //      candidate FDs checked as hash aggregations (one shuffle per
    //      candidate, on the LHS key); a group with >1 distinct RHS is
    //      a violation ----
    "q_fd_check" -> ((s, dir) => {
      def fd(df: DataFrame, name: String, lhs: String, rhs: String) =
        df.groupBy(col(lhs))
          .agg(countDistinct(col(rhs)).as("d"))
          .agg(count(lit(1)).as("n_groups"),
            sum(when(col("d") > 1, 1L).otherwise(0L)).as("n_violating"),
            max("d").as("max_rhs"))
          .select(lit(name).as("fd"), col("n_groups"),
            col("n_violating"), col("max_rhs"))
      fd(Tables.load(s, dir, "orders"), "o_custkey->o_orderpriority",
          "o_custkey", "o_orderpriority")
        .unionByName(fd(Tables.load(s, dir, "lineitem"),
          "l_orderkey->l_returnflag", "l_orderkey", "l_returnflag"))
        .unionByName(fd(Tables.load(s, dir, "customer"),
          "c_nationkey->c_mktsegment", "c_nationkey", "c_mktsegment"))
    }),

    // ---- referential-integrity audit: orphan foreign keys per edge of
    //      the star schema. Each check is a broadcast LEFT join against
    //      the (distinct) dimension key — fact side never shuffles ----
    "q_ref_integrity" -> ((s, dir) => {
      def orphans(fact: DataFrame, key: String, dim: DataFrame,
                  dkey: String, name: String) =
        fact.select(col(key).as("k"))
          .join(broadcast(dim.select(col(dkey).as("dk")).distinct()),
            col("k") === col("dk"), "left")
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col("dk").isNull, 1L).otherwise(0L)).as("n_orphans"))
          .select(lit(name).as("chk"), col("n_rows"), col("n_orphans"))
      val cust = Tables.load(s, dir, "customer")
      orphans(Tables.load(s, dir, "orders"), "o_custkey", cust,
          "c_custkey", "orders->customer")
        .unionByName(orphans(Tables.load(s, dir, "lineitem"), "l_partkey",
          Tables.load(s, dir, "part"), "p_partkey", "lineitem->part"))
        .unionByName(orphans(Tables.load(s, dir, "lineitem"), "l_suppkey",
          Tables.load(s, dir, "supplier"), "s_suppkey",
          "lineitem->supplier"))
        .unionByName(orphans(Tables.events(s, dir), "user_id", cust,
          "c_custkey", "events->customer"))
    }),

    // ---- l-diversity audit (companion to q_k_anon): per
    //      quasi-identifier group (nation, segment), how many DISTINCT
    //      sensitive values (thousand-dollar balance band) — a group
    //      below l=3 is re-identifiable by attribute disclosure even
    //      when k-anonymous. Bands shift positive before the integer
    //      division (negative balances exist) ----
    "q_l_diversity" -> ((s, dir) =>
      Tables.load(s, dir, "customer")
        .select(col("c_nationkey").cast("long").as("nation"),
          col("c_mktsegment").as("segment"),
          expr("(cast(floor(c_acctbal * 100 + 0.5) as bigint) + 100000) div 100000")
            .as("band"))
        .groupBy("nation", "segment")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("band")).as("n_sens"))
        .withColumn("meets_l3",
          when(col("n_sens") >= 3, 1L).otherwise(0L))),

    // ---- PMI collocations: bigrams scoring far above independence.
    //      PMI's log is monotone, so ranking/thresholding works on the
    //      raw ratio p(ab)/(p(a)p(b)) = c_ab·N_u²/(N_bg·c_a·c_b),
    //      carried in decimal(38,0)/HUGEINT ppm (c_ab·N_u² alone tops
    //      long range at corpus scale). Unigram joins are plain equi
    //      joins on the token key — the vocabulary is never collected
    //      or broadcast ----
    "q_pmi_collocations" -> ((s, dir) => {
      val toks = Tables.load(s, dir, "documents")
        .select(expr("filter(" +
          "split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' '), " +
          "x -> x != '')").as("t"))
      val uni = toks.select(explode(col("t")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
        .localCheckpoint(eager = true)
      val bg = toks.filter(size(col("t")) >= 2)
        .select(explode(expr(
          "filter(zip_with(t, slice(t, 2, size(t) - 1), " +
          "(a, b) -> concat(a, ' ', b)), x -> x is not null)")).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 5)
      val nU = uni.agg(sum("c").as("n_u"))
      val nBg = toks.filter(size(col("t")) >= 2)
        .agg(sum(expr("size(t) - 1")).as("n_bg"))
      bg.withColumn("w1", substring_index(col("bigram"), " ", 1))
        .withColumn("w2", substring_index(col("bigram"), " ", -1))
        .join(uni.select(col("w").as("w1"), col("c").as("c_a")), Seq("w1"))
        .join(uni.select(col("w").as("w2"), col("c").as("c_b")), Seq("w2"))
        .crossJoin(broadcast(nU)).crossJoin(broadcast(nBg))
        .select(col("bigram"), col("c_ab"),
          expr("""cast(c_ab as decimal(38,0)) * n_u * n_u * 1000000
                  div (cast(n_bg as decimal(38,0)) * c_a * c_b)""")
            .cast("long").as("pmi_ratio_ppm"))
    }),

    // ---- Zipf rank–frequency head: top-100 tokens with rank·freq
    //      (constant under Zipf's law). TakeOrderedAndProject shape —
    //      the full vocabulary is aggregated but only the head sorts ----
    "q_zipf" -> ((s, dir) => {
      val uni = Tables.load(s, dir, "documents")
        .select(explode(expr("filter(" +
          "split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' '), " +
          "x -> x != '')")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n"))
      uni.withColumn("rank", row_number().over(
          Window.orderBy(col("n").desc, col("w"))))
        .filter(col("rank") <= 100)
        .withColumn("rank_x_freq", col("rank") * col("n"))
    }),

    // ---- deterministic negative sampling for contrastive training
    //      pairs: each query doc draws k=5 pseudo-random corpus indexes
    //      via an affine hash (Knuth multiplier) mod N — reproducible
    //      across engines and runs, no RNG state. Index→doc resolution
    //      is an equi-join on the dense rank, and the same-source flag
    //      marks negatives too easy to train on ----
    "q_neg_sample" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val idx = docs.select(col("doc_id"), col("source"))
        .withColumn("i",
          row_number().over(Window.orderBy("doc_id")) - lit(1L))
      val n = idx.agg(count(lit(1)).as("n_docs"))
      val q = idx.filter(col("i") < 20)
        .select(col("doc_id").as("q_id"), col("i").as("qi"),
          col("source").as("q_source"))
      q.crossJoin(broadcast(n))
        .select(col("q_id"), col("q_source"), col("n_docs"),
          explode(expr("sequence(1L, 5L)")).as("j"))
        .withColumn("neg_i",
          expr("(q_id * 2654435761 + j * 40503) % n_docs"))
        .join(idx.select(col("i").as("neg_i"), col("doc_id").as("neg_id"),
          col("source").as("neg_source")), Seq("neg_i"))
        .filter(col("neg_id") =!= col("q_id"))
        .select(col("q_id"), col("j"), col("neg_id"),
          when(col("q_source") === col("neg_source"), 1L).otherwise(0L)
            .as("same_source"))
    }),

    // ---- hashing-trick feature buckets: tokens fold into a fixed
    //      64-dim count vector, bucket = portable arithmetic over
    //      (length, first char, last char) so the oracle reproduces it
    //      exactly; the hash family is pluggable (xxhash64 in
    //      production — same plan shape, one map-side expression) ----
    "q_feature_hash" -> ((s, dir) =>
      Tables.load(s, dir, "documents")
        .select(explode(expr("filter(" +
          "split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' '), " +
          "x -> x != '')")).as("w"))
        .select(expr("""(length(w) * 31 + ascii(substring(w, 1, 1)) * 7
                        + ascii(substring(w, -1, 1))) % 64""").as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_tokens"))),

    // ---- seasonal-naive forecast with exact errors: each month's
    //      order count predicted by the same month last year; the join
    //      on month_id−12 (not lag-12) stays correct under missing
    //      months. Integer counts ⇒ errors exact in both engines ----
    "q_seasonal_forecast" -> ((s, dir) => {
      val m = Tables.load(s, dir, "orders")
        .groupBy((year(col("o_orderdate")) * 12 +
          month(col("o_orderdate"))).cast("long").as("month_id"))
        .agg(count(lit(1)).as("actual"))
      m.join(m.select((col("month_id") + 12).as("month_id"),
          col("actual").as("forecast")), Seq("month_id"))
        .select(col("month_id"), col("actual"), col("forecast"),
          abs(col("actual") - col("forecast")).as("abs_err"),
          expr("abs(actual - forecast) * 1000000 div forecast")
            .as("err_ppm"))
    }),

    // ---- population-stability buckets (PSI's per-bucket table without
    //      the log): order-value distribution in $50k bands, first vs
    //      last year, with exact ppm shares and drift. Full outer join
    //      keeps bands present in only one year; empty-side shares
    //      coalesce to 0 ----
    "q_psi_buckets" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(year(col("o_orderdate")).cast("long").as("yr"),
          expr("cast(floor(o_totalprice * 100 + 0.5) as bigint) div 5000000")
            .as("bucket"))
      val yrs = o.agg(min("yr").as("y0"), max("yr").as("y1"))
      val b = o.crossJoin(broadcast(yrs))
        .filter(col("yr") === col("y0") || col("yr") === col("y1"))
        .groupBy("bucket")
        .agg(sum(when(col("yr") === col("y0"), 1L).otherwise(0L)).as("n0"),
          sum(when(col("yr") === col("y1"), 1L).otherwise(0L)).as("n1"))
      val tot = b.agg(sum("n0").as("big0"), sum("n1").as("big1"))
      b.crossJoin(broadcast(tot))
        .select(col("bucket"), col("n0"), col("n1"),
          expr("n0 * 1000000 div big0").as("share0_ppm"),
          expr("n1 * 1000000 div big1").as("share1_ppm"),
          abs(expr("n0 * 1000000 div big0 - n1 * 1000000 div big1"))
            .as("drift_ppm"))
    }),

    // ---- Allen interval algebra over consecutive orders: each order's
    //      lifespan [placement, last shipment] classified against the
    //      customer's next one — precedes/meets/overlaps/contains/
    //      inside/started_by/finishes/equals as a mutually-exclusive
    //      CASE ladder on integer days. One window per customer, then a
    //      global count per relation ----
    "q_allen_intervals" -> ((s, dir) => {
      val spans = Tables.load(s, dir, "orders")
        .join(Tables.load(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(max(expr("datediff(l_shipdate, date'1970-01-01')"))
            .cast("long").as("e")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey"), col("o_orderkey"),
          expr("cast(datediff(o_orderdate, date'1970-01-01') as bigint)")
            .as("s"), col("e"))
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("s"), col("o_orderkey"))
      spans
        .withColumn("s2", lead("s", 1).over(w))
        .withColumn("e2", lead("e", 1).over(w))
        .filter(col("s2").isNotNull)
        .select(expr("""CASE
            WHEN e < s2 THEN 'precedes'
            WHEN e = s2 THEN 'meets'
            WHEN s = s2 AND e = e2 THEN 'equals'
            WHEN s = s2 THEN 'starts'
            WHEN e = e2 THEN 'finishes'
            WHEN s < s2 AND e > e2 THEN 'contains'
            WHEN s > s2 AND e < e2 THEN 'inside'
            ELSE 'overlaps' END""").as("relation"))
        .groupBy("relation")
        .agg(count(lit(1)).as("n_pairs"))
    }),

    // ---- audience-overlap Jaccard between event types: distinct
    //      (user, type) pairs self-join per user (≤k² rows each, k=5
    //      types), so intersections aggregate without ever comparing
    //      audiences pairwise at corpus scale ----
    "q_audience_overlap" -> ((s, dir) => {
      val ut = Tables.events(s, dir)
        .select(col("user_id"), col("event_type").as("t")).distinct()
      val sizes = ut.groupBy("t").agg(count(lit(1)).as("n"))
      val inter = ut.as("a")
        .join(ut.as("b"), col("a.user_id") === col("b.user_id") &&
          col("a.t") < col("b.t"))
        .groupBy(col("a.t").as("t1"), col("b.t").as("t2"))
        .agg(count(lit(1)).as("n_both"))
      inter
        .join(sizes.select(col("t").as("t1"), col("n").as("n1")), Seq("t1"))
        .join(sizes.select(col("t").as("t2"), col("n").as("n2")), Seq("t2"))
        .select(col("t1"), col("t2"), col("n1"), col("n2"), col("n_both"),
          expr("n_both * 1000000 div (n1 + n2 - n_both)")
            .as("jaccard_ppm"))
    }),

    // ---- Wald–Wolfowitz runs test on daily order volume: runs of
    //      above/below-median days vs the count expected under
    //      randomness, exactly — lower median (discrete quantile) keeps
    //      everything integral, median-tied days drop (standard
    //      practice), expected runs carried in micro units ----
    "q_runs_test" -> ((s, dir) => {
      val daily = Tables.load(s, dir, "orders")
        .groupBy(expr("cast(datediff(o_orderdate, date'1970-01-01') as bigint)")
          .as("day"))
        .agg(count(lit(1)).as("n"))
      val med = daily
        .withColumn("rk", row_number().over(Window.orderBy(col("n"), col("day"))))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy()))
        .filter(col("rk") === expr("(cnt + 1) div 2"))
        .select(col("n").as("m"))
      val signed = daily.crossJoin(broadcast(med))
        .filter(col("n") =!= col("m"))
        .select(col("day"), when(col("n") > col("m"), 1L).otherwise(0L)
          .as("above"))
      val flips = signed
        .withColumn("prev", lag("above", 1).over(Window.orderBy("day")))
        .select(when(col("prev").isNull || col("prev") =!= col("above"), 1L)
          .otherwise(0L).as("new_run"), col("above"))
      flips.agg(sum(when(col("above") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("above") === 0, 1L).otherwise(0L)).as("n2"),
          sum("new_run").as("runs"))
        .withColumn("expected_micro",
          expr("1000000 + 2 * n1 * n2 * 1000000 div (n1 + n2)"))
    }),

    // ---- n-gram novelty: per document, the share of its bigram
    //      occurrences that are corpus-unique — high novelty separates
    //      original text from boilerplate. One shuffle on the bigram
    //      key to fold corpus counts back onto documents ----
    "q_ngram_novelty" -> ((s, dir) => {
      val bgDoc = Tables.load(s, dir, "documents")
        .select(col("doc_id"), expr("filter(" +
          "split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' '), " +
          "x -> x != '')").as("t"))
        .filter(size(col("t")) >= 2)
        .select(col("doc_id"), explode(expr(
          "filter(zip_with(t, slice(t, 2, size(t) - 1), " +
          "(a, b) -> concat(a, ' ', b)), x -> x is not null)")).as("bigram"))
      val counts = bgDoc.groupBy("bigram").agg(count(lit(1)).as("c"))
      bgDoc.join(counts, Seq("bigram"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_novel"))
        .withColumn("novelty_ppm",
          expr("n_novel * 1000000 div n_bigrams"))
    }),

    // ---- LSH self-evaluation: recall/precision of the banded MinHash
    //      candidate generator against the exact Jaccard≥0.8 pair set
    //      — the number that tells you whether 16×4 banding is safe to
    //      ship before a 100-TB dedup run. Both sides are the library's
    //      own operators; the tiny pair sets localCheckpoint so LSH
    //      isn't re-derived for the count ----
    "q_lsh_recall" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val exact = graft.functions.Dedup.ngramJaccardPairs(
        docs, "doc_id", "text", 3, 0.8).select("doc_a", "doc_b")
      val lsh = graft.functions.Dedup.lshCandidatePairs(
          docs, "doc_id", "text", 3, 16, 4)
        .localCheckpoint(eager = true)
      val nl = lsh.agg(count(lit(1)).as("n_lsh"))
      exact.join(lsh.withColumn("hit", lit(1L)),
          Seq("doc_a", "doc_b"), "left")
        .agg(count(lit(1)).as("n_exact"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .crossJoin(broadcast(nl))
        .select(col("n_exact"), col("n_lsh"), col("n_hit"),
          expr("n_hit * 1000000 div n_exact").as("recall_ppm"),
          expr("n_hit * 1000000 div n_lsh").as("precision_ppm"))
    }),

    // ---- deterministic bootstrap: 32 half-sample replicas of the mean
    //      order value, membership decided by a per-replica
    //      multiplicative hash (no RNG state, reproducible across
    //      engines and partitionings). The replica spread is the CI;
    //      map-side fan-out ×32 then one hash aggregation ----
    "q_bootstrap_ci" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .select(col("o_orderkey"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        .select(col("o_orderkey"), col("cents"),
          explode(expr("sequence(0L, 31L)")).as("b"))
        .filter(expr("(o_orderkey * (2654435761 + 2 * b)) % 1000003 < 500002"))
        .groupBy("b")
        .agg(count(lit(1)).as("n"),
          expr("sum(cents) * 10000 div count(1)").as("mean_micro"))),

    // ---- degree distribution of the supplier co-purchase graph:
    //      incident-edge counts per node, histogrammed in bands of 8.
    //      Edge derivation shares [[CoOccurrence.edges]] (hub-guarded,
    //      map-side pair explosion) with the other graph queries ----
    "q_degree_hist" -> ((s, dir) => {
      val edges = graft.operators.CoOccurrence.edges(
        Tables.load(s, dir, "lineitem"), "l_orderkey", "l_suppkey", 5L)
      edges.select(col("u").as("node"))
        .unionByName(edges.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("d"))
        .groupBy(expr("d div 8").as("bucket"))
        .agg(count(lit(1)).as("n_nodes"),
          min("d").as("min_deg"), max("d").as("max_deg"))
    }),

    // ---- out-of-order arrival audit (the batch question behind every
    //      streaming watermark choice): per user, how many events
    //      arrive with a timestamp behind the running max of earlier
    //      arrivals, and by how much at worst. One window per user in
    //      arrival (event_id) order ----
    "q_ooo_lateness" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_ns"))
        .withColumn("prior_max", max("ts_ns").over(w))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("ts_ns") < col("prior_max"), 1L).otherwise(0L))
            .as("n_late"),
          max(when(col("ts_ns") < col("prior_max"),
            col("prior_max") - col("ts_ns")).otherwise(0L))
            .as("max_late_ns"))
    }),

    // ---- second-order Markov transitions: P(next | prev2, prev1) in
    //      ppm — the sequence-model training table one order above
    //      q_transitions. Two leads over the same per-user window; the
    //      conditional divides by the context count via a window over
    //      the grouped result (no second shuffle of raw events) ----
    "q_trigram_transitions" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
      val tri = Tables.events(s, dir)
        .withColumn("t1", lead(col("event_type"), 1).over(w))
        .withColumn("t2", lead(col("event_type"), 2).over(w))
        .filter(col("t2").isNotNull)
        .groupBy(col("event_type").as("prev2"), col("t1").as("prev1"),
          col("t2").as("next_type"))
        .agg(count(lit(1)).as("n"))
      tri.withColumn("n_ctx",
          sum("n").over(Window.partitionBy("prev2", "prev1")))
        .withColumn("p_ppm", expr("n * 1000000 div n_ctx"))
    }),

    // ---- supervised feature/label windowing: per (user, day), counts
    //      of each behavior over the trailing 7 days and a
    //      purchase-in-next-7-days label — the canonical propensity
    //      training table. RANGE frames over the integer day key, so
    //      gaps in activity are handled by the frame, not by a spine
    //      join ----
    "q_label_windows" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("user_id"),
          expr("ts_ns div 86400000000000").as("day"))
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("clicks"),
          sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("views"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("purchases"))
      val past = Window.partitionBy("user_id").orderBy("day")
        .rangeBetween(-7, -1)
      val future = Window.partitionBy("user_id").orderBy("day")
        .rangeBetween(1, 7)
      daily
        .withColumn("clicks_7d", coalesce(sum("clicks").over(past), lit(0L)))
        .withColumn("views_7d", coalesce(sum("views").over(past), lit(0L)))
        .withColumn("label", when(
          coalesce(sum("purchases").over(future), lit(0L)) > 0, 1L)
          .otherwise(0L))
        .select("user_id", "day", "clicks_7d", "views_7d", "label")
    }),

    // ---- session outcome by entry point: conversion rate of 30-min
    //      sessions grouped by their first event type — the
    //      sessionization window reused with a first()/max() rollup ----
    "q_sessionized_conversion" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
      val gapNs = 30L * 60 * 1000 * 1000 * 1000
      val sess = Tables.events(s, dir)
        .withColumn("prev", lag(col("ts_ns"), 1).over(w))
        .withColumn("new_s",
          when(col("prev").isNull || col("ts_ns") - col("prev") > gapNs, 1)
            .otherwise(0))
        .withColumn("session_id",
          sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("user_id", "session_id")
        .agg(min_by(col("event_type"), struct(col("ts_ns"), col("event_id")))
          .as("entry_type"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("converted"))
      sess.groupBy("entry_type")
        .agg(count(lit(1)).as("n_sessions"),
          sum("converted").as("n_converted"))
        .withColumn("cvr_ppm",
          expr("n_converted * 1000000 div n_sessions"))
    }),

    // ---- peak detection on daily order volume: a strict local max
    //      that also clears 1.5× the trailing 7-day mean, decided by
    //      cross-multiplication (14·n > 3·sum₇) so no ratio ever
    //      materializes. Neighbor comparison via lag/lead on the day
    //      sequence ----
    "q_peak_detect" -> ((s, dir) => {
      val daily = Tables.load(s, dir, "orders")
        .groupBy(expr("cast(datediff(o_orderdate, date'1970-01-01') as bigint)")
          .as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.orderBy("day")
      val trail = Window.orderBy("day").rangeBetween(-7, -1)
      daily
        .withColumn("prev_n", lag("n", 1).over(w))
        .withColumn("next_n", lead("n", 1).over(w))
        .withColumn("sum7", sum("n").over(trail))
        .withColumn("n7", count(lit(1)).over(trail))
        .filter(col("prev_n").isNotNull && col("next_n").isNotNull &&
          col("n7") === 7 &&
          col("n") > col("prev_n") && col("n") > col("next_n") &&
          expr("14 * n > 3 * sum7"))
        .select(col("day"), col("n"), col("sum7"),
          expr("n * 7000000 div sum7").as("vs_mean_ppm"))
    }),

    // ---- ingest-time incremental dedup: which arriving documents (top
    //      tenth of the id range — an arithmetic cutoff, no sort) are
    //      near-dups of the EXISTING corpus. Asymmetric filter on the
    //      LSH candidate pairs: only old→new matches survive, the
    //      report is per new doc ----
    "q_incremental_dedup" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val bounds = docs.agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
        .select(expr("mn + (mx - mn) * 9 div 10").as("thr"))
      graft.functions.Dedup.lshCandidatePairs(
          docs, "doc_id", "text", 3, 16, 4)
        .crossJoin(broadcast(bounds))
        .filter(col("doc_b") > col("thr") && col("doc_a") <= col("thr"))
        .groupBy(col("doc_b").as("new_doc"))
        .agg(count(lit(1)).as("n_old_matches"),
          min("doc_a").as("first_partner"))
    }),

    // ---- range-partitioner boundary estimation (what Spark's
    //      RangePartitioning does before a global sort at scale):
    //      deterministic 1/97 key sample, 31 split points at the
    //      sample's ntile positions. The sort runs over the SAMPLE
    //      only — the full table is never globally ordered ----
    "q_range_boundaries" -> ((s, dir) => {
      val samp = Tables.load(s, dir, "orders")
        .filter(expr("o_orderkey % 97 = 0"))
        .select(floor(col("o_totalprice") * 100 + 0.5).cast("long")
          .as("cents"), col("o_orderkey"))
      val rk = samp.withColumn("rk", row_number().over(
        Window.orderBy(col("cents"), col("o_orderkey"))))
      val pos = samp.agg(count(lit(1)).as("n_s"))
        .select(explode(expr("sequence(1L, 31L)")).as("bucket"), col("n_s"))
        .select(col("bucket"), expr("bucket * n_s div 32").as("rk"))
      rk.join(broadcast(pos), Seq("rk"))
        .select(col("bucket"), col("cents").as("boundary_cents"))
    }),

    // ---- Z-order (Morton) curve bucketing over (custkey, nation):
    //      bit-interleave 5+5 bits arithmetically — the address math
    //      behind [[graft.sources.ZOrderLayout]]'s multi-dimensional
    //      clustering, verified cross-engine ----
    "q_zvalue" -> ((s, dir) => {
      val z = (0 until 5).map(i =>
        s"((x div ${1 << i}) % 2) * ${1L << (2 * i)} + " +
        s"((y div ${1 << i}) % 2) * ${1L << (2 * i + 1)}").mkString(" + ")
      Tables.load(s, dir, "customer")
        .select(expr("c_custkey % 32").as("x"),
          expr("cast(c_nationkey as bigint) % 32").as("y"))
        .select(expr(z).as("z"))
        .groupBy(expr("z div 64").as("bucket"))
        .agg(count(lit(1)).as("n"), min("z").as("min_z"),
          max("z").as("max_z"))
    }),

    // ---- maximum drawdown of cumulative daily revenue: running peak
    //      minus running level, worst day reported deterministically
    //      (max dd, then earliest day). Cents end to end; the global
    //      day window partitions per instrument in a real book ----
    "q_drawdown" -> ((s, dir) => {
      val daily = Tables.load(s, dir, "orders")
        .groupBy(expr("cast(datediff(o_orderdate, date'1970-01-01') as bigint)")
          .as("day"))
        .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
          .as("rev"))
      val w = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dd = daily
        .withColumn("cum", sum("rev").over(w))
        .withColumn("peak", max(col("cum")).over(w))
        .withColumn("dd", col("peak") - col("cum"))
      dd.orderBy(col("dd").desc, col("day")).limit(1)
        .select(col("day").as("worst_day"), col("dd").as("max_dd_cents"),
          col("peak").as("peak_cents"), col("cum").as("cum_cents"))
    }),

    // ---- weighted sparse cosine pairs: TF-vector similarity via a
    //      postings join on the token key, df-capped at 100 (both the
    //      stopword guard and the candidate-volume bound — postings
    //      above the cap would dominate the join quadratically at
    //      corpus scale). Cosine² stays integral: cos²·1e6 =
    //      dot²·1e6 div (‖a‖²·‖b‖²), threshold 0.25 = cos ≥ 0.5, all
    //      over the df≤100 vocabulary by definition ----
    "q_sparse_cosine_pairs" -> ((s, dir) => {
      val tf = Tables.load(s, dir, "documents")
        .select(col("doc_id"), explode(expr("filter(" +
          "split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ')), ' '), " +
          "x -> x != '')")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      val kept = tf.withColumn("df",
          count(lit(1)).over(Window.partitionBy("w")))
        .filter(col("df") <= 100)
      val norms = kept.groupBy("doc_id")
        .agg(sum(expr("tf * tf")).as("n2"))
      val dot = kept.select(col("doc_id").as("doc_a"), col("w"),
          col("tf").as("tfa"))
        .join(kept.select(col("doc_id").as("doc_b"), col("w"),
          col("tf").as("tfb")), Seq("w"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(sum(expr("tfa * tfb")).as("dot"))
      dot
        .join(norms.select(col("doc_id").as("doc_a"), col("n2").as("na")),
          Seq("doc_a"))
        .join(norms.select(col("doc_id").as("doc_b"), col("n2").as("nb")),
          Seq("doc_b"))
        .withColumn("cos2_ppm", expr("dot * dot * 1000000 div (na * nb)"))
        .filter(col("cos2_ppm") >= 250000)
        .select("doc_a", "doc_b", "dot", "cos2_ppm")
    }),

    // ---- zone-map pruning, layout A/B: the same custkey predicate
    //      against per-file min/max stats under a custkey-clustered
    //      layout vs a date-append layout — the number that justifies
    //      re-clustering a 100-TB table. Pseudo-files are 64ths of
    //      each layout's order; stats and the prune test are the
    //      standard zone-map arithmetic ----
    "q_scan_pruning" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          expr("cast(datediff(o_orderdate, date'1970-01-01') as bigint)")
            .as("day"))
      val bounds = o.agg(min("o_custkey").as("mn"), max("o_custkey").as("mx"))
        .select(expr("mn + (mx - mn) * 4 div 10").as("lo"),
          expr("mn + (mx - mn) * 5 div 10").as("hi"))
      def layout(name: String, fileOf: org.apache.spark.sql.Column) =
        o.withColumn("file_id", fileOf)
          .groupBy("file_id")
          .agg(min("o_custkey").as("mn_ck"), max("o_custkey").as("mx_ck"))
          .crossJoin(broadcast(bounds))
          .agg(count(lit(1)).as("n_files"),
            sum(when(col("mx_ck") < col("lo") || col("mn_ck") > col("hi"),
              1L).otherwise(0L)).as("n_pruned"))
          .select(lit(name).as("layout"), col("n_files"), col("n_pruned"))
      val ckFile = ntile(64).over(Window.orderBy(col("o_custkey"),
        col("o_orderkey"))).cast("long")
      val dateFile = ntile(64).over(Window.orderBy(col("day"),
        col("o_orderkey"))).cast("long")
      layout("clustered_by_custkey", ckFile)
        .unionByName(layout("appended_by_date", dateFile))
    }),

    // ---- dictionary-encodability audit: distinct-value density per
    //      column (ndv·1e6/n) — the layout signal for dictionary vs
    //      plain encoding at write time. One pass per column, unioned ----
    "q_dict_encodability" -> ((s, dir) => {
      def card(df: DataFrame, c: String, table: String) =
        df.agg(count(lit(1)).as("n"),
            countDistinct(col(c)).as("ndv"))
          .select(lit(s"$table.$c").as("column_name"), col("n"), col("ndv"),
            expr("ndv * 1000000 div n").as("ndv_ppm"))
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      card(li, "l_returnflag", "lineitem")
        .unionByName(card(li, "l_suppkey", "lineitem"))
        .unionByName(card(li, "l_extendedprice", "lineitem"))
        .unionByName(card(o, "o_orderpriority", "orders"))
        .unionByName(card(o, "o_custkey", "orders"))
        .unionByName(card(o, "o_totalprice", "orders"))
    }),
  )

  /** DuckDB-dialect oracles. The retention CTE is split into a
    * source-specific head (anchor/persons/admits) and a shared,
    * parameterized tail — the SQL mirror of the library being generic
    * over its person/encounter source. */
  private def starHead(scanYears: Int,
      personsWhere: String = "c_custkey IS NOT NULL"): String = s"""
    WITH anchor AS (
      SELECT date_trunc('month', max(o_orderdate))::DATE AS m,
             max(o_orderdate)::DATE AS d
      FROM orders
    ),
    persons AS (
      SELECT c_custkey AS person_id, (c_custkey // 2) AS household_id
      FROM customer WHERE $personsWhere
    ),
    admits AS (
      SELECT DISTINCT p.household_id, o.o_orderdate::DATE AS admit_date
      FROM orders o JOIN persons p ON o.o_custkey = p.person_id, anchor a
      WHERE o.o_orderdate::DATE BETWEEN (a.d - INTERVAL $scanYears YEAR)::DATE AND a.d
    ),
  """

  private def eventsHead(scanYears: Int): String = s"""
    WITH anchor AS (
      SELECT date_trunc('month', max(ts))::DATE AS m, max(ts)::DATE AS d
      FROM events
    ),
    persons AS (
      SELECT DISTINCT user_id AS person_id, (user_id // 2) AS household_id
      FROM events
    ),
    admits AS (
      SELECT DISTINCT p.household_id, e.ts::DATE AS admit_date
      FROM events e JOIN persons p ON e.user_id = p.person_id, anchor a
      WHERE e.ts::DATE BETWEEN (a.d - INTERVAL $scanYears YEAR)::DATE AND a.d
    ),
  """

  private def retentionCteFor(scanYears: Int,
      personsWhere: String = "c_custkey IS NOT NULL"): String =
    starHead(scanYears, personsWhere) + retentionTail(365, 48)

  private def retentionTail(lookbackDays: Int, windowMonths: Int): String = s"""
    retained AS (
      SELECT DISTINCT household_id,
             date_trunc('month', admit_date)::DATE AS start_of_month
      FROM (SELECT household_id, admit_date,
                   lag(admit_date) OVER (PARTITION BY household_id
                                         ORDER BY admit_date) AS prev
            FROM admits) t
      WHERE prev >= admit_date - $lookbackDays
    ),
    -- scaffold universe = PERSON households (reference `all` CTE
    -- :517-524): encounter-less households still get a full spine
    households AS (SELECT DISTINCT household_id FROM persons),
    spine AS (
      SELECT unnest(generate_series((a.m - INTERVAL $windowMonths MONTH)::TIMESTAMP,
                                    a.m::TIMESTAMP, INTERVAL 1 MONTH))::DATE
               AS start_of_month
      FROM anchor a
    ),
    states AS (
      SELECT h.household_id, s.start_of_month,
             (r.household_id IS NOT NULL) AS is_retained
      FROM households h CROSS JOIN spine s
      LEFT JOIN retained r ON r.household_id = h.household_id
                          AND r.start_of_month = s.start_of_month
    ),
    islands AS (
      SELECT household_id, start_of_month, is_retained,
             sum(chg) OVER (PARTITION BY household_id ORDER BY start_of_month
                            ROWS UNBOUNDED PRECEDING) AS island
      FROM (SELECT *, CASE WHEN lag(is_retained) OVER (
                             PARTITION BY household_id
                             ORDER BY start_of_month)
                           IS NOT DISTINCT FROM is_retained
                      THEN 0 ELSE 1 END AS chg
            FROM states) x
    ),
    collapsed AS (
      SELECT household_id, is_retained AS retained,
             min(start_of_month) AS range_start,
             max(start_of_month) AS range_end
      FROM islands GROUP BY household_id, island, is_retained
    ),
    ranges AS (
      SELECT household_id, retained,
             (epoch(range_start::TIMESTAMP) * 1000)::BIGINT AS gte,
             ((epoch((range_end::TIMESTAMP + INTERVAL 1 MONTH)) - 1) * 1000)::BIGINT AS lte,
             strftime(range_start, '%Y-%m-%d') AS start_date,
             strftime(range_end::TIMESTAMP + INTERVAL 1 MONTH - INTERVAL 1 SECOND,
                      '%Y-%m-%d %H:%M:%S') AS end_date
      FROM collapsed
    ),
    phase1 AS (
      SELECT p.person_id, r.household_id, r.retained, r.gte, r.lte,
             r.start_date, r.end_date
      FROM ranges r JOIN persons p ON p.household_id = r.household_id
    ),
    phase2 AS (
      SELECT p.person_id, p.household_id, false AS retained,
             (epoch((a.m - INTERVAL 4 YEAR)::TIMESTAMP) * 1000)::BIGINT AS gte,
             (epoch((a.m + INTERVAL 10 YEAR)::TIMESTAMP) * 1000)::BIGINT AS lte,
             strftime((a.m - INTERVAL 4 YEAR)::DATE, '%Y-%m-%d') AS start_date,
             strftime((a.m + INTERVAL 10 YEAR)::TIMESTAMP,
                      '%Y-%m-%d %H:%M:%S') AS end_date
      FROM persons p CROSS JOIN anchor a
      WHERE NOT EXISTS (SELECT 1 FROM admits ad
                        WHERE ad.household_id = p.household_id)
    )
  """

  def oracleSql: Map[String, String] = Map(
    "q_retention_flagship" -> (retentionCteFor(5) + """
      SELECT person_id, household_id, retained, gte, lte, start_date, end_date FROM phase1
    """),
    "q_retention_collapsed" -> (retentionCteFor(5) + """
      SELECT household_id, retained, gte, lte, start_date, end_date FROM ranges
    """),
    "q_retention_phase2" -> (retentionCteFor(1) + """
      SELECT household_id, retained, gte, lte, start_date, end_date, person_id FROM phase2
    """),
    "q_retention_tenant" -> (retentionCteFor(5, "c_mktsegment = 'BUILDING'") + """
      SELECT person_id, household_id, retained, gte, lte, start_date, end_date FROM phase1
    """),
    "q_retention_events" -> (eventsHead(5) + retentionTail(7, 2) + """
      SELECT person_id, household_id, retained, gte, lte, start_date, end_date FROM phase1
    """),
    "q_retention_nested" -> (retentionCteFor(5) + """
      , full_hist AS (
        SELECT person_id, household_id, retained, gte, lte, start_date, end_date FROM phase1
      )
      SELECT person_id,
             string_agg(concat_ws(',', gte, lte, start_date, end_date, retained),
                        '|' ORDER BY concat_ws(',', gte, lte, start_date, end_date, retained))
               AS history
      FROM full_hist GROUP BY person_id
    """),
    "q_filter_project" -> """
      SELECT o_orderkey, o_custkey, o_orderdate::DATE AS order_date,
             o_totalprice AS price, (o_orderkey * 2 + 1) AS derived_key
      FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 100000.0
    """,
    "q_agg_sum" -> """
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
             round(avg(l_quantity), 6) AS avg_qty,
             count(*) AS count_order
      FROM lineitem WHERE l_quantity > 0
      GROUP BY l_returnflag, l_linestatus
    """,
    "q_multi_distinct" -> """
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS n_parts,
             count(DISTINCT l_suppkey) AS n_supps,
             round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY l_returnflag
    """,
    "q_join_inner" -> """
      SELECT o_orderkey, c_custkey, c_nationkey, c_mktsegment
      FROM customer JOIN orders ON c_custkey = o_custkey
    """,
    "q_join_semi" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 150000.0)
    """,
    "q_join_anti" -> """
      SELECT c_custkey, c_nationkey FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
    """,
    "q_window_rank" -> """
      SELECT o_orderkey, o_custkey,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS order_rank
      FROM orders
    """,
    "q_window_lag_lead" -> """
      SELECT o_orderkey, o_custkey,
             lag(o_totalprice, 1, 0.0) OVER w AS prev_price,
             lead(o_totalprice, 1) OVER w AS next_price,
             lag(o_orderdate::DATE, 1) OVER w AS prev_date
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "q_minmax_by" -> """
      SELECT o_custkey,
             arg_max(o_totalprice, o_orderkey) AS last_order_price,
             arg_min(o_totalprice, o_orderkey) AS first_order_price,
             count(*) AS n_orders
      FROM orders GROUP BY o_custkey
    """,
    "q_topk" -> """
      SELECT o_custkey, count(*) AS n_orders FROM orders
      GROUP BY o_custkey ORDER BY o_custkey LIMIT 100
    """,
    "q_dates_scalar" -> """
      SELECT o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d') AS d_str,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts_str,
             date_trunc('month', o_orderdate)::DATE AS month_start,
             (o_orderdate::DATE + INTERVAL 1 MONTH)::DATE AS next_month,
             o_orderdate::DATE - 365 AS lookback,
             (epoch(o_orderdate) * 1000)::BIGINT AS epoch_ms
      FROM orders
    """,
    "q_case_coalesce" -> """
      WITH oc AS (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey)
      SELECT c_custkey, coalesce(n, 0) AS n_orders,
             CASE WHEN coalesce(n, 0) > 10 THEN 'frequent' ELSE 'rare' END AS band
      FROM customer LEFT JOIN oc ON c_custkey = o_custkey
    """,
    "q_nested_collect" -> """
      SELECT o_custkey,
             string_agg(o_orderkey::VARCHAR, '|' ORDER BY o_orderkey::VARCHAR)
               AS order_keys
      FROM orders GROUP BY o_custkey
    """,
    "q_dedup_exact" -> """
      SELECT md5(text) AS text_hash, min(doc_id) AS keep_id,
             count(*) AS n_copies
      FROM documents GROUP BY md5(text)
    """,
    "q_text_stats" -> s"""
      SELECT doc_id, n_chars_measured, n_tokens, n_tokens_bpe,
             round(alpha / nullif(len, 0), 6) AS alpha_ratio,
             round(punct / nullif(len, 0), 6) AS punct_ratio,
             round(stop_hits / nullif(n_tokens * 1.0, 0), 6) AS stopword_ratio,
             round(alpha / nullif(n_tokens * 1.0, 0), 6) AS mean_token_len
      FROM (
        SELECT doc_id,
               length(text)::BIGINT AS n_chars_measured,
               length(text) * 1.0 AS len,
               (CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE len(string_split_regex(trim(text), '\\s+')) END)::BIGINT AS n_tokens,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+'))::BIGINT AS n_tokens_bpe,
               length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 AS alpha,
               length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 AS punct,
               len(list_filter($duckToks,
                   t -> list_contains([$allStopwordsSql], t))) * 1.0 AS stop_hits
        FROM documents)
    """,
    "q_lang_id" -> s"""
      SELECT doc_id, s_en, s_de, s_fr, s_es,
             CASE WHEN m > 0 AND s_en = m THEN 'en'
                  WHEN m > 0 AND s_de = m THEN 'de'
                  WHEN m > 0 AND s_fr = m THEN 'fr'
                  WHEN m > 0 AND s_es = m THEN 'es'
                  ELSE 'und' END AS lang_pred
      FROM (SELECT *, greatest(s_en, s_de, s_fr, s_es) AS m FROM (
        SELECT doc_id,
               ${langHitSql("en")} AS s_en, ${langHitSql("de")} AS s_de,
               ${langHitSql("fr")} AS s_fr, ${langHitSql("es")} AS s_es
        FROM (SELECT doc_id, $duckToks AS toks FROM documents)))
    """,
    "q_fingerprint" -> """
      SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
             min(doc_id) AS keep_id, count(*) AS n_docs
      FROM documents GROUP BY 1
    """,
    "q_dedup_ngram" -> s"""
      WITH ex AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
                 range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' ')))) AS s
        FROM (SELECT doc_id, $duckToks AS t FROM documents)
        WHERE len(t) >= 3
      ),
      sizes AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
      )
      SELECT doc_a, doc_b, jaccard FROM (
        SELECT doc_a, doc_b,
               round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
        FROM inter JOIN sizes sa ON doc_a = sa.doc_id
                   JOIN sizes sb ON doc_b = sb.doc_id)
      WHERE jaccard >= 0.8
    """,
    "q_dedup_minhash_lsh" -> s"""
      WITH $minhashLshCtes
      SELECT doc_a, doc_b FROM lsh_pairs
    """,
    "q_dedup_clusters" -> s"""
      WITH RECURSIVE $minhashLshCtes,
      sym AS (SELECT doc_a AS u, doc_b AS v FROM lsh_pairs
              UNION SELECT doc_b, doc_a FROM lsh_pairs),
      reach(a, b) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.a, s.v FROM reach r JOIN sym s ON r.b = s.u
      )
      SELECT a AS node, min(b) AS component FROM reach GROUP BY a
    """,
    // chaining ALL consecutive orderkeys inside a bucket makes the
    // whole bucket one path, so the component label is just the
    // bucket's min orderkey — no recursion needed oracle-side
    "q_cc_path" -> """
      SELECT o_orderkey AS node,
             min(o_orderkey) OVER (PARTITION BY o_orderkey // 4096)
               AS component
      FROM orders WHERE o_orderkey < 60000
    """,
    "q_split_leakfree" -> s"""
      WITH RECURSIVE $minhashLshCtes,
      sym AS (SELECT doc_a AS u, doc_b AS v FROM lsh_pairs
              UNION SELECT doc_b, doc_a FROM lsh_pairs),
      reach(a, b) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.a, s.v FROM reach r JOIN sym s ON r.b = s.u
      ),
      comp AS (SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a)
      SELECT d.doc_id, d.lang, c.component,
             CASE WHEN c.component % 100 < 80 THEN 'train'
                  WHEN c.component % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents d JOIN comp c USING (doc_id)
    """,
    "q_stratified_sample" -> """
      SELECT doc_id, lang FROM documents
      WHERE (doc_id * 2654435761) % 1000000 <
            CASE lang WHEN 'en' THEN 750000 WHEN 'de' THEN 500000
                      WHEN 'fr' THEN 250000 WHEN 'es' THEN 125000
                      ELSE 100000 END
    """,
    "q_pack_sequences" -> """
      WITH t AS (
        SELECT source, doc_id,
               (CASE WHEN trim(text) = '' THEN 0
                     ELSE len(string_split_regex(trim(text), '\s+'))
                END)::BIGINT AS tok
        FROM documents),
      c AS (SELECT source, tok,
                   coalesce(sum(tok) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0)::BIGINT AS cum
            FROM t)
      SELECT source, cum // 2048 AS bin, count(*) AS n_docs,
             (sum(tok))::BIGINT AS n_tokens
      FROM c GROUP BY 1, 2
    """,
    "q_band_signatures" -> s"""
      WITH $minhashLshCtes
      SELECT doc_id, band, sig FROM band
    """,
    "q_embed_quant" -> """
      WITH s AS (SELECT vec_id, embedding,
                        CAST(list_max(list_transform(embedding, x -> abs(x)))
                             AS DOUBLE) AS s
                 FROM embeddings),
      q AS (SELECT vec_id,
                   CASE WHEN s = 0 THEN list_transform(embedding, x -> 0::BIGINT)
                        ELSE list_transform(embedding,
                          x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / s + 0.5)
                                    AS BIGINT))
                   END AS q
            FROM s)
      SELECT vec_id,
             (list_sum(q))::BIGINT AS q_sum,
             (list_sum(list_transform(q, x -> abs(x))))::BIGINT AS q_abs_sum,
             (list_min(q))::BIGINT AS q_min,
             (list_max(q))::BIGINT AS q_max
      FROM q
    """,
    "q_heavy_hitters" -> """
      SELECT lang AS token, count(*)::BIGINT AS est
      FROM documents GROUP BY 1
    """,
    "q_chunk_passages" -> """
      WITH d AS (SELECT doc_id,
                   list_filter(string_split_regex(trim(text), '\s+'),
                               x -> x <> '') AS t
                 FROM documents),
      s AS (SELECT doc_id, t, len(t) AS n,
                   unnest(range(0, greatest(len(t), 1), 12)) AS start
            FROM d)
      SELECT doc_id, (start // 12)::INTEGER AS chunk_idx,
             start::INTEGER AS start_tok,
             least(24, n - start)::BIGINT AS n_chunk_tokens,
             array_to_string(t[start + 1 : start + 24], ' ') AS passage
      FROM s WHERE start < n
    """,
    "q_decontaminate" -> s"""
      WITH d AS (SELECT doc_id, $duckToks AS t FROM documents),
      b AS (SELECT array_to_string(t[1:6], ' ') AS snippet
            FROM d WHERE doc_id % 50 = 0),
      bt AS (SELECT string_split(snippet, ' ') AS t FROM b),
      bg AS (SELECT DISTINCT ('0x' || substr(md5(g), 1, 15))::BIGINT AS gh
             FROM (SELECT unnest(list_distinct(list_transform(
                     range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' ')))) AS g
                   FROM bt WHERE len(t) >= 3)),
      dg AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS gh
             FROM (SELECT doc_id, unnest(list_distinct(list_transform(
                     range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' ')))) AS g
                   FROM d WHERE len(t) >= 3)),
      hits AS (SELECT doc_id, count(*) AS n_hit
               FROM dg JOIN bg USING (gh) GROUP BY doc_id)
      SELECT doc.doc_id,
             (coalesce(h.n_hit, 0))::BIGINT AS n_hit_grams,
             coalesce(h.n_hit, 0) > 0 AS contaminated
      FROM documents doc LEFT JOIN hits h USING (doc_id)
    """,
    "q_mixture_alloc" -> """
      WITH c AS (SELECT lang AS stratum, count(*) AS n_obs
                 FROM documents GROUP BY 1),
      f AS (SELECT * FROM (
              SELECT stratum, n_obs,
                     CASE stratum WHEN 'en' THEN 400000 WHEN 'de' THEN 300000
                                  WHEN 'fr' THEN 200000 WHEN 'es' THEN 100000
                                  ELSE 0 END AS w_ppm
              FROM c) WHERE w_ppm > 0),
      t AS (SELECT min(n_obs * 1000000 // w_ppm) AS t_max FROM f)
      SELECT stratum, n_obs::BIGINT AS n_obs, w_ppm::BIGINT AS w_ppm,
             (t.t_max * w_ppm // 1000000)::BIGINT AS target_n,
             ((t.t_max * w_ppm // 1000000) * 1000000 // n_obs)::BIGINT AS rate_ppm
      FROM f, t
    """,
    "q_mixture_sample" -> """
      WITH c AS (SELECT lang AS stratum, count(*) AS n_obs
                 FROM documents GROUP BY 1),
      f AS (SELECT * FROM (
              SELECT stratum, n_obs,
                     CASE stratum WHEN 'en' THEN 400000 WHEN 'de' THEN 300000
                                  WHEN 'fr' THEN 200000 WHEN 'es' THEN 100000
                                  ELSE 0 END AS w_ppm
              FROM c) WHERE w_ppm > 0),
      t AS (SELECT min(n_obs * 1000000 // w_ppm) AS t_max FROM f),
      r AS (SELECT stratum,
                   ((t.t_max * w_ppm // 1000000) * 1000000 // n_obs) AS rate_ppm
            FROM f, t)
      SELECT d.doc_id, d.lang
      FROM documents d JOIN r ON d.lang = r.stratum
      WHERE (d.doc_id * 2654435761) % 1000000 < r.rate_ppm
    """,
    "q_shard_shuffle" -> """
      WITH a AS (SELECT doc_id,
                   ('0x' || substr(md5(doc_id::VARCHAR || ':v1'), 1, 15))::BIGINT
                     AS sort_key
                 FROM documents),
      s AS (SELECT doc_id, sort_key, (sort_key % 8)::INTEGER AS shard FROM a)
      SELECT shard, count(*)::BIGINT AS n_docs, min(sort_key) AS min_key,
             max(sort_key) AS max_key, min_by(doc_id, sort_key) AS first_doc
      FROM s GROUP BY shard
    """,
    "q_pii_redact" -> """
      WITH p AS (
        SELECT doc_id,
               concat(text, ' contact user', doc_id, '@example.com call ',
                      '415-555-', lpad((doc_id % 10000)::VARCHAR, 4, '0'),
                      ' ssn 078-05-',
                      lpad(((doc_id * 7) % 10000)::VARCHAR, 4, '0'),
                      ' ip 10.0.', (doc_id % 256)::VARCHAR, '.',
                      ((doc_id * 3) % 256)::VARCHAR) AS text_pii
        FROM documents)
      SELECT doc_id,
             len(regexp_extract_all(text_pii,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_email,
             len(regexp_extract_all(text_pii,
               '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b'))::BIGINT AS n_ssn,
             len(regexp_extract_all(text_pii,
               '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b'))::BIGINT AS n_phone,
             len(regexp_extract_all(text_pii,
               '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b'))::BIGINT AS n_ip,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               text_pii,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b', '[SSN]', 'g'),
               '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b', '[PHONE]', 'g'),
               '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '[IP]', 'g') AS redacted
      FROM p
    """,
    "q_tfidf_topk" -> s"""
      WITH tf AS (
        SELECT doc_id, token, count(*) AS tf
        FROM (SELECT doc_id, unnest(list_filter($duckToks, x -> x <> ''))
                AS token FROM documents)
        GROUP BY doc_id, token
      ),
      stats AS (SELECT doc_id, token, tf,
                       count(*) OVER (PARTITION BY token) AS df
                FROM tf),
      scored AS (SELECT *, (tf * 1000000) // df AS score_micro,
                        row_number() OVER (PARTITION BY doc_id
                          ORDER BY (tf * 1000000) // df DESC, token) AS rank
                 FROM stats)
      SELECT doc_id, token, tf, df, score_micro, rank
      FROM scored WHERE rank <= 3
    """,
    "q_explode_pos" -> s"""
      SELECT doc_id, u.pos, u.tok AS token FROM (
        SELECT doc_id, unnest(list_transform(range(len(t)),
                 i -> {'pos': i, 'tok': t[i+1]})) AS u
        FROM (SELECT doc_id, list_filter($duckToks, x -> x <> '') AS t
              FROM documents))
    """,
    "q_dedup_simhash" -> s"""
      WITH toksd AS (SELECT doc_id, $duckToks AS t FROM documents),
      hs AS (SELECT doc_id, list_transform(t,
               s -> ('0x' || substr(md5(s), 1, 15))::BIGINT) AS hl FROM toksd),
      sims AS (SELECT doc_id,
        list_sum(list_transform(range(60), i ->
          CASE WHEN list_sum(list_transform(hl,
                 h -> CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END)) > 0
               THEN (1::BIGINT << i) ELSE 0 END))::BIGINT AS sim
        FROM hs),
      bands AS (SELECT doc_id, sim, b, (sim >> (b * 15)) & 32767 AS bv
                FROM sims, range(4) t(b))
      SELECT doc_a, doc_b, hamming FROM (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               bit_count(xor(a.sim, b.sim))::INT AS hamming
        FROM bands a JOIN bands b ON a.b = b.b AND a.bv = b.bv
                                 AND a.doc_id < b.doc_id)
      WHERE hamming <= 12
    """,
    "q_sim_cosine_topk" -> s"""
      WITH q AS (SELECT vec_id AS query_id, embedding AS qe
                 FROM embeddings WHERE vec_id < 5),
      scored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
               ${duckCos("qe", "e.embedding")} AS cos
        FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id)
      SELECT query_id, neighbor_id, cos, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored)
      WHERE rank <= 10
    """,
    "q_sim_quant_topk" -> s"""
      WITH sc AS (SELECT vec_id,
                    CAST(list_max(list_transform(embedding, x -> abs(x)))
                         AS DOUBLE) AS s
                  FROM embeddings),
      qv AS (SELECT e.vec_id,
               CASE WHEN sc.s = 0
                    THEN list_transform(e.embedding, x -> 0.0)
                    ELSE list_transform(e.embedding,
                      x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / sc.s + 0.5)
                                AS DOUBLE))
               END AS embedding
             FROM embeddings e JOIN sc USING (vec_id)),
      q AS (SELECT vec_id AS query_id, embedding AS qe
            FROM qv WHERE vec_id < 5),
      scored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
               ${duckCos("qe", "e.embedding")} AS cos
        FROM q CROSS JOIN qv e WHERE e.vec_id <> q.query_id)
      SELECT query_id, neighbor_id, cos, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored)
      WHERE rank <= 10
    """,
    "q_dedup_embedding" -> s"""
      SELECT vec_a, vec_b, cos FROM (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
               ${duckCos("a.embedding", "b.embedding")} AS cos
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id)
      WHERE cos >= 0.4
    """,

    "q_mmr_rerank" -> s"""
      WITH sc AS (SELECT vec_id,
                    CAST(list_max(list_transform(embedding, x -> abs(x)))
                         AS DOUBLE) AS s
                  FROM embeddings),
      qv AS (SELECT e.vec_id,
               CASE WHEN sc.s = 0
                    THEN list_transform(e.embedding, x -> 0.0)
                    ELSE list_transform(e.embedding,
                      x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / sc.s + 0.5)
                                AS DOUBLE))
               END AS embedding
             FROM embeddings e JOIN sc USING (vec_id)),
      q0 AS (SELECT embedding AS qe FROM qv WHERE vec_id = 0),
      cand AS (SELECT vec_id, embedding,
                      ${duckIDot("embedding", "qe")} AS rel
               FROM qv CROSS JOIN q0 WHERE vec_id <> 0
               ORDER BY rel DESC, vec_id LIMIT 20),
      pairs AS (SELECT a.vec_id AS a, b.vec_id AS b,
                       ${duckIDot("a.embedding", "b.embedding")} AS sim
                FROM cand a CROSS JOIN cand b WHERE a.vec_id <> b.vec_id),
      s1 AS (SELECT vec_id, rel, 0::BIGINT AS redundancy, 1::BIGINT AS rank
             FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
      sel1 AS (SELECT * FROM s1),
      r2 AS (SELECT p.a AS vec_id, max(p.sim)::BIGINT AS red
             FROM pairs p JOIN sel1 s ON p.b = s.vec_id GROUP BY 1),
      s2 AS (SELECT c.vec_id, c.rel, r2.red AS redundancy, 2::BIGINT AS rank
             FROM cand c JOIN r2 USING (vec_id)
             WHERE c.vec_id NOT IN (SELECT vec_id FROM sel1)
             ORDER BY c.rel - r2.red DESC, c.vec_id LIMIT 1),
      sel2 AS (SELECT * FROM sel1 UNION ALL SELECT * FROM s2),
      r3 AS (SELECT p.a AS vec_id, max(p.sim)::BIGINT AS red
             FROM pairs p JOIN sel2 s ON p.b = s.vec_id GROUP BY 1),
      s3 AS (SELECT c.vec_id, c.rel, r3.red AS redundancy, 3::BIGINT AS rank
             FROM cand c JOIN r3 USING (vec_id)
             WHERE c.vec_id NOT IN (SELECT vec_id FROM sel2)
             ORDER BY c.rel - r3.red DESC, c.vec_id LIMIT 1),
      sel3 AS (SELECT * FROM sel2 UNION ALL SELECT * FROM s3),
      r4 AS (SELECT p.a AS vec_id, max(p.sim)::BIGINT AS red
             FROM pairs p JOIN sel3 s ON p.b = s.vec_id GROUP BY 1),
      s4 AS (SELECT c.vec_id, c.rel, r4.red AS redundancy, 4::BIGINT AS rank
             FROM cand c JOIN r4 USING (vec_id)
             WHERE c.vec_id NOT IN (SELECT vec_id FROM sel3)
             ORDER BY c.rel - r4.red DESC, c.vec_id LIMIT 1),
      sel4 AS (SELECT * FROM sel3 UNION ALL SELECT * FROM s4),
      r5 AS (SELECT p.a AS vec_id, max(p.sim)::BIGINT AS red
             FROM pairs p JOIN sel4 s ON p.b = s.vec_id GROUP BY 1),
      s5 AS (SELECT c.vec_id, c.rel, r5.red AS redundancy, 5::BIGINT AS rank
             FROM cand c JOIN r5 USING (vec_id)
             WHERE c.vec_id NOT IN (SELECT vec_id FROM sel4)
             ORDER BY c.rel - r5.red DESC, c.vec_id LIMIT 1),
      sel5 AS (SELECT * FROM sel4 UNION ALL SELECT * FROM s5)
      SELECT rank, vec_id, rel, redundancy FROM sel5
    """,
    "q_semantic_dedup" -> s"""
      WITH RECURSIVE pairs AS (
        SELECT vec_a, vec_b FROM (
          SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                 ${duckCos("a.embedding", "b.embedding")} AS cos
          FROM embeddings a JOIN embeddings b
            ON a.label = b.label AND a.vec_id < b.vec_id)
        WHERE cos >= 0.4),
      sym AS (SELECT vec_a AS u, vec_b AS v FROM pairs
              UNION SELECT vec_b, vec_a FROM pairs),
      reach(a, b) AS (
        SELECT vec_id, vec_id FROM embeddings
        UNION
        SELECT r.a, s.v FROM reach r JOIN sym s ON r.b = s.u),
      comp AS (SELECT a AS vec_id, min(b) AS component FROM reach GROUP BY a)
      SELECT e.vec_id, e.label
      FROM embeddings e JOIN comp c USING (vec_id)
      WHERE c.component = e.vec_id
    """,
    "q_sim_ann_ivf" -> s"""
      WITH cent AS (
        SELECT label, list(c ORDER BY i) AS centroid FROM (
          SELECT label, i, round(avg(embedding[i]::DOUBLE), 9) AS c
          FROM embeddings, range(1, 65) t(i) GROUP BY label, i)
        GROUP BY label),
      q AS (SELECT vec_id AS query_id, embedding AS qe
            FROM embeddings WHERE vec_id < 5),
      probe AS (
        SELECT query_id, qe, label FROM (
          SELECT query_id, qe, label,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY ccos DESC, label) AS crank
          FROM (SELECT query_id, qe, c.label,
                       ${duckCos("qe", "centroid")} AS ccos
                FROM q CROSS JOIN cent c))
        WHERE crank <= 2),
      scored AS (
        SELECT query_id, e.vec_id AS neighbor_id,
               ${duckCos("qe", "e.embedding")} AS cos
        FROM probe p JOIN embeddings e ON e.label = p.label
        WHERE e.vec_id <> p.query_id)
      SELECT query_id, neighbor_id, cos, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored)
      WHERE rank <= 5
    """,
    "q_sim_lsh_buckets" -> """
      WITH pl AS (
        SELECT p, d,
               ((('0x' || substr(md5(p::VARCHAR || '_' || d::VARCHAR), 1, 15))::BIGINT
                 % 2001) - 1000) AS w
        FROM range(64) t(p), range(64) s(d)
      ),
      q AS (
        SELECT vec_id, d, round(embedding[d + 1]::DOUBLE * 1000)::BIGINT AS q
        FROM embeddings, range(64) s(d)
      ),
      dots AS (
        SELECT vec_id, p, sum(q.q * pl.w) AS dot
        FROM q JOIN pl ON q.d = pl.d GROUP BY vec_id, p
      ),
      bits AS (
        SELECT vec_id, p // 16 AS band, p,
               CASE WHEN dot > 0 THEN 1 ELSE 0 END AS bit
        FROM dots
      )
      SELECT vec_id, band,
             sum(bit << (p % 16))::BIGINT AS bucket
      FROM bits GROUP BY vec_id, band
    """,
    "q_repetition" -> s"""
      WITH g AS (
        SELECT doc_id, unnest(list_transform(range(1, len(t)),
                 i -> array_to_string(t[i:i+1], ' '))) AS bigram
        FROM (SELECT doc_id, $duckToks AS t FROM documents)
        WHERE len(t) >= 2
      ),
      c AS (SELECT doc_id, bigram, count(*) AS c FROM g GROUP BY 1, 2)
      SELECT doc_id, (sum(c))::BIGINT AS n_bigrams, max(c) AS max_bigram_count,
             ((max(c) * 1000000) // sum(c))::BIGINT AS ratio_micro
      FROM c GROUP BY doc_id
    """,
    // The q_media_* family reads the SAME parquet fixture the Spark
    // side materializes (Multimodal.CorpusPath) and re-derives the
    // decode results from the payload bytes: hex(bytes) → a byte list
    // via strpos over the hex alphabet (integer-exact in both
    // engines), then fixed-offset BMP/WAV header+sample arithmetic.
    // `bl` is the 1-based byte list: byte at 0-based offset o = bl[o+1].
    "q_media_decode" -> s"""
      WITH m AS (
        SELECT media_id, kind, format, width AS meta_w, height AS meta_h,
               octet_length(bytes)::BIGINT AS n_bytes, hex(bytes) AS h
        FROM read_parquet('${graft.multimodal.Multimodal.CorpusPath}/*.parquet')
      ),
      b AS (
        SELECT *, list_transform(range(n_bytes), i ->
            (strpos('0123456789ABCDEF', h[(i*2+1)::INT]) - 1) * 16
          + (strpos('0123456789ABCDEF', h[(i*2+2)::INT]) - 1)) AS bl
        FROM m
      ),
      p AS (
        SELECT media_id, kind, format, n_bytes, meta_w, meta_h,
               -- BMP: width i32le@18, height i32le@22 (small positives);
               -- frame size u32le@2; WAV: rate u32le@24, dataLen u32le@40
               CASE WHEN kind = 'audio' THEN 0
                    ELSE bl[19] + 256*bl[20] + 65536*bl[21]
                         + 16777216*bl[22] END AS width,
               CASE WHEN kind = 'audio' THEN 0
                    ELSE bl[23] + 256*bl[24] + 65536*bl[25]
                         + 16777216*bl[26] END AS height,
               CASE WHEN kind = 'audio' THEN 0
                    WHEN kind = 'image' THEN 1
                    ELSE n_bytes // (bl[3] + 256*bl[4] + 65536*bl[5]
                                     + 16777216*bl[6]) END AS n_frames,
               CASE WHEN kind = 'audio'
                    THEN bl[25] + 256*bl[26] + 65536*bl[27]
                         + 16777216*bl[28] ELSE 0 END AS sample_rate,
               CASE WHEN kind = 'audio'
                    THEN (bl[41] + 256*bl[42] + 65536*bl[43]
                          + 16777216*bl[44]) // 2 ELSE 0 END AS n_samples
        FROM b
      )
      SELECT media_id, kind, format, n_bytes,
             width::BIGINT AS width, height::BIGINT AS height,
             n_frames::BIGINT AS n_frames,
             sample_rate::BIGINT AS sample_rate,
             n_samples::BIGINT AS n_samples,
             (CASE WHEN kind = 'audio' THEN meta_w = 0 AND meta_h = 0
                   ELSE width = meta_w AND height = meta_h
              END)::BIGINT AS meta_ok
      FROM p
    """,
    "q_media_image_stats" -> s"""
      WITH m AS (
        SELECT media_id, octet_length(bytes)::BIGINT AS n_bytes,
               hex(bytes) AS h
        FROM read_parquet('${graft.multimodal.Multimodal.CorpusPath}/*.parquet')
        WHERE kind = 'image'
      ),
      b AS (
        SELECT media_id, list_transform(range(n_bytes), i ->
            (strpos('0123456789ABCDEF', h[(i*2+1)::INT]) - 1) * 16
          + (strpos('0123456789ABCDEF', h[(i*2+2)::INT]) - 1)) AS bl
        FROM m
      ),
      d AS (
        SELECT media_id, bl,
               bl[19] + 256*bl[20] AS w, bl[23] + 256*bl[24] AS h,
               bl[11] + 256*bl[12] AS dataoff
        FROM b
      ),
      -- per-pixel walk over file rows (orientation-free for sums);
      -- stride pads each row to 4 bytes: B at +0, G at +1, R at +2
      px AS (
        SELECT media_id, w, h,
               bl[dataoff + (p // w) * (((w*3 + 3) // 4) * 4)
                  + (p % w) * 3 + 3] AS r_,
               bl[dataoff + (p // w) * (((w*3 + 3) // 4) * 4)
                  + (p % w) * 3 + 2] AS g_,
               bl[dataoff + (p // w) * (((w*3 + 3) // 4) * 4)
                  + (p % w) * 3 + 1] AS b_
        FROM (SELECT media_id, w, h, dataoff, bl,
                     unnest(range(w * h)) AS p FROM d)
      )
      SELECT media_id, w::BIGINT AS width, h::BIGINT AS height,
             (w * h)::BIGINT AS n_px,
             sum(r_)::BIGINT AS sum_r, sum(g_)::BIGINT AS sum_g,
             sum(b_)::BIGINT AS sum_b,
             ((299 * sum(r_) + 587 * sum(g_) + 114 * sum(b_))
               // (w * h))::BIGINT AS mean_luma_milli
      FROM px GROUP BY media_id, w, h
    """,
    "q_media_audio_stats" -> s"""
      WITH m AS (
        SELECT media_id, octet_length(bytes)::BIGINT AS n_bytes,
               hex(bytes) AS h
        FROM read_parquet('${graft.multimodal.Multimodal.CorpusPath}/*.parquet')
        WHERE kind = 'audio'
      ),
      b AS (
        SELECT media_id, list_transform(range(n_bytes), i ->
            (strpos('0123456789ABCDEF', h[(i*2+1)::INT]) - 1) * 16
          + (strpos('0123456789ABCDEF', h[(i*2+2)::INT]) - 1)) AS bl
        FROM m
      ),
      d AS (
        SELECT media_id, bl,
               bl[25] + 256*bl[26] + 65536*bl[27] + 16777216*bl[28] AS rate,
               (bl[41] + 256*bl[42] + 65536*bl[43] + 16777216*bl[44]) // 2
                 AS ns
        FROM b
      ),
      -- i16le sample i at data offset 44: raw = b0 + 256·b1, sign-adjust
      sv AS (
        SELECT media_id, rate, ns, i,
               CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS s,
               CASE WHEN praw >= 32768 THEN praw - 65536 ELSE praw END AS ps
        FROM (SELECT media_id, rate, ns, i,
                     bl[45 + i*2] + 256*bl[46 + i*2] AS raw,
                     bl[43 + i*2] + 256*bl[44 + i*2] AS praw
              FROM (SELECT media_id, rate, ns, bl, unnest(range(ns)) AS i
                    FROM d))
      )
      SELECT media_id, rate::BIGINT AS sample_rate, ns::BIGINT AS n_samples,
             sum(s)::BIGINT AS sum_s, sum(abs(s))::BIGINT AS sum_abs,
             sum(s * s)::BIGINT AS energy, max(abs(s))::BIGINT AS peak_abs,
             count(*) FILTER (i > 0 AND (s >= 0) <> (ps >= 0))::BIGINT
               AS zero_cross
      FROM sv GROUP BY media_id, rate, ns
    """,
    "q_media_frames" -> s"""
      WITH m AS (
        SELECT media_id, octet_length(bytes)::BIGINT AS n_bytes,
               hex(bytes) AS h
        FROM read_parquet('${graft.multimodal.Multimodal.CorpusPath}/*.parquet')
        WHERE kind = 'video'
      ),
      b AS (
        SELECT media_id, n_bytes, list_transform(range(n_bytes), i ->
            (strpos('0123456789ABCDEF', h[(i*2+1)::INT]) - 1) * 16
          + (strpos('0123456789ABCDEF', h[(i*2+2)::INT]) - 1)) AS bl
        FROM m
      ),
      d AS (
        SELECT media_id, bl,
               bl[3] + 256*bl[4] + 65536*bl[5] + 16777216*bl[6] AS fsize,
               bl[19] + 256*bl[20] AS w, bl[23] + 256*bl[24] AS h,
               bl[11] + 256*bl[12] AS dataoff,
               n_bytes // (bl[3] + 256*bl[4] + 65536*bl[5]
                           + 16777216*bl[6]) AS nf
        FROM b
      ),
      px AS (
        SELECT media_id, f, w, h,
               bl[f * fsize + dataoff + (p // w) * (((w*3 + 3) // 4) * 4)
                  + (p % w) * 3 + 3] AS r_,
               bl[f * fsize + dataoff + (p // w) * (((w*3 + 3) // 4) * 4)
                  + (p % w) * 3 + 2] AS g_,
               bl[f * fsize + dataoff + (p // w) * (((w*3 + 3) // 4) * 4)
                  + (p % w) * 3 + 1] AS b_
        FROM (SELECT media_id, w, h, fsize, dataoff, bl, f,
                     unnest(range(w * h)) AS p
              FROM (SELECT media_id, w, h, fsize, dataoff, bl,
                           unnest(range(nf)) AS f FROM d))
      )
      SELECT media_id, f::BIGINT AS frame_idx,
             w::BIGINT AS width, h::BIGINT AS height,
             sum(r_)::BIGINT AS sum_r, sum(g_)::BIGINT AS sum_g,
             sum(b_)::BIGINT AS sum_b
      FROM px GROUP BY media_id, f, w, h
    """,
    // nearest-neighbor 8×8: dest (x,y) samples source pixel
    // (x·w div 8, y·h div 8) in TOP-DOWN coordinates; BMP stores rows
    // bottom-up, so source row sy maps to file row h−1−sy
    "q_media_resize" -> s"""
      WITH m AS (
        SELECT media_id, octet_length(bytes)::BIGINT AS n_bytes,
               hex(bytes) AS h
        FROM read_parquet('${graft.multimodal.Multimodal.CorpusPath}/*.parquet')
        WHERE kind = 'image'
      ),
      b AS (
        SELECT media_id, list_transform(range(n_bytes), i ->
            (strpos('0123456789ABCDEF', h[(i*2+1)::INT]) - 1) * 16
          + (strpos('0123456789ABCDEF', h[(i*2+2)::INT]) - 1)) AS bl
        FROM m
      ),
      d AS (
        SELECT media_id, bl,
               bl[19] + 256*bl[20] AS w, bl[23] + 256*bl[24] AS h,
               bl[11] + 256*bl[12] AS dataoff
        FROM b
      ),
      px AS (
        SELECT media_id,
               bl[dataoff + (h - 1 - ((p // 8) * h // 8))
                    * (((w*3 + 3) // 4) * 4)
                  + ((p % 8) * w // 8) * 3 + 3] AS r_,
               bl[dataoff + (h - 1 - ((p // 8) * h // 8))
                    * (((w*3 + 3) // 4) * 4)
                  + ((p % 8) * w // 8) * 3 + 2] AS g_,
               bl[dataoff + (h - 1 - ((p // 8) * h // 8))
                    * (((w*3 + 3) // 4) * 4)
                  + ((p % 8) * w // 8) * 3 + 1] AS b_
        FROM (SELECT media_id, w, h, dataoff, bl,
                     unnest(range(64)) AS p FROM d)
      )
      SELECT media_id, sum(r_)::BIGINT AS sum_r,
             sum(g_)::BIGINT AS sum_g, sum(b_)::BIGINT AS sum_b
      FROM px GROUP BY media_id
    """,
    "q_chunk_dedup" -> s"""
      WITH ch AS (
        SELECT doc_id, md5(c) AS h FROM (
          SELECT doc_id, unnest(list_transform(range((len(t) + 7) // 8),
                   i -> array_to_string(t[i*8+1:i*8+8], ' '))) AS c
          FROM (SELECT doc_id, $duckToks AS t FROM documents)
          WHERE len(t) > 0 AND t[1] <> '')
      ),
      g AS (SELECT doc_id, count(*) OVER (PARTITION BY h) AS cnt FROM ch)
      SELECT doc_id, count(*) AS n_chunks,
             count(*) FILTER (cnt > 1) AS n_dup_chunks
      FROM g GROUP BY doc_id
    """,
    "q_crossdoc_dup" -> s"""
      WITH d AS (SELECT doc_id, $duckToks AS t FROM documents),
      dg AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS gh
             FROM (SELECT doc_id, unnest(list_distinct(list_transform(
                     range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' ')))) AS g
                   FROM d WHERE len(t) >= 3)),
      x AS (SELECT doc_id, count(*) AS n_grams,
                   count(*) FILTER (df > 1) AS n_shared
            FROM (SELECT doc_id,
                         count(*) OVER (PARTITION BY gh) AS df FROM dg)
            GROUP BY doc_id)
      SELECT doc.doc_id,
             coalesce(n_grams, 0)::BIGINT AS n_grams,
             coalesce(n_shared, 0)::BIGINT AS n_shared_grams,
             coalesce(n_shared * 1000000 // n_grams, 0)::BIGINT AS shared_ppm
      FROM documents doc LEFT JOIN x USING (doc_id)
    """,
    "q_percentile" -> """
      SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
             round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
             round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag
    """,
    "q_collection_funcs" -> s"""
      SELECT doc_id,
             coalesce(array_to_string(list_sort(list_intersect(toks,
               ['the', 'a', 'table', 'value', 'row'])), ','), '')
               AS common_toks,
             len(toks) AS n_distinct_toks,
             array_to_string(list_sort(toks)[1:3], ',') AS first3,
             map(['len'], [length(text)::BIGINT])['len'][1] AS len_via_map,
             ({'id': doc_id, 'n': length(text)}).n AS len_via_struct
      FROM (SELECT doc_id, text, list_distinct($duckToks) AS toks
            FROM documents)
    """,
    "q_curation" -> s"""
      WITH RECURSIVE gated AS (
        SELECT doc_id, text, n_tokens FROM (
          SELECT doc_id, text, n_tokens,
                 greatest(s_en, s_de, s_fr, s_es) AS m,
                 s_en, s_de, s_fr, s_es
          FROM (SELECT doc_id, text,
                  (CASE WHEN length(trim(text)) = 0 THEN 0
                        ELSE len(string_split_regex(trim(text), '\\s+'))
                   END)::BIGINT AS n_tokens,
                  ${langHitSql("en")} AS s_en, ${langHitSql("de")} AS s_de,
                  ${langHitSql("fr")} AS s_fr, ${langHitSql("es")} AS s_es
                FROM (SELECT doc_id, text, $duckToks AS toks FROM documents)))
        WHERE n_tokens >= 5
          AND length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 2
              >= length(text)
          AND m > 0 AND s_en = m
      ),
      exact AS (
        SELECT doc_id, text, n_tokens FROM (
          SELECT *, min(doc_id) OVER (PARTITION BY
            md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))))
            AS keep
          FROM gated)
        WHERE doc_id = keep
      ),
      ${minhashLshCtesFor("exact")},
      sym AS (SELECT doc_a AS u, doc_b AS v FROM lsh_pairs
              UNION SELECT doc_b, doc_a FROM lsh_pairs),
      reach(a, b) AS (
        SELECT doc_id, doc_id FROM exact
        UNION
        SELECT r.a, s.v FROM reach r JOIN sym s ON r.b = s.u
      ),
      comp AS (SELECT a AS doc_id, min(b) AS component FROM reach GROUP BY a)
      SELECT e.doc_id, e.n_tokens
      FROM exact e JOIN comp c ON e.doc_id = c.doc_id
      WHERE c.component = e.doc_id
    """,
    "q_embed_norm" -> """
      SELECT vec_id, len(embedding)::INT AS dim,
             round(sqrt(list_sum(list_transform(range(1, 65),
               i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))), 6)
               AS l2_norm
      FROM embeddings
    """,
    "q_join_full_outer" -> """
      WITH big AS (SELECT c_custkey, c_acctbal FROM customer
                   WHERE c_acctbal > 7000.0),
      active AS (SELECT o_custkey, count(*) AS n_orders FROM orders
                 GROUP BY o_custkey HAVING count(*) >= 20)
      SELECT coalesce(c_custkey, o_custkey) AS custkey, c_acctbal, n_orders
      FROM big FULL JOIN active ON c_custkey = o_custkey
    """,
    "q_events_window" -> """
      SELECT user_id, ts::DATE AS day, event_type, count(*) AS n_events,
             round(sum(value), 6) AS sum_value
      FROM events GROUP BY 1, 2, 3
    """,
    "q_attribution" -> """
      WITH e AS (SELECT event_id, user_id, event_type,
                        epoch_ns(ts) // 1000 AS us
                 FROM events)
      SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
             (p.us - c.us) AS gap_us
      FROM e c JOIN e p
        ON c.user_id = p.user_id
       AND c.event_type = 'click' AND p.event_type = 'purchase'
       AND p.us >= c.us AND p.us <= c.us + 86400000000
    """,
    "q_events_sessionize" -> """
      WITH e AS (SELECT user_id, event_id, epoch_ns(ts) AS ts_ns FROM events),
      x AS (SELECT user_id, event_id, ts_ns,
                   CASE WHEN prev IS NULL OR ts_ns - prev > 1800000000000
                        THEN 1 ELSE 0 END AS new_s
            FROM (SELECT user_id, event_id, ts_ns,
                         lag(ts_ns) OVER (PARTITION BY user_id
                           ORDER BY ts_ns, event_id) AS prev FROM e)),
      y AS (SELECT user_id, ts_ns,
                   sum(new_s) OVER (PARTITION BY user_id
                     ORDER BY ts_ns, event_id
                     ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
            FROM x)
      SELECT user_id, session_id, count(*) AS n_events,
             min(ts_ns) AS start_ns, max(ts_ns) AS end_ns
      FROM y GROUP BY 1, 2
    """,
    "q_session_window" -> """
      WITH x AS (
        SELECT user_id, ts,
               -- >= : an event exactly gap after the previous one opens
               -- a NEW Spark session window ([start, last+gap) is
               -- half-open), unlike the q_events_sessionize contract
               -- which merges at-gap events
               CASE WHEN prev IS NULL
                         OR epoch_ns(ts) - epoch_ns(prev) >= 1800000000000
                    THEN 1 ELSE 0 END AS new_s
        FROM (SELECT user_id, ts,
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
              FROM events)),
      y AS (SELECT user_id, ts,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
            FROM x)
      SELECT user_id, min(ts) AS s_start,
             max(ts) + INTERVAL 30 MINUTE AS s_end,
             count(*) AS n_events
      FROM y GROUP BY user_id, sid
    """,
    "q_variant" -> """
      SELECT event_id,
             json_extract_string(props, '$.k')::BIGINT AS k,
             json_extract_string(props, '$.k') AS k_str
      FROM events
      WHERE json_extract_string(props, '$.k')::BIGINT > 50
    """,
    "q_json_extract" -> """
      SELECT event_id, k FROM (
        SELECT event_id, json_extract_string(props, '$.k')::BIGINT AS k
        FROM events)
      WHERE k > 50
    """,
    "q_count_gate" -> """
      SELECT count(*) AS n_persons,
             count(DISTINCT c_nationkey) AS n_households,
             count(*) FILTER (c_acctbal > 0) AS n_positive_bal
      FROM customer
    """,
    "q_join_semi_parent" -> """
      SELECT o_orderkey, o_custkey FROM orders
      WHERE EXISTS (SELECT 1 FROM customer
                    WHERE c_custkey = o_custkey AND c_acctbal > 5000.0)
    """,
    "q_set_ops" -> """
      WITH big AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0),
      building AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      SELECT c_custkey, 'rich_building' AS tag
      FROM (SELECT c_custkey FROM big INTERSECT SELECT c_custkey FROM building)
      UNION ALL
      SELECT c_custkey, 'building_only' AS tag
      FROM (SELECT c_custkey FROM building EXCEPT ALL SELECT c_custkey FROM big)
    """,
    "q_string_funcs" -> """
      SELECT c_custkey,
             upper(c_name) AS name_upper,
             substr(c_name, 1, 8) AS name_prefix,
             length(c_name) AS name_len,
             concat_ws('/', c_mktsegment, c_nationkey::VARCHAR) AS seg_nation,
             coalesce(regexp_extract(c_name, '([0-9]+)', 1), '') AS name_digits,
             (c_name LIKE '%1%') AS has_one
      FROM customer
    """,
    "q_edit_distance" -> """
      SELECT c_custkey,
             levenshtein(c_name, 'Customer#000000100') AS edit_dist
      FROM customer
      WHERE levenshtein(c_name, 'Customer#000000100') <= 3
    """,
    "q_pivot" -> """
      SELECT o_custkey,
             count(*) FILTER (o_orderstatus = 'F') AS n_f,
             count(*) FILTER (o_orderstatus = 'O') AS n_o,
             count(*) FILTER (o_orderstatus = 'P') AS n_p
      FROM orders GROUP BY o_custkey
    """,
    "q_asof_join" -> """
      WITH ev AS (SELECT event_id, user_id, epoch_ns(ts) AS ts_ns FROM events),
      cp AS (SELECT user_id,
                    (epoch_ns(ts) // 86400000000000) * 86400000000000 AS cp_ns,
                    count(*) AS cp_events
             FROM events
             GROUP BY user_id, (epoch_ns(ts) // 86400000000000) * 86400000000000
             HAVING count(*) >= 5)
      SELECT e.event_id, e.user_id, e.ts_ns,
             coalesce(c.cp_ns, -1) AS cp_ns,
             coalesce(c.cp_events, -1) AS cp_events
      FROM ev e ASOF LEFT JOIN cp c
        ON e.user_id = c.user_id AND e.ts_ns >= c.cp_ns
    """,
    "q_asof_native" -> """
      WITH ev AS (SELECT event_id, user_id, epoch_ns(ts) AS ts_ns FROM events),
      cp AS (SELECT user_id,
                    (epoch_ns(ts) // 86400000000000) * 86400000000000 AS cp_ns,
                    count(*) AS cp_events
             FROM events
             GROUP BY user_id, (epoch_ns(ts) // 86400000000000) * 86400000000000
             HAVING count(*) >= 5)
      SELECT e.event_id, e.user_id, e.ts_ns,
             coalesce(c.cp_ns, -1) AS cp_ns,
             coalesce(c.cp_events, -1) AS cp_events
      FROM ev e ASOF LEFT JOIN cp c
        ON e.user_id = c.user_id AND e.ts_ns >= c.cp_ns
    """,
    "q_asof_skew" -> """
      WITH ev AS (SELECT event_id,
                         CASE WHEN user_id % 2 = 0 THEN 0 ELSE user_id END AS sk,
                         epoch_ns(ts) AS ts_ns FROM events),
      cp AS (SELECT sk,
                    (ts_ns // 86400000000000) * 86400000000000 AS cp_ns,
                    count(*) AS cp_events
             FROM ev
             GROUP BY 1, 2
             HAVING count(*) >= 5)
      SELECT e.event_id, e.sk, e.ts_ns,
             coalesce(c.cp_ns, -1) AS cp_ns,
             coalesce(c.cp_events, -1) AS cp_events
      FROM ev e ASOF LEFT JOIN cp c
        ON e.sk = c.sk AND e.ts_ns >= c.cp_ns
    """,
    "q_running_total" -> """
      SELECT o_orderkey, o_custkey,
             count(*) OVER w AS n_so_far,
             round(sum(o_totalprice) OVER w, 2) AS spent_so_far
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS UNBOUNDED PRECEDING)
    """,
    "q_rollup" -> """
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "q_cube" -> """
      SELECT l_returnflag, l_linestatus,
             GROUPING(l_returnflag, l_linestatus) AS gid,
             round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "q_grouping_sets" -> """
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                              (l_returnflag, l_linestatus))
    """,
    "q_window_analytics" -> """
      SELECT o_orderkey, o_custkey,
             ntile(4) OVER w AS quartile,
             dense_rank() OVER w AS drank,
             percent_rank() OVER w AS pct_rank,
             cume_dist() OVER w AS cdist,
             nth_value(o_totalprice, 2) OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS second_price
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
    "q_scalar_subquery" -> """
      SELECT c_custkey, c_acctbal,
             (SELECT max(o_totalprice) FROM orders o
              WHERE o.o_custkey = c.c_custkey) AS max_order,
             (SELECT count(*) FROM orders o
              WHERE o.o_custkey = c.c_custkey) AS n_orders
      FROM customer c
      WHERE c_acctbal > 0.9 * (SELECT max(c_acctbal) FROM customer)
    """,
    "q_month_spine" -> """
      WITH anchor AS (SELECT date_trunc('month', max(o_orderdate))::DATE AS m
                      FROM orders)
      SELECT unnest(generate_series((m - INTERVAL 48 MONTH)::TIMESTAMP,
                                    m::TIMESTAMP, INTERVAL 1 MONTH))::DATE
               AS start_of_month
      FROM anchor
    """,
    "q_band_join" -> """
      WITH persons AS (SELECT c_custkey AS person_id,
                              (c_custkey // 2) AS household_id FROM customer),
      anchor AS (SELECT max(o_orderdate)::DATE AS d FROM orders),
      admits AS (SELECT DISTINCT p.household_id, o.o_orderdate::DATE AS admit_date
                 FROM orders o JOIN persons p ON o.o_custkey = p.person_id, anchor a
                 WHERE o.o_orderdate::DATE
                       BETWEEN (a.d - INTERVAL 5 YEAR)::DATE AND a.d)
      SELECT cur.household_id AS household_id, cur.admit_date AS admit_date,
             count(*) AS n_prior
      FROM admits cur JOIN admits prv
        ON cur.household_id = prv.household_id
       AND prv.admit_date < cur.admit_date
       AND prv.admit_date >= cur.admit_date - 365
      GROUP BY 1, 2
    """,
    "q_funnel" -> """
      WITH e AS (SELECT user_id, event_type, event_id,
                        (epoch_ns(ts) // 1000) * 1000 AS ts_ns FROM events),
      s1 AS (SELECT user_id, min(ts_ns) AS t1 FROM e
             WHERE event_type = 'view' GROUP BY 1),
      s2 AS (SELECT e.user_id, min(e.ts_ns) AS t2, min(s1.t1) AS t1
             FROM e JOIN s1 ON e.user_id = s1.user_id AND e.ts_ns > s1.t1
             WHERE e.event_type = 'click' GROUP BY 1),
      s3 AS (SELECT e.user_id, min(e.ts_ns) AS t3, min(s2.t1) AS t1
             FROM e JOIN s2 ON e.user_id = s2.user_id AND e.ts_ns > s2.t2
             WHERE e.event_type = 'purchase' GROUP BY 1)
      SELECT 1 AS step_idx, 'view' AS step, count(*) AS users,
             0::BIGINT AS total_lag FROM s1
      UNION ALL SELECT 2, 'click', count(*),
             coalesce(sum(t2 - t1), 0)::BIGINT FROM s2
      UNION ALL SELECT 3, 'purchase', count(*),
             coalesce(sum(t3 - t1), 0)::BIGINT FROM s3
    """,
    "q_cohort" -> """
      WITH a AS (SELECT o_custkey AS k,
                        (year(o_orderdate) * 12 + month(o_orderdate)) AS m
                 FROM orders),
      c AS (SELECT k, min(m) AS m0 FROM a GROUP BY 1)
      SELECT make_date(((m0 - 1) // 12)::INT, ((m0 - 1) % 12 + 1)::INT, 1)
               AS cohort_month,
             offset_m, active, events
      FROM (SELECT m0, m - m0 AS offset_m, count(DISTINCT k) AS active,
                   count(*) AS events
            FROM a JOIN c USING (k) GROUP BY 1, 2)
    """,
    "q_scd2" -> """
      WITH e AS (SELECT user_id, event_type, event_id,
                        (epoch_ns(ts) // 1000) * 1000 AS ts_ns FROM events),
      ch AS (SELECT user_id, event_type AS state, ts_ns, event_id FROM (
               SELECT user_id, event_type, ts_ns, event_id,
                      lag(event_type) OVER (PARTITION BY user_id
                        ORDER BY ts_ns, event_id) AS prev
               FROM e)
             WHERE prev IS NULL OR prev <> event_type)
      SELECT user_id, state,
             row_number() OVER w AS version,
             ts_ns AS valid_from,
             lead(ts_ns) OVER w AS valid_to,
             lead(ts_ns) OVER w IS NULL AS is_current
      FROM ch WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns, event_id)
    """,
    "q_cdc_latest" -> """
      WITH e AS (SELECT user_id, event_type, event_id,
                        (epoch_ns(ts) // 1000) * 1000 AS ts_ns FROM events)
      SELECT user_id, state, last_ts FROM (
        SELECT user_id, event_type AS state, ts_ns AS last_ts,
               row_number() OVER (PARTITION BY user_id
                 ORDER BY ts_ns DESC, event_id DESC) AS rn
        FROM e)
      WHERE rn = 1 AND state <> 'error'
    """,
    "q_temporal_join" -> """
      WITH e AS (SELECT user_id, event_type, event_id,
                        (epoch_ns(ts) // 1000) * 1000 AS ts_ns FROM events),
      ch AS (SELECT user_id, event_type AS state, ts_ns, event_id FROM (
               SELECT user_id, event_type, ts_ns, event_id,
                      lag(event_type) OVER (PARTITION BY user_id
                        ORDER BY ts_ns, event_id) AS prev
               FROM e)
             WHERE prev IS NULL OR prev <> event_type),
      v AS (SELECT user_id, state, ts_ns AS valid_from,
                   row_number() OVER (PARTITION BY user_id
                     ORDER BY ts_ns, event_id) AS version
            FROM ch)
      SELECT e.event_id, e.user_id, e.ts_ns, x.state, x.version
      FROM e, LATERAL (SELECT state, version FROM v
                       WHERE v.user_id = e.user_id
                         AND v.valid_from <= e.ts_ns
                       ORDER BY v.valid_from DESC LIMIT 1) x
    """,
    "q_markov_stationary" -> """
      WITH e AS (SELECT user_id, event_type, event_id,
                        (epoch_ns(ts) // 1000) * 1000 AS ts_ns FROM events),
      t AS (SELECT event_type AS src, next_type AS dst,
                   count(*)::BIGINT AS n
            FROM (SELECT user_id, event_type, event_id, ts_ns,
                         lead(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts_ns, event_id) AS next_type
                  FROM e)
            WHERE next_type IS NOT NULL GROUP BY 1, 2),
      p AS (SELECT src, dst,
                   (n * 1000000 // sum(n) OVER (PARTITION BY src))::BIGINT
                     AS p_ppm
            FROM t),
      s AS (SELECT DISTINCT src AS state FROM p),
      kk AS (SELECT count(*)::BIGINT AS k FROM s),
      v0 AS (SELECT state, (1000000 // k)::BIGINT AS v_ppm
             FROM s CROSS JOIN kk),
      v1 AS (SELECT p.dst AS state,
                    sum(v_ppm * p_ppm // 1000000)::BIGINT AS v_ppm
             FROM p JOIN v0 ON p.src = v0.state GROUP BY 1),
      v2 AS (SELECT p.dst AS state,
                    sum(v_ppm * p_ppm // 1000000)::BIGINT AS v_ppm
             FROM p JOIN v1 ON p.src = v1.state GROUP BY 1),
      v3 AS (SELECT p.dst AS state,
                    sum(v_ppm * p_ppm // 1000000)::BIGINT AS v_ppm
             FROM p JOIN v2 ON p.src = v2.state GROUP BY 1)
      SELECT state, v_ppm FROM v3
    """,

    "q_transitions" -> """
      WITH e AS (SELECT user_id, event_type, event_id,
                        (epoch_ns(ts) // 1000) * 1000 AS ts_ns FROM events)
      SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
      FROM (SELECT event_type,
                   lead(event_type) OVER (PARTITION BY user_id
                     ORDER BY ts_ns, event_id) AS next_type
            FROM e)
      WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    """,
    "q_pagerank" -> pageRankOracle(3),
    "q_bloom_join" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, o_totalprice
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_totalprice > 480000.0
    """,
    "q_inverted_index" -> s"""
      WITH p AS (
        SELECT term, doc_id, count(*) AS tf FROM (
          SELECT doc_id, unnest($duckToks) AS term FROM documents)
        WHERE term <> '' GROUP BY 1, 2)
      SELECT term, df, tf_total, posting_list FROM (
        SELECT term, count(*) AS df, sum(tf)::BIGINT AS tf_total,
               string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)
                 AS posting_list
        FROM p GROUP BY 1)
      WHERE df BETWEEN 1 AND 400
    """,
    "q_index_search" -> s"""
      SELECT doc_id, lang, n_chars FROM documents
      WHERE list_contains($duckToks, 'spark')
        AND list_contains($duckToks, 'window')
        AND list_contains($duckToks, 'stream')
    """,
    "q_phrase_search" -> """
      SELECT doc_id, lang FROM documents
      WHERE ' ' || trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))
            || ' ' LIKE '% spark window %'
    """,
    "q_ranked_search" -> s"""
      WITH p AS (
        SELECT term, doc_id, count(*) AS tf FROM (
          SELECT doc_id, unnest($duckToks) AS term FROM documents)
        WHERE term <> '' GROUP BY 1, 2),
      h AS (SELECT doc_id, tf,
                   count(*) OVER (PARTITION BY term) AS df
            FROM p WHERE term IN ('spark', 'window', 'stream'))
      SELECT doc_id, sum((tf * 1000000) // df)::BIGINT AS score_micro,
             count(*) AS n_terms
      FROM h GROUP BY 1
      ORDER BY score_micro DESC, doc_id LIMIT 10
    """,

    "q_bm25_search" -> s"""
      WITH p AS (
        SELECT term, doc_id, count(*)::BIGINT AS tf FROM (
          SELECT doc_id, unnest($duckToks) AS term FROM documents)
        WHERE term <> '' GROUP BY 1, 2),
      len AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM p GROUP BY 1),
      st AS (SELECT sum(dl)::BIGINT AS tot, count(*)::BIGINT AS nd
             FROM len),
      h AS (SELECT p.doc_id, p.tf,
                   count(*) OVER (PARTITION BY p.term)::BIGINT AS df,
                   len.dl, st.tot, st.nd
            FROM p JOIN len USING (doc_id) CROSS JOIN st
            WHERE p.term IN ('spark', 'window', 'stream')),
      sc AS (SELECT doc_id, tf, df, dl,
                    (tot * 1000 // nd)::BIGINT AS s_milli,
                    dl * 1000 AS d_milli, nd
             FROM h),
      ts AS (SELECT doc_id,
                    ((44 * tf * s_milli * 1000000 //
                       (20 * tf * s_milli + 6 * s_milli + 18 * d_milli))
                     * (nd * 1000000 // df) // 1000000)::BIGINT
                      AS term_score
             FROM sc)
      SELECT doc_id, sum(term_score)::BIGINT AS score_micro,
             count(*) AS n_terms
      FROM ts GROUP BY 1
      ORDER BY score_micro DESC, doc_id LIMIT 10
    """,

    "q_rrf_fusion" -> s"""
      WITH p AS (
        SELECT term, doc_id, count(*)::BIGINT AS tf FROM (
          SELECT doc_id, unnest($duckToks) AS term FROM documents)
        WHERE term <> '' GROUP BY 1, 2),
      ha AS (SELECT doc_id, tf,
                    count(*) OVER (PARTITION BY term)::BIGINT AS df
             FROM p WHERE term IN ('spark', 'window', 'stream')),
      runa AS (SELECT doc_id,
                      sum((tf * 1000000) // df)::BIGINT AS score
               FROM ha GROUP BY 1
               ORDER BY score DESC, doc_id LIMIT 20),
      ra AS (SELECT doc_id, row_number() OVER
               (ORDER BY score DESC, doc_id)::BIGINT AS rank_a
             FROM runa),
      len AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM p GROUP BY 1),
      st AS (SELECT sum(dl)::BIGINT AS tot, count(*)::BIGINT AS nd
             FROM len),
      hb AS (SELECT p.doc_id, p.tf,
                    count(*) OVER (PARTITION BY p.term)::BIGINT AS df,
                    len.dl, st.tot, st.nd
             FROM p JOIN len USING (doc_id) CROSS JOIN st
             WHERE p.term IN ('spark', 'window', 'stream')),
      sc AS (SELECT doc_id, tf, df,
                    (tot * 1000 // nd)::BIGINT AS s_milli,
                    dl * 1000 AS d_milli, nd
             FROM hb),
      ts AS (SELECT doc_id,
                    ((44 * tf * s_milli * 1000000 //
                       (20 * tf * s_milli + 6 * s_milli + 18 * d_milli))
                     * (nd * 1000000 // df) // 1000000)::BIGINT
                      AS term_score
             FROM sc),
      runb AS (SELECT doc_id, sum(term_score)::BIGINT AS score
               FROM ts GROUP BY 1
               ORDER BY score DESC, doc_id LIMIT 20),
      rb AS (SELECT doc_id, row_number() OVER
               (ORDER BY score DESC, doc_id)::BIGINT AS rank_b
             FROM runb),
      f AS (SELECT doc_id,
                   (coalesce(1000000 // (60 + rank_a), 0)
                    + coalesce(1000000 // (60 + rank_b), 0))::BIGINT
                     AS rrf_micro,
                   coalesce(rank_a, 0)::BIGINT AS rank_a,
                   coalesce(rank_b, 0)::BIGINT AS rank_b
            FROM ra FULL OUTER JOIN rb USING (doc_id))
      SELECT doc_id, rrf_micro, rank_a, rank_b
      FROM f ORDER BY rrf_micro DESC, doc_id LIMIT 10
    """,

    "q_rank_tau" -> s"""
      WITH p AS (
        SELECT term, doc_id, count(*)::BIGINT AS tf FROM (
          SELECT doc_id, unnest($duckToks) AS term FROM documents)
        WHERE term <> '' GROUP BY 1, 2),
      ha AS (SELECT doc_id, tf,
                    count(*) OVER (PARTITION BY term)::BIGINT AS df
             FROM p WHERE term IN ('spark', 'window', 'stream')),
      runa AS (SELECT doc_id,
                      sum((tf * 1000000) // df)::BIGINT AS score
               FROM ha GROUP BY 1
               ORDER BY score DESC, doc_id LIMIT 20),
      ra AS (SELECT doc_id, row_number() OVER
               (ORDER BY score DESC, doc_id)::BIGINT AS ra
             FROM runa),
      len AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM p GROUP BY 1),
      st AS (SELECT sum(dl)::BIGINT AS tot, count(*)::BIGINT AS nd
             FROM len),
      hb AS (SELECT p.doc_id, p.tf,
                    count(*) OVER (PARTITION BY p.term)::BIGINT AS df,
                    len.dl, st.tot, st.nd
             FROM p JOIN len USING (doc_id) CROSS JOIN st
             WHERE p.term IN ('spark', 'window', 'stream')),
      sc AS (SELECT doc_id, tf, df,
                    (tot * 1000 // nd)::BIGINT AS s_milli,
                    dl * 1000 AS d_milli, nd
             FROM hb),
      ts AS (SELECT doc_id,
                    ((44 * tf * s_milli * 1000000 //
                       (20 * tf * s_milli + 6 * s_milli + 18 * d_milli))
                     * (nd * 1000000 // df) // 1000000)::BIGINT
                      AS term_score
             FROM sc),
      runb AS (SELECT doc_id, sum(term_score)::BIGINT AS score
               FROM ts GROUP BY 1
               ORDER BY score DESC, doc_id LIMIT 20),
      rb AS (SELECT doc_id, row_number() OVER
               (ORDER BY score DESC, doc_id)::BIGINT AS rb
             FROM runb),
      common AS (SELECT doc_id, ra, rb FROM ra JOIN rb USING (doc_id)),
      pr AS (SELECT sign((a.ra - b.ra) * (a.rb - b.rb)) AS s
             FROM common a JOIN common b ON a.doc_id < b.doc_id)
      SELECT sum(CASE WHEN s > 0 THEN 1 ELSE 0 END)::BIGINT AS concordant,
             sum(CASE WHEN s < 0 THEN 1 ELSE 0 END)::BIGINT AS discordant,
             count(*)::BIGINT AS n_pairs,
             (sum(CASE WHEN s > 0 THEN 1 ELSE 0 END)
              - sum(CASE WHEN s < 0 THEN 1 ELSE 0 END))::BIGINT AS tau_num,
             count(*)::BIGINT AS tau_den
      FROM pr
    """,
    "q_knn_join" -> s"""
      WITH n AS (
        SELECT vec_id, embedding,
               sqrt(list_sum(list_transform(range(1, 65),
                 i -> embedding[i]::DOUBLE * embedding[i]::DOUBLE))) AS nrm
        FROM embeddings),
      scored AS (
        SELECT a.vec_id, b.vec_id AS neighbor_id,
               round(list_sum(list_transform(range(1, 65),
                       i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
                     / nullif(a.nrm * b.nrm, 0), 6) AS cos
        FROM n a JOIN n b ON a.vec_id <> b.vec_id)
      SELECT vec_id, neighbor_id, cos, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                    ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored)
      WHERE rank <= 3
    """,
    "q_star_join" -> """
      SELECT n_name,
             sum(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                 ::BIGINT)::BIGINT AS revenue_cents,
             count(*) AS n_items
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA' AND year(o_orderdate) = 1996
      GROUP BY n_name
    """,
    "q_unpivot" -> """
      SELECT l_orderkey, l_linenumber, measure, value FROM (
        SELECT l_orderkey, l_linenumber, l_quantity AS quantity,
               l_extendedprice AS price, l_discount AS discount
        FROM lineitem WHERE l_orderkey < 1000)
      UNPIVOT (value FOR measure IN (quantity, price, discount))
    """,
    "q_recursive_cte" -> """
      WITH RECURSIVE anc(node, parent, depth) AS (
        SELECT c_custkey, c_custkey // 2, 1
        FROM customer WHERE c_custkey > 1 AND c_custkey < 200
        UNION ALL
        SELECT node, parent // 2, depth + 1 FROM anc WHERE parent > 1
      )
      SELECT node, max(depth) AS depth_to_root FROM anc GROUP BY node
    """,
    "q_lateral" -> """
      SELECT c_custkey, t.o_orderkey, t.o_totalprice
      FROM customer c,
      LATERAL (SELECT o_orderkey, o_totalprice FROM orders
               WHERE o_custkey = c.c_custkey
               ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    """,
    "q_window_distinct" -> """
      SELECT l_returnflag, l_orderkey, l_linenumber,
             count(DISTINCT l_partkey) OVER (PARTITION BY l_returnflag
               ORDER BY l_shipdate, l_orderkey, l_linenumber
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS distinct_parts
      FROM lineitem WHERE l_orderkey < 3000
    """,
    "q_histogram" -> """
      SELECT (floor(o_totalprice / 50000) * 50000)::BIGINT AS bucket_lo,
             count(*) AS n, min(o_totalprice) AS min_price,
             max(o_totalprice) AS max_price
      FROM orders GROUP BY 1
    """,
    "q_range_frame" -> """
      WITH o AS (SELECT o_custkey, o_orderkey,
                   date_diff('day', DATE '1990-01-01', o_orderdate::DATE)
                     AS d,
                   floor(o_totalprice * 100 + 0.5)::BIGINT AS cents
                 FROM orders)
      SELECT o_custkey, o_orderkey, d,
             count(*) OVER w AS n_30d,
             (sum(cents) OVER w)::BIGINT AS spend_cents_30d
      FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY d
                          RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
    """,
    "q_kmeans" -> (kmeansCtes(8, 2) + """
      SELECT vec_id, cid, dist::BIGINT AS dist_q FROM a2
    """),
    "q_sim_ann_kmeans" -> (kmeansCtes(8, 2) + s""",
      q AS (SELECT vec_id AS query_id, embedding AS qe, xx
            FROM xx WHERE vec_id < 5),
      probe AS (SELECT query_id, qe, cid FROM (
          SELECT q.query_id, q.qe, s.cid,
                 row_number() OVER (PARTITION BY q.query_id
                   ORDER BY q.xx - 2 * list_sum(list_transform(range(1, 65),
                              i -> q.qe[i] * s.ce[i])) + s.cc,
                            s.cid) AS crank
          FROM q CROSS JOIN (SELECT cid, ce,
                  list_sum(list_transform(range(1, 65), i -> ce[i] * ce[i]))
                    AS cc FROM c2) s)
        WHERE crank <= 2),
      scored AS (SELECT query_id, a.vec_id AS neighbor_id,
                        ${duckCos("qe", "a.embedding")} AS cos
                 FROM probe p JOIN a2 a ON a.cid = p.cid
                 WHERE a.vec_id <> p.query_id)
      SELECT query_id, neighbor_id, cos, rank FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored)
      WHERE rank <= 5
    """),

    "q_gap_fill" -> """
      WITH e AS (
        SELECT event_id, user_id, ts,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(floor("value" * 1000) AS BIGINT) END AS pv
        FROM events),
      g AS (SELECT event_id, user_id, pv,
                   count(pv) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS grp
            FROM e)
      SELECT event_id, user_id,
             max(pv) OVER (PARTITION BY user_id, grp) AS filled_milli
      FROM g
    """,

    "q_interval_merge" -> """
      WITH iv AS (
        SELECT user_id, event_id, epoch_us(ts) AS start_us,
               epoch_us(ts) + ((event_id % 7) + 1) * 60000000 AS end_us
        FROM events),
      m AS (SELECT *, max(end_us) OVER (
                        PARTITION BY user_id ORDER BY start_us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      AS max_end FROM iv),
      f AS (SELECT *, CASE WHEN max_end IS NULL OR start_us > max_end
                           THEN 1 ELSE 0 END AS newi FROM m),
      i AS (SELECT *, sum(newi) OVER (
                        PARTITION BY user_id ORDER BY start_us, event_id
                        ROWS UNBOUNDED PRECEDING) AS island FROM f)
      SELECT user_id, island::BIGINT AS island,
             min(start_us) AS span_start, max(end_us) AS span_end,
             count(*) AS n_merged
      FROM i GROUP BY user_id, island
    """,

    "q_anomaly" -> """
      WITH e AS (
        SELECT user_id, event_id, CAST(floor("value" * 1000) AS BIGINT) AS v_milli
        FROM events WHERE "value" IS NOT NULL),
      s AS (SELECT *, count(*) OVER w AS n, sum(v_milli) OVER w AS s1,
                   sum(v_milli * v_milli) OVER w AS s2
            FROM e WINDOW w AS (PARTITION BY user_id))
      SELECT user_id, event_id, v_milli, n::BIGINT AS n_key_rows
      FROM s
      WHERE n >= 10
        AND (n * v_milli - s1) * (n * v_milli - s1) > 4 * (n * s2 - s1 * s1)
    """,

    "q_triangles" -> """
      WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
      e0 AS (SELECT a.l_suppkey AS u, b.l_suppkey AS v, count(*) AS w
             FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                                AND a.l_suppkey < b.l_suppkey
             GROUP BY 1, 2),
      e AS (SELECT u, v FROM e0 WHERE w >= 5)
      SELECT (SELECT count(*) FROM
                (SELECT u AS x FROM e UNION SELECT v FROM e)) AS n_nodes,
             (SELECT count(*) FROM e) AS n_edges,
             (SELECT count(*) FROM e e1
                JOIN e e2 ON e2.u = e1.v
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles
    """,

    "q_hll_registers" -> """
      WITH h AS (SELECT ('0x' || substr(md5(l_partkey::VARCHAR), 1, 15))::BIGINT
                   AS h FROM lineitem)
      SELECT (h % 256)::BIGINT AS register,
             max(CASE WHEN (h >> 8) = 0 THEN 53
                      ELSE 53 - length(bin(h >> 8)) END)::BIGINT AS max_rho
      FROM h GROUP BY 1
    """,

    "q_countmin" -> """
      WITH t AS (SELECT event_type || ':' || (user_id % 100)::VARCHAR AS key,
                        count(*) AS true_cnt
                 FROM events GROUP BY 1),
      sal AS (SELECT key, true_cnt, j,
                     ('0x' || substr(md5(j::VARCHAR || ':' || key), 1, 15))::BIGINT
                       % 256 AS b
              FROM t CROSS JOIN (SELECT unnest(range(0, 4)) AS j)),
      cells AS (SELECT j, b, sum(true_cnt) AS cell FROM sal GROUP BY 1, 2)
      SELECT key, max(true_cnt)::BIGINT AS true_cnt, min(cell)::BIGINT AS cm_est
      FROM sal JOIN cells USING (j, b) GROUP BY key
    """,

    "q_containment" -> s"""
      WITH d AS (SELECT doc_id, $duckToks AS t FROM documents),
      g AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 15))::BIGINT AS gh
            FROM (SELECT doc_id, unnest(list_distinct(list_transform(
                    range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' ')))) AS g
                  FROM d WHERE len(t) >= 3)),
      r AS (SELECT doc_id, gh FROM
              (SELECT doc_id, gh, count(*) OVER (PARTITION BY gh) AS df FROM g)
            WHERE df <= 50),
      sz AS (SELECT doc_id, count(*) AS sz FROM r GROUP BY 1),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
                FROM r a JOIN r b ON a.gh = b.gh AND a.doc_id <> b.doc_id
                GROUP BY 1, 2)
      SELECT doc_a, doc_b, inter, sz.sz AS sz_a,
             (inter * 1000000 // sz.sz) AS cont_ppm
      FROM inter JOIN sz ON sz.doc_id = doc_a
      WHERE (inter * 1000000 // sz.sz) >= 600000
    """,

    "q_salted_agg" -> """
      SELECT l_returnflag AS rf,
             sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))::BIGINT
               AS sum_cents,
             count(*) AS count_cents
      FROM lineitem GROUP BY 1
    """,

    "q_systematic_sample" -> """
      WITH d AS (
        SELECT doc_id, lang,
               (CASE WHEN trim(text) = '' THEN 0
                     ELSE len(string_split_regex(trim(text), '\s+'))
                END)::BIGINT AS wt
        FROM documents),
      c AS (SELECT *, sum(wt) OVER (PARTITION BY lang ORDER BY doc_id
                                    ROWS UNBOUNDED PRECEDING) AS cum
            FROM d)
      SELECT doc_id, lang, wt, cum::BIGINT AS cum FROM c
      WHERE cum // 500 > (cum - wt) // 500
    """,

    "q_cdc_chunks" -> s"""
      WITH pos AS (
        SELECT doc_id, e,
               list_sum(list_transform(range(0, 16), j ->
                 ord(substr(text, e - 15 + j, 1))::BIGINT * $rabinPows[j + 1]))
                 % 2147483647 AS h
        FROM (SELECT doc_id, text, unnest(range(16, length(text) + 1)) AS e
              FROM documents)),
      agg AS (SELECT doc_id, count(*) AS nb, sum(e) AS bsum, min(e) AS fc
              FROM pos WHERE h % 64 = 0 GROUP BY 1)
      SELECT d.doc_id, length(d.text)::BIGINT AS n_chars,
             coalesce(nb, 0)::BIGINT AS n_boundaries,
             (coalesce(nb, 0) + 1)::BIGINT AS n_chunks,
             coalesce(bsum, 0)::BIGINT AS boundary_sum,
             coalesce(fc, 0)::BIGINT AS first_cut
      FROM documents d LEFT JOIN agg USING (doc_id)
    """,

    "q_topk_agg" -> """
      SELECT grp, rank, o_totalprice AS price, o_orderkey AS okey FROM (
        SELECT o_custkey % 64 AS grp, o_totalprice, o_orderkey,
               row_number() OVER (PARTITION BY o_custkey % 64
                 ORDER BY o_totalprice DESC, o_orderkey) AS rank
        FROM orders)
      WHERE rank <= 3
    """,

    "q_hll_groups" -> """
      WITH h AS (SELECT event_type,
                        ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT
                          AS h
                 FROM events WHERE user_id IS NOT NULL),
      r AS (SELECT event_type, h % 256 AS reg,
                   max(CASE WHEN (h >> 8) = 0 THEN 53
                            ELSE 53 - length(bin(h >> 8)) END) AS rho
            FROM h GROUP BY 1, 2),
      sk AS (SELECT event_type,
                    (256 - count(*))::BIGINT AS n_zero_registers,
                    sum(rho)::BIGINT AS sum_rho,
                    (sum(1::BIGINT << (53 - rho))
                     + (256 - count(*)) * (1::BIGINT << 53))::BIGINT
                      AS inv_scaled
             FROM r GROUP BY 1),
      ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_distinct
             FROM events GROUP BY 1)
      SELECT sk.event_type, n_zero_registers, sum_rho, inv_scaled,
             exact_distinct
      FROM sk JOIN ex USING (event_type)
    """,

    "q_cluster_coeff" -> """
      WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
      e0 AS (SELECT a.l_suppkey AS u, b.l_suppkey AS v, count(*) AS w
             FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                                AND a.l_suppkey < b.l_suppkey
             GROUP BY 1, 2),
      e AS (SELECT u, v FROM e0 WHERE w >= 5),
      deg AS (SELECT node, count(*)::BIGINT AS deg FROM
                (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
              GROUP BY 1),
      t AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
            FROM e e1 JOIN e e2 ON e2.u = e1.v
                      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
      tp AS (SELECT node, count(*)::BIGINT AS n_tri FROM
               (SELECT a AS node FROM t UNION ALL
                SELECT b FROM t UNION ALL SELECT c FROM t)
             GROUP BY 1)
      SELECT d.node, d.deg, coalesce(tp.n_tri, 0)::BIGINT AS n_tri,
             CASE WHEN d.deg < 2 THEN 0
                  ELSE coalesce(tp.n_tri, 0) * 2000000 // (d.deg * (d.deg - 1))
             END::BIGINT AS coeff_ppm
      FROM deg d LEFT JOIN tp ON tp.node = d.node
    """,

    "q_bitmap_membership" -> """
      SELECT o_custkey,
             bit_or(1::BIGINT << (substr(o_orderpriority, 1, 1)::INT - 1))
               ::BIGINT AS pri_mask,
             count(*) AS n_orders,
             bit_count(bit_or(1::BIGINT <<
               (substr(o_orderpriority, 1, 1)::INT - 1)))::BIGINT
               AS n_priorities
      FROM orders GROUP BY 1
    """,

    "q_asof_fwd" -> """
      WITH ev AS (SELECT event_id, user_id, epoch_ns(ts) AS ts_ns FROM events),
      cp AS (SELECT user_id,
                    (epoch_ns(ts) // 86400000000000) * 86400000000000 AS cp_ns,
                    count(*) AS cp_events
             FROM events
             GROUP BY user_id, (epoch_ns(ts) // 86400000000000) * 86400000000000
             HAVING count(*) >= 5),
      nxt AS (SELECT e.event_id, min(c.cp_ns) AS cp_ns
              FROM ev e JOIN cp c ON c.user_id = e.user_id
                                 AND c.cp_ns >= e.ts_ns
              GROUP BY 1)
      SELECT e.event_id, e.user_id, e.ts_ns,
             coalesce(n.cp_ns, -1) AS cp_ns,
             coalesce(c.cp_events, -1) AS cp_events
      FROM ev e LEFT JOIN nxt n USING (event_id)
                LEFT JOIN cp c ON c.user_id = e.user_id AND c.cp_ns = n.cp_ns
    """,

    "q_asof_nearest" -> """
      WITH ev AS (SELECT event_id, user_id, epoch_ns(ts) AS ts_ns FROM events),
      cp AS (SELECT user_id,
                    (epoch_ns(ts) // 86400000000000) * 86400000000000 AS cp_ns,
                    count(*) AS cp_events
             FROM events
             GROUP BY user_id, (epoch_ns(ts) // 86400000000000) * 86400000000000
             HAVING count(*) >= 5),
      prv AS (SELECT e.event_id, max(c.cp_ns) AS p
              FROM ev e JOIN cp c ON c.user_id = e.user_id
                                 AND c.cp_ns <= e.ts_ns
              GROUP BY 1),
      nx AS (SELECT e.event_id, min(c.cp_ns) AS n
             FROM ev e JOIN cp c ON c.user_id = e.user_id
                                AND c.cp_ns > e.ts_ns
             GROUP BY 1),
      pick AS (SELECT e.event_id, e.user_id, e.ts_ns,
                      CASE WHEN p IS NOT NULL AND
                                (n IS NULL OR (e.ts_ns - p) <= (n - e.ts_ns))
                           THEN p ELSE n END AS cp_ns
               FROM ev e LEFT JOIN prv USING (event_id)
                         LEFT JOIN nx USING (event_id))
      SELECT k.event_id, k.user_id, k.ts_ns,
             coalesce(k.cp_ns, -1) AS cp_ns,
             coalesce(c.cp_events, -1) AS cp_events
      FROM pick k LEFT JOIN cp c ON c.user_id = k.user_id
                              AND c.cp_ns = k.cp_ns
    """,

    "q_range_join" -> """
      WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS s,
                         epoch_us(ts) + ((event_id % 7) + 1) * 60000000 AS e
                  FROM events)
      SELECT a.user_id, a.event_id AS l_id, b.event_id AS r_id,
             a.s AS l_start, a.e AS l_end, b.s AS r_start, b.e AS r_end,
             (least(a.e, b.e) - greatest(a.s, b.s)) AS overlap_len
      FROM iv a JOIN iv b ON a.user_id = b.user_id
                         AND a.event_id < b.event_id
                         AND a.s < b.e AND b.s < a.e
    """,

    "q_link_predict" -> """
      WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
      e0 AS (SELECT a.l_suppkey AS u, b.l_suppkey AS v, count(*) AS w
             FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                                AND a.l_suppkey < b.l_suppkey
             GROUP BY 1, 2),
      e AS (SELECT u, v FROM e0 WHERE w >= 8),
      sym AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
      deg AS (SELECT u, count(*) AS deg FROM sym GROUP BY 1),
      adj AS (SELECT s.u AS z, s.v AS n, d.deg FROM sym s JOIN deg d
              ON d.u = s.u),
      wedge AS (SELECT x.n AS n1, y.n AS n2, x.deg AS zdeg
                FROM adj x JOIN adj y ON x.z = y.z AND x.n < y.n),
      scored AS (SELECT n1, n2, count(*) AS cn,
                        sum(1000000 // zdeg)::BIGINT AS ra_micro
                 FROM wedge GROUP BY 1, 2)
      SELECT s.n1, s.n2, s.cn, s.ra_micro,
             (CASE WHEN e.u IS NULL THEN 0 ELSE 1 END)::BIGINT AS is_edge
      FROM scored s LEFT JOIN e ON e.u = s.n1 AND e.v = s.n2
      WHERE s.cn >= 2
    """,

    "q_weighted_median" -> """
      WITH bv AS (SELECT l_returnflag AS rf,
                         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                           AS cents,
                         sum(l_quantity::BIGINT) AS w
                  FROM lineitem GROUP BY 1, 2),
      c AS (SELECT *, sum(w) OVER (PARTITION BY rf ORDER BY cents
                                   ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(w) OVER (PARTITION BY rf) AS total
            FROM bv)
      SELECT rf, min(cents)::BIGINT AS median_cents,
             max(total)::BIGINT AS total_weight
      FROM c WHERE cum * 2 >= total GROUP BY rf
    """,

    "q_pseudonymize" -> """
      WITH cust AS (SELECT ('0x' || substr(md5('v1:' || c_custkey::VARCHAR),
                              1, 15))::BIGINT AS pid,
                           c_nationkey AS nation
                    FROM customer),
      ord AS (SELECT ('0x' || substr(md5('v1:' || o_custkey::VARCHAR),
                        1, 15))::BIGINT AS pid
              FROM orders),
      oc AS (SELECT pid, count(*) AS n_orders FROM ord GROUP BY 1)
      SELECT nation, count(*) AS n_customers,
             sum(coalesce(n_orders, 0))::BIGINT AS n_orders,
             min(pid) AS min_pid, max(pid) AS max_pid
      FROM cust LEFT JOIN oc USING (pid)
      GROUP BY nation
    """,

    "q_survival" -> """
      WITH life AS (SELECT user_id,
                           max(epoch_ns(ts) // 86400000000000) -
                           min(epoch_ns(ts) // 86400000000000) AS tenure_days
                    FROM events GROUP BY 1),
      expanded AS (SELECT user_id, tenure_days,
                          unnest(range(0, tenure_days + 1)) AS k
                   FROM life)
      SELECT k, count(*) AS at_risk,
             count(*) FILTER (tenure_days = k) AS churned
      FROM expanded GROUP BY k
    """,

    "q_profile" -> """
      SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
             count(*) FILTER (o_orderkey IS NULL) AS n_null,
             count(DISTINCT o_orderkey) AS n_distinct,
             min(o_orderkey::VARCHAR) AS min_str,
             max(o_orderkey::VARCHAR) AS max_str
      FROM orders
      UNION ALL
      SELECT 'o_custkey', count(*),
             count(*) FILTER (o_custkey IS NULL),
             count(DISTINCT o_custkey),
             min(o_custkey::VARCHAR), max(o_custkey::VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus', count(*),
             count(*) FILTER (o_orderstatus IS NULL),
             count(DISTINCT o_orderstatus),
             min(o_orderstatus), max(o_orderstatus)
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority', count(*),
             count(*) FILTER (o_orderpriority IS NULL),
             count(DISTINCT o_orderpriority),
             min(o_orderpriority), max(o_orderpriority)
      FROM orders
    """,

    "q_quality_checks" -> """
      SELECT 'orders_custkey_fk' AS check_name,
             count(*) FILTER (c.c_custkey IS NULL) AS violations
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      UNION ALL
      SELECT 'orders_orderkey_unique',
             count(*) FROM (SELECT o_orderkey FROM orders
                            GROUP BY 1 HAVING count(*) > 1)
      UNION ALL
      SELECT 'orders_orderdate_not_null',
             count(*) FILTER (o_orderdate IS NULL) FROM orders
      UNION ALL
      SELECT 'orders_status_accepted_values',
             count(*) FILTER (o_orderstatus NOT IN ('O', 'F', 'P'))
      FROM orders
    """,

    "q_snapshot_diff" -> """
      WITH o AS (SELECT o_orderkey AS k,
                        CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                          AS price
                 FROM orders),
      old AS (SELECT k, CASE WHEN k % 7 = 0 THEN price + 1 ELSE price END
                       AS old_price
              FROM o WHERE k % 10 < 8),
      neu AS (SELECT k, price AS new_price FROM o WHERE k % 10 < 9)
      SELECT CASE WHEN old_price IS NULL THEN 'added'
                  WHEN new_price IS NULL THEN 'removed'
                  WHEN old_price <> new_price THEN 'changed'
                  ELSE 'unchanged' END AS change,
             count(*) AS n
      FROM old FULL OUTER JOIN neu USING (k)
      GROUP BY 1
    """,

    "q_time_weighted" -> """
      WITH e AS (SELECT user_id, event_id,
                        epoch_ns(ts) // 1000000 AS ts_ms,
                        CAST(floor("value" * 1000) AS BIGINT) AS v_milli
                 FROM events),
      l AS (SELECT *, lead(ts_ms) OVER (PARTITION BY user_id
                                        ORDER BY ts_ms, event_id) AS next_ms
            FROM e)
      SELECT user_id,
             sum(v_milli * (next_ms - ts_ms))::BIGINT AS twa_num,
             sum(next_ms - ts_ms)::BIGINT AS twa_den,
             (sum(v_milli * (next_ms - ts_ms)) //
              sum(next_ms - ts_ms))::BIGINT AS twa_milli
      FROM l WHERE next_ms IS NOT NULL
      GROUP BY user_id HAVING sum(next_ms - ts_ms) > 0
    """,

    "q_decayed_count" -> """
      WITH ev AS (SELECT user_id, epoch_ns(ts) // 86400000000000 AS day
                  FROM events),
      a AS (SELECT max(day) AS anchor FROM ev)
      SELECT user_id,
             sum(1::BIGINT << ((40 - (anchor - day))::INT))::BIGINT
               AS decayed_e40,
             count(*) AS n_recent
      FROM ev, a WHERE anchor - day <= 40
      GROUP BY user_id
    """,

    "q_assoc_rules" -> """
      WITH it AS (SELECT DISTINCT l_orderkey AS basket, p_brand AS item
                  FROM lineitem JOIN part ON l_partkey = p_partkey),
      tot AS (SELECT count(DISTINCT basket) AS n_baskets FROM it),
      ic AS (SELECT item, count(*) AS item_cnt FROM it GROUP BY 1),
      p AS (SELECT a.item AS item_a, b.item AS item_b, count(*) AS pair_cnt
            FROM it a JOIN it b ON a.basket = b.basket AND a.item < b.item
            GROUP BY 1, 2)
      SELECT item_a, item_b, pair_cnt,
             ca.item_cnt AS cnt_a, cb.item_cnt AS cnt_b,
             ((pair_cnt::HUGEINT * 1000000) // ca.item_cnt)::BIGINT
               AS conf_ab_ppm,
             ((pair_cnt::HUGEINT * 1000000) // cb.item_cnt)::BIGINT
               AS conf_ba_ppm,
             ((pair_cnt::HUGEINT * n_baskets * 1000000) //
              (ca.item_cnt::HUGEINT * cb.item_cnt))::BIGINT AS lift_ppm
      FROM p JOIN ic ca ON ca.item = p.item_a
             JOIN ic cb ON cb.item = p.item_b
             CROSS JOIN tot
      WHERE pair_cnt * 1000000 >= 10000 * n_baskets
    """,

    // bounded BFS: the oracle unrolls 3 rounds of full min-distance
    // relaxation — equivalent to frontier BFS for hop-bounded
    // distances, but expressible as plain CTE stages
    "q_shortest_path" -> """
      WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
      e0 AS (SELECT a.l_suppkey AS u, b.l_suppkey AS v, count(*) AS w
             FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                                AND a.l_suppkey < b.l_suppkey
             GROUP BY 1, 2),
      e AS (SELECT u, v FROM e0 WHERE w >= 5),
      sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
      d0 AS (SELECT DISTINCT s_suppkey AS node, 0 AS dist FROM supplier
             WHERE s_suppkey < 3),
      r1 AS (SELECT node, min(dist) AS dist FROM (
               SELECT node, dist FROM d0
               UNION ALL
               SELECT sym.v, d0.dist + 1 FROM d0 JOIN sym ON sym.u = d0.node)
             GROUP BY node),
      r2 AS (SELECT node, min(dist) AS dist FROM (
               SELECT node, dist FROM r1
               UNION ALL
               SELECT sym.v, r1.dist + 1 FROM r1 JOIN sym ON sym.u = r1.node)
             GROUP BY node),
      r3 AS (SELECT node, min(dist) AS dist FROM (
               SELECT node, dist FROM r2
               UNION ALL
               SELECT sym.v, r2.dist + 1 FROM r2 JOIN sym ON sym.u = r2.node)
             GROUP BY node)
      SELECT node, dist FROM r3
    """,

    "q_apportion" -> """
      WITH w AS (SELECT source AS k, sum(n_chars)::HUGEINT AS wt
                 FROM documents GROUP BY 1),
      t AS (SELECT sum(wt) AS tot FROM w),
      b AS (SELECT k, wt, (wt * 1000000) // tot AS base_quota,
                   (wt * 1000000) % tot AS rem FROM w, t),
      u AS (SELECT sum(base_quota) AS used FROM b),
      r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, k) AS rk FROM b)
      SELECT k AS source, wt::BIGINT AS weight, base_quota::BIGINT AS base_quota,
             (base_quota +
              CASE WHEN rk <= 1000000 - used THEN 1 ELSE 0 END)::BIGINT AS quota
      FROM r, u
    """,

    // sign factored out so hugeint floor-div on abs operands matches
    // Spark's toward-zero `div` exactly
    "q_regression" -> """
      WITH d AS (SELECT l_returnflag AS rf, l_quantity::BIGINT AS x,
                        floor(l_extendedprice * 100 + 0.5)::BIGINT AS y
                 FROM lineitem),
      s AS (SELECT rf, count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
                   sum(y)::HUGEINT AS sy, sum(x*x)::HUGEINT AS sxx,
                   sum(x*y)::HUGEINT AS sxy
            FROM d GROUP BY rf),
      t AS (SELECT *, n*sxy - sx*sy AS num, n*sxx - sx*sx AS den FROM s)
      SELECT rf, n::BIGINT AS n, sx::BIGINT AS sx, sy::BIGINT AS sy,
             sxx::BIGINT AS sxx, sxy::BIGINT AS sxy,
             (CASE WHEN den = 0 THEN NULL ELSE
               (CASE WHEN (num < 0) != (den < 0) THEN -1 ELSE 1 END) *
               ((abs(num) * 1000000) // abs(den)) END)::BIGINT AS slope_ppm,
             (CASE WHEN den = 0 THEN NULL ELSE
               (CASE WHEN ((sy*den - num*sx) < 0) != (den < 0)
                     THEN -1 ELSE 1 END) *
               ((abs(sy*den - num*sx) * 1000) // abs(n*den)) END)::BIGINT
               AS intercept_milli
      FROM t
    """,

    "q_event_paths" -> """
      WITH o AS (SELECT user_id, event_type,
                   lead(event_type, 1) OVER w AS e2,
                   lead(event_type, 2) OVER w AS e3
                 FROM events
                 WINDOW w AS (PARTITION BY user_id
                              ORDER BY epoch_ns(ts) // 1000, event_id))
      SELECT event_type AS s1, e2 AS s2, e3 AS s3, count(*) AS n
      FROM o WHERE e3 IS NOT NULL GROUP BY 1, 2, 3
    """,

    "q_bpe_merge" -> """
      WITH d AS (SELECT lower(substring(text, 1, 512)) AS t FROM documents
                 WHERE length(text) >= 2),
      p AS (SELECT unnest(list_transform(range(1, length(t)),
                                         i -> substring(t, i, 2))) AS pair
            FROM d),
      tot AS (SELECT count(*) AS total FROM p)
      SELECT pair, count(*) AS n FROM p, tot
      GROUP BY pair, total HAVING count(*) * 1000 >= total
    """,

    // 3 unrolled peels: degree → survivors → edge restriction
    "q_kcore" -> """
      WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      e0 AS (SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS w
             FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                                AND a.l_partkey < b.l_partkey
             GROUP BY 1, 2),
      e AS (SELECT u, v FROM e0 WHERE w >= 2),
      s0 AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
      k1 AS (SELECT u FROM s0 GROUP BY u HAVING count(*) >= 2),
      s1 AS (SELECT u, v FROM s0 WHERE u IN (SELECT u FROM k1)
                                   AND v IN (SELECT u FROM k1)),
      k2 AS (SELECT u FROM s1 GROUP BY u HAVING count(*) >= 2),
      s2 AS (SELECT u, v FROM s1 WHERE u IN (SELECT u FROM k2)
                                   AND v IN (SELECT u FROM k2)),
      k3 AS (SELECT u FROM s2 GROUP BY u HAVING count(*) >= 2),
      s3 AS (SELECT u, v FROM s2 WHERE u IN (SELECT u FROM k3)
                                   AND v IN (SELECT u FROM k3))
      SELECT u AS node, count(*) AS deg FROM s3 GROUP BY u
    """,

    "q_mad" -> """
      WITH d AS (SELECT l_returnflag AS rf,
                        floor(l_extendedprice * 100 + 0.5)::BIGINT AS v
                 FROM lineitem),
      bv AS (SELECT rf, v, count(*) AS w FROM d GROUP BY 1, 2),
      c AS (SELECT rf, v,
                   sum(w) OVER (PARTITION BY rf ORDER BY v
                                ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(w) OVER (PARTITION BY rf) AS total
            FROM bv),
      med AS (SELECT rf, min(v) AS median FROM c
              WHERE cum * 2 >= total GROUP BY rf),
      dev AS (SELECT d.rf, abs(v - median) AS dv
              FROM d JOIN med ON d.rf = med.rf),
      bv2 AS (SELECT rf, dv, count(*) AS w FROM dev GROUP BY 1, 2),
      c2 AS (SELECT rf, dv,
                    sum(w) OVER (PARTITION BY rf ORDER BY dv
                                 ROWS UNBOUNDED PRECEDING) AS cum,
                    sum(w) OVER (PARTITION BY rf) AS total
             FROM bv2),
      mad AS (SELECT rf, min(dv) AS mad FROM c2
              WHERE cum * 2 >= total GROUP BY rf)
      SELECT rf, median, mad FROM med JOIN mad USING (rf)
    """,

    "q_entity_match" -> """
      WITH n AS (SELECT DISTINCT p_name AS name,
                        split_part(p_name, ' ', -1) AS blk
                 FROM part)
      SELECT a.name AS name_a, b.name AS name_b,
             levenshtein(a.name, b.name)::INT AS dist
      FROM n a JOIN n b ON a.blk = b.blk AND a.name < b.name
      WHERE levenshtein(a.name, b.name) <= 3
    """,

    "q_quartile_assign" -> """
      WITH d AS (SELECT l_orderkey, l_linenumber, l_returnflag,
                        l_quantity::BIGINT AS qty
                 FROM lineitem)
      SELECT l_orderkey, l_linenumber, l_returnflag, qty,
             ((rank() OVER (PARTITION BY l_returnflag ORDER BY qty) - 1) * 4
              // count(*) OVER (PARTITION BY l_returnflag))::BIGINT AS quartile
      FROM d
    """,

    "q_rolling_slope" -> """
      WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us,
                        floor(value * 1000)::BIGINT AS y
                 FROM events),
      x AS (SELECT *, row_number() OVER w AS x FROM e
            WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
      s AS (SELECT user_id, event_id,
                   count(*) OVER f AS cnt,
                   sum(x) OVER f AS sx, sum(y) OVER f AS sy,
                   sum(x * y) OVER f AS sxy
            FROM x
            WINDOW f AS (PARTITION BY user_id ORDER BY ts_us, event_id
                         ROWS BETWEEN 9 PRECEDING AND CURRENT ROW))
      SELECT user_id, event_id,
             ((CASE WHEN 10 * sxy - sx * sy < 0 THEN -1 ELSE 1 END) *
              (abs(10 * sxy - sx * sy) * 1000000 // 825))::BIGINT AS slope_ppm
      FROM s WHERE cnt = 10
    """,

    // same dominance relation as the Spark window form, stated as the
    // textbook anti-join (fine at oracle scale, quadratic in general)
    "q_skyline" -> """
      WITH p AS (SELECT p_type, p_partkey,
                        floor(p_retailprice * 100 + 0.5)::BIGINT AS cents,
                        p_size::BIGINT AS size
                 FROM part)
      SELECT p_type, p_partkey, cents, size FROM p a
      WHERE NOT EXISTS (SELECT 1 FROM p b
                        WHERE b.p_type = a.p_type
                          AND b.cents <= a.cents AND b.size <= a.size
                          AND (b.cents < a.cents OR b.size < a.size))
    """,

    "q_mode" -> """
      WITH c AS (SELECT p_type, p_brand, count(*) AS n FROM part GROUP BY 1, 2),
      r AS (SELECT *, row_number() OVER (PARTITION BY p_type
                                         ORDER BY n DESC, p_brand) AS rk
            FROM c)
      SELECT p_type, p_brand AS mode_brand, n FROM r WHERE rk = 1
    """,

    "q_throttle" -> """
      WITH e AS (SELECT user_id, event_type, event_id,
                        epoch_ns(ts) // 1000 AS ts_us FROM events),
      l AS (SELECT *, lag(ts_us) OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts_us, event_id) AS prev_us
            FROM e)
      SELECT user_id, event_type, event_id FROM l
      WHERE prev_us IS NULL OR ts_us - prev_us >= 60000000
    """,

    "q_benford" -> """
      WITH d AS (SELECT substring((floor(o_totalprice * 100 + 0.5)::BIGINT)::VARCHAR,
                                  1, 1) AS digit
                 FROM orders WHERE floor(o_totalprice * 100 + 0.5) > 0),
      c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
      t AS (SELECT sum(n) AS total FROM c)
      SELECT digit, n, (n::HUGEINT * 1000000 // total)::BIGINT AS share_ppm
      FROM c, t
    """,

    "q_hhi" -> """
      WITH pc AS (SELECT c_nationkey, c_custkey, count(*) AS cnt
                  FROM orders JOIN customer ON o_custkey = c_custkey
                  GROUP BY 1, 2),
      sh AS (SELECT c_nationkey,
                    cnt * 1000000 // sum(cnt) OVER (PARTITION BY c_nationkey)
                      AS share_ppm
             FROM pc)
      SELECT c_nationkey, count(*) AS n_customers,
             sum(share_ppm * share_ppm)::BIGINT AS hhi_pps
      FROM sh GROUP BY 1
    """,

    "q_token_bigrams" -> s"""
      WITH d AS (SELECT list_filter($duckToks, x -> x <> '') AS t
                 FROM documents),
      bg0 AS (SELECT unnest(list_transform(range(1, len(t)),
                                           i -> t[i] || ' ' || t[i+1]))
                AS bigram
              FROM d WHERE len(t) >= 2),
      bg AS (SELECT bigram, count(*) AS n FROM bg0 GROUP BY 1),
      uni AS (SELECT split_part(bigram, ' ', 1) AS w1, sum(n) AS n_w1
              FROM bg GROUP BY 1)
      SELECT bigram, n, (n::HUGEINT * 1000000 // n_w1)::BIGINT AS cond_ppm
      FROM bg JOIN uni ON split_part(bigram, ' ', 1) = w1
      WHERE n >= 10
    """,

    "q_budget_select" -> """
      WITH w AS (SELECT source AS k, sum(n_chars)::HUGEINT AS wt
                 FROM documents GROUP BY 1),
      t AS (SELECT sum(wt) AS tot FROM w),
      b AS (SELECT k, wt, (wt * 200) // tot AS base_quota,
                   (wt * 200) % tot AS rem FROM w, t),
      u AS (SELECT sum(base_quota) AS used FROM b),
      r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, k) AS rk FROM b),
      q AS (SELECT k AS source,
                   base_quota + CASE WHEN rk <= 200 - used THEN 1 ELSE 0 END
                     AS quota
            FROM r, u),
      ranked AS (SELECT doc_id, source,
                        row_number() OVER (PARTITION BY source
                                           ORDER BY n_chars DESC, doc_id)
                          AS rn
                 FROM documents)
      SELECT doc_id, ranked.source FROM ranked JOIN q USING (source)
      WHERE rn <= quota
    """,

    "q_vocab_overlap" -> s"""
      WITH occ AS (SELECT DISTINCT source,
                          unnest(list_filter($duckToks, x -> x <> ''))
                            AS token
                   FROM documents),
      vocab AS (SELECT source, count(*) AS v FROM occ GROUP BY 1),
      p AS (SELECT a.source AS src_a, b.source AS src_b, count(*) AS inter
            FROM occ a JOIN occ b ON a.token = b.token
                                 AND a.source < b.source
            GROUP BY 1, 2)
      SELECT src_a, src_b, inter, va.v AS vocab_a, vb.v AS vocab_b,
             (inter::HUGEINT * 1000000 // (va.v + vb.v - inter))::BIGINT
               AS jaccard_ppm
      FROM p JOIN vocab va ON va.source = p.src_a
             JOIN vocab vb ON vb.source = p.src_b
    """,

    "q_interleave" -> """
      WITH s AS (SELECT source,
                        row_number() OVER (ORDER BY source) AS src_idx
                 FROM (SELECT DISTINCT source FROM documents))
      SELECT doc_id, d.source,
             row_number() OVER (PARTITION BY d.source ORDER BY doc_id)
               AS round,
             src_idx
      FROM documents d JOIN s USING (source)
    """,

    "q_rolling_distinct" -> """
      WITH ud AS (SELECT DISTINCT user_id,
                         epoch_ns(ts) // 86400000000000 AS day
                  FROM events),
      mx AS (SELECT max(day) AS mxd FROM ud),
      cov AS (SELECT DISTINCT user_id, day + i AS d
              FROM ud, (SELECT unnest(range(0, 7)) AS i))
      SELECT d, count(*) AS n_users FROM cov, mx
      WHERE d <= mxd GROUP BY d
    """,

    "q_period_change" -> """
      WITH daily AS (SELECT o_orderdate::DATE AS day,
                            sum(floor(o_totalprice * 100 + 0.5)::BIGINT)
                              AS cents
                     FROM orders GROUP BY 1),
      l AS (SELECT *, lag(cents) OVER (PARTITION BY year(day)
                                       ORDER BY day) AS prev_cents
            FROM daily)
      SELECT day, cents::BIGINT AS cents, prev_cents::BIGINT AS prev_cents,
             ((CASE WHEN cents < prev_cents THEN -1 ELSE 1 END) *
              (abs(cents - prev_cents) * 1000000 // prev_cents))::BIGINT
               AS change_ppm
      FROM l WHERE prev_cents IS NOT NULL
    """,

    "q_sketch_intersect" -> """
      WITH ha AS (SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT
                    AS h FROM events WHERE event_type = 'click'),
      ra AS (SELECT (h % 256)::BIGINT AS register,
                    max(CASE WHEN (h >> 8) = 0 THEN 53
                             ELSE 53 - length(bin(h >> 8)) END)::BIGINT
                      AS rho_a
             FROM ha GROUP BY 1),
      hb AS (SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT
                    AS h FROM events WHERE event_type = 'purchase'),
      rb AS (SELECT (h % 256)::BIGINT AS register,
                    max(CASE WHEN (h >> 8) = 0 THEN 53
                             ELSE 53 - length(bin(h >> 8)) END)::BIGINT
                      AS rho_b
             FROM hb GROUP BY 1),
      j AS (SELECT coalesce(rho_a, 0) AS ra, coalesce(rho_b, 0) AS rb,
                   greatest(coalesce(rho_a, 0), coalesce(rho_b, 0)) AS ru
            FROM ra FULL OUTER JOIN rb ON ra.register = rb.register)
      SELECT count(*)::BIGINT AS n_obs,
             sum(ra)::BIGINT AS sum_rho_a, sum(rb)::BIGINT AS sum_rho_b,
             sum(ru)::BIGINT AS sum_rho_union,
             (sum(1::BIGINT << (53 - ra)::INT) +
              (256 - count(*)) * (1::BIGINT << 53))::BIGINT AS inv_a,
             (sum(1::BIGINT << (53 - rb)::INT) +
              (256 - count(*)) * (1::BIGINT << 53))::BIGINT AS inv_b,
             (sum(1::BIGINT << (53 - ru)::INT) +
              (256 - count(*)) * (1::BIGINT << 53))::BIGINT AS inv_union
      FROM j
    """,

    "q_multitouch" -> """
      WITH e AS (SELECT event_id, user_id, event_type,
                        epoch_ns(ts) // 1000 AS us
                 FROM events),
      t AS (SELECT b.event_id AS purchase_id, c.event_id AS click_id,
                   c.us AS click_us
            FROM e b JOIN e c ON b.user_id = c.user_id
            WHERE b.event_type = 'purchase' AND c.event_type = 'click'
              AND c.us <= b.us AND b.us - c.us <= 86400000000),
      r AS (SELECT *, count(*) OVER (PARTITION BY purchase_id) AS n,
                   row_number() OVER (PARTITION BY purchase_id
                                      ORDER BY click_us, click_id) AS rk
            FROM t)
      SELECT purchase_id, click_id,
             (1000000 // n + CASE WHEN rk <= 1000000 % n THEN 1 ELSE 0 END)
               ::BIGINT AS credit_ppm
      FROM r
    """,

    "q_capped_balance" -> """
      WITH d AS (SELECT l_partkey, l_shipdate, l_orderkey, l_linenumber,
                        (CASE WHEN l_linestatus = 'F' THEN l_quantity
                              ELSE -l_quantity END)::BIGINT AS delta
                 FROM lineitem),
      p1 AS (SELECT *, sum(delta) OVER w AS prefix FROM d
             WINDOW w AS (PARTITION BY l_partkey
                          ORDER BY l_shipdate, l_orderkey, l_linenumber
                          ROWS UNBOUNDED PRECEDING)),
      p2 AS (SELECT *, least(0, min(prefix) OVER w) AS low FROM p1
             WINDOW w AS (PARTITION BY l_partkey
                          ORDER BY l_shipdate, l_orderkey, l_linenumber
                          ROWS UNBOUNDED PRECEDING))
      SELECT l_partkey, l_orderkey, l_linenumber, delta,
             (prefix - low)::BIGINT AS balance
      FROM p2
    """,

    "q_share_of_parent" -> """
      WITH vol AS (SELECT n_regionkey, n_nationkey, count(*) AS n_orders
                   FROM orders JOIN customer ON o_custkey = c_custkey
                               JOIN nation ON c_nationkey = n_nationkey
                   GROUP BY 1, 2)
      SELECT n_regionkey, n_nationkey, n_orders,
             sum(n_orders) OVER (PARTITION BY n_regionkey)::BIGINT
               AS region_orders,
             (n_orders * 1000000 //
              sum(n_orders) OVER (PARTITION BY n_regionkey))::BIGINT
               AS share_ppm
      FROM vol
    """,

    "q_dwell_time" -> """
      WITH e AS (SELECT user_id, event_type, event_id,
                        epoch_ns(ts) // 1000 AS us FROM events),
      l AS (SELECT *, lead(us) OVER (PARTITION BY user_id
                                     ORDER BY us, event_id) AS next_us
            FROM e)
      SELECT user_id, event_type,
             sum(next_us - us)::BIGINT AS dwell_us,
             count(*) AS n_spells
      FROM l WHERE next_us IS NOT NULL
      GROUP BY 1, 2
    """,

    "q_table_checksum" -> """
      WITH h AS (SELECT ('0x' || substr(md5(
                   o_orderkey::VARCHAR || o_custkey::VARCHAR ||
                   o_orderstatus ||
                   (floor(o_totalprice * 100 + 0.5)::BIGINT)::VARCHAR ||
                   strftime(o_orderdate, '%Y-%m-%d') ||
                   o_orderpriority), 1, 15))::BIGINT AS h
                 FROM orders)
      SELECT bit_xor(h)::BIGINT AS xor_hash, count(*) AS n_rows,
             sum(h % 1000000007)::BIGINT AS mod_sum
      FROM h
    """,

    "q_burstiness" -> """
      WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events),
      c AS (SELECT user_id,
                   count(*) OVER (PARTITION BY user_id ORDER BY us
                                  RANGE BETWEEN 3599999999 PRECEDING
                                        AND CURRENT ROW) AS in_hour
            FROM e)
      SELECT user_id, max(in_hour)::BIGINT AS peak_hourly,
             count(*) AS n_events
      FROM c GROUP BY 1
    """,

    "q_weighted_path" -> """
      WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
      e0 AS (SELECT a.l_suppkey AS u, b.l_suppkey AS v, count(*) AS w
             FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                                AND a.l_suppkey < b.l_suppkey
             GROUP BY 1, 2),
      e AS (SELECT u, v, (1000000 // w)::BIGINT AS cost FROM e0 WHERE w >= 5),
      sym AS (SELECT u, v, min(cost) AS cost FROM
                (SELECT u, v, cost FROM e
                 UNION ALL SELECT v, u, cost FROM e) GROUP BY 1, 2),
      d0 AS (SELECT DISTINCT s_suppkey AS node, 0::BIGINT AS cost
             FROM supplier WHERE s_suppkey < 3),
      r1 AS (SELECT node, min(cost) AS cost FROM (
               SELECT node, cost FROM d0
               UNION ALL
               SELECT sym.v, d0.cost + sym.cost FROM d0
               JOIN sym ON sym.u = d0.node) GROUP BY 1),
      r2 AS (SELECT node, min(cost) AS cost FROM (
               SELECT node, cost FROM r1
               UNION ALL
               SELECT sym.v, r1.cost + sym.cost FROM r1
               JOIN sym ON sym.u = r1.node) GROUP BY 1),
      r3 AS (SELECT node, min(cost) AS cost FROM (
               SELECT node, cost FROM r2
               UNION ALL
               SELECT sym.v, r2.cost + sym.cost FROM r2
               JOIN sym ON sym.u = r2.node) GROUP BY 1)
      SELECT node, cost::BIGINT AS cost FROM r3
    """,

    "q_rank_movers" -> """
      WITH rev AS (SELECT p_brand,
                          CASE WHEN year(l_shipdate) < 1997
                               THEN 'early' ELSE 'late' END AS period,
                          p_partkey,
                          sum(floor(l_extendedprice * 100 + 0.5)::BIGINT)
                            AS rev
                   FROM lineitem JOIN part ON l_partkey = p_partkey
                   GROUP BY 1, 2, 3),
      rk AS (SELECT *, row_number() OVER (PARTITION BY p_brand, period
                                          ORDER BY rev DESC, p_partkey)
                        AS rk
             FROM rev)
      SELECT e.p_brand, e.p_partkey, e.rk AS rk_early, l.rk AS rk_late,
             (e.rk - l.rk)::BIGINT AS delta
      FROM rk e JOIN rk l ON e.p_brand = l.p_brand
                         AND e.p_partkey = l.p_partkey
      WHERE e.period = 'early' AND l.period = 'late'
    """,

    "q_winsorize" -> """
      WITH d AS (SELECT l_returnflag AS rf,
                        floor(l_extendedprice * 100 + 0.5)::BIGINT AS v
                 FROM lineitem),
      bv AS (SELECT rf, v, count(*) AS w FROM d GROUP BY 1, 2),
      c AS (SELECT rf, v,
                   sum(w) OVER (PARTITION BY rf ORDER BY v
                                ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(w) OVER (PARTITION BY rf) AS total
            FROM bv),
      lo AS (SELECT rf, min(v) AS p05 FROM c
             WHERE cum * 20 >= total GROUP BY rf),
      hi AS (SELECT rf, min(v) AS p95 FROM c
             WHERE cum * 20 >= total * 19 GROUP BY rf)
      SELECT rf, p05, p95,
             sum(greatest(p05, least(p95, v)))::BIGINT AS winsorized_cents,
             count(*) AS n
      FROM d JOIN lo USING (rf) JOIN hi USING (rf)
      GROUP BY 1, 2, 3
    """,

    "q_gini" -> """
      WITH pc AS (SELECT c_nationkey, c_custkey, count(*) AS x
                  FROM orders JOIN customer ON o_custkey = c_custkey
                  GROUP BY 1, 2),
      r AS (SELECT *, row_number() OVER (PARTITION BY c_nationkey
                                         ORDER BY x, c_custkey) AS i
            FROM pc)
      SELECT c_nationkey, count(*) AS n, sum(x)::BIGINT AS sx,
             ((2 * sum(i * x) - (count(*) + 1) * sum(x)) * 1000000 //
              (count(*) * sum(x)))::BIGINT AS gini_ppm
      FROM r GROUP BY 1
    """,

    "q_seasonality" -> """
      WITH d AS (SELECT isodow(o_orderdate)::BIGINT AS iso_dow FROM orders),
      c AS (SELECT iso_dow, count(*) AS n FROM d GROUP BY 1),
      t AS (SELECT sum(n) AS total FROM c)
      SELECT iso_dow, n, (n * 1000000 // total)::BIGINT AS share_ppm
      FROM c, t
    """,

    // 3 unrolled greedy rounds; same trigram derivation as
    // q_containment's oracle
    "q_max_coverage" -> s"""
      WITH d AS (SELECT doc_id, $duckToks AS t FROM documents),
      g AS (SELECT DISTINCT doc_id, g FROM (
              SELECT doc_id, unnest(list_distinct(list_transform(
                range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))))
                AS g
              FROM d WHERE len(t) >= 3)),
      p1 AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1
             ORDER BY n DESC, doc_id LIMIT 1),
      r1 AS (SELECT * FROM g
             WHERE doc_id != (SELECT doc_id FROM p1)
               AND g NOT IN (SELECT g.g FROM g JOIN p1 USING (doc_id))),
      p2 AS (SELECT doc_id, count(*) AS n FROM r1 GROUP BY 1
             ORDER BY n DESC, doc_id LIMIT 1),
      r2 AS (SELECT * FROM r1
             WHERE doc_id != (SELECT doc_id FROM p2)
               AND g NOT IN (SELECT r1.g FROM r1 JOIN p2 USING (doc_id))),
      p3 AS (SELECT doc_id, count(*) AS n FROM r2 GROUP BY 1
             ORDER BY n DESC, doc_id LIMIT 1)
      SELECT 1::BIGINT AS pick_order, doc_id, n::BIGINT AS new_grams FROM p1
      UNION ALL
      SELECT 2::BIGINT, doc_id, n::BIGINT FROM p2
      UNION ALL
      SELECT 3::BIGINT, doc_id, n::BIGINT FROM p3
    """,

    "q_ab_assign" -> """
      WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
      v AS (SELECT event_type,
                   CASE WHEN ('0x' || substr(md5('exp1:' || user_id::VARCHAR),
                                             1, 15))::BIGINT % 100 < 50
                        THEN 'A' ELSE 'B' END AS variant
            FROM u)
      SELECT event_type,
             sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END)::BIGINT AS n_a,
             sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END)::BIGINT AS n_b,
             (sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) -
              sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END))::BIGINT AS delta
      FROM v GROUP BY 1
    """,

    "q_streaks" -> """
      WITH ud AS (SELECT DISTINCT user_id,
                         epoch_ns(ts) // 86400000000000 AS day
                  FROM events),
      g AS (SELECT user_id, day,
                   day - row_number() OVER (PARTITION BY user_id
                                            ORDER BY day) AS grp
            FROM ud),
      st AS (SELECT user_id, grp, count(*) AS len, min(day) AS start_day
             FROM g GROUP BY 1, 2),
      best AS (SELECT *, row_number() OVER (PARTITION BY user_id
                                            ORDER BY len DESC, start_day)
                          AS rk
               FROM st)
      SELECT b.user_id, b.len AS longest_streak,
             b.start_day AS streak_start_day, n.n_streaks
      FROM best b JOIN (SELECT user_id, count(*) AS n_streaks FROM st
                        GROUP BY 1) n USING (user_id)
      WHERE rk = 1
    """,

    "q_percentile_rank" -> """
      WITH d AS (SELECT o_orderkey, o_orderpriority,
                        floor(o_totalprice * 100 + 0.5)::BIGINT AS cents
                 FROM orders)
      SELECT o_orderkey, o_orderpriority, cents,
             ((rank() OVER (PARTITION BY o_orderpriority ORDER BY cents) - 1)
              * 1000000 //
              (count(*) OVER (PARTITION BY o_orderpriority) - 1))::BIGINT
               AS pct_rank_ppm
      FROM d
    """,

    "q_lag_features" -> """
      WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us,
                        floor(value * 1000)::BIGINT AS v_milli
                 FROM events)
      SELECT user_id, event_id, v_milli,
             lag(v_milli, 1) OVER w AS lag1,
             lag(v_milli, 2) OVER w AS lag2,
             (sum(v_milli) OVER f)::BIGINT AS roll5_sum,
             count(*) OVER f AS roll5_n
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id),
             f AS (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """,

    "q_target_encode" -> """
      WITH d AS (SELECT o_orderkey, o_orderpriority,
                        floor(o_totalprice * 100 + 0.5)::BIGINT AS cents
                 FROM orders),
      s AS (SELECT *, sum(cents) OVER (PARTITION BY o_orderpriority) AS sum_c,
                   count(*) OVER (PARTITION BY o_orderpriority) AS n
            FROM d)
      SELECT o_orderkey, o_orderpriority,
             ((sum_c - cents) * 1000 // (n - 1))::BIGINT AS loo_milli
      FROM s WHERE n > 1
    """,

    "q_ab_outcomes" -> """
      WITH u AS (SELECT DISTINCT user_id FROM events),
      v AS (SELECT user_id,
                   CASE WHEN ('0x' || substr(md5('exp1:' || user_id::VARCHAR),
                                             1, 15))::BIGINT % 100 < 50
                        THEN 'A' ELSE 'B' END AS variant
            FROM u),
      c AS (SELECT DISTINCT user_id FROM events
            WHERE event_type = 'purchase')
      SELECT variant,
             sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_converted,
             count(*) AS n_users,
             ((sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
               * 1000000) // count(*))::BIGINT AS conv_ppm
      FROM v LEFT JOIN c USING (user_id)
      GROUP BY 1
    """,

    "q_autocorr" -> """
      WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us,
                        floor(value * 1000)::BIGINT AS x
                 FROM events),
      l AS (SELECT *, lead(x) OVER (PARTITION BY user_id
                                    ORDER BY us, event_id) AS x_next
            FROM e)
      SELECT user_id, count(*) AS n_pairs,
             sum(x * x_next)::BIGINT AS sxy,
             sum(x)::BIGINT AS sx, sum(x_next)::BIGINT AS sy,
             sum(x * x)::BIGINT AS sxx
      FROM l WHERE x_next IS NOT NULL
      GROUP BY 1
    """,

    "q_rfm" -> """
      WITH per AS (SELECT o_custkey, max(o_orderdate::DATE) AS last_day,
                          count(*) AS freq,
                          sum(floor(o_totalprice * 100 + 0.5)::BIGINT)
                            AS monetary
                   FROM orders GROUP BY 1),
      rk AS (SELECT o_custkey,
                    row_number() OVER (ORDER BY last_day, o_custkey) AS r1,
                    row_number() OVER (ORDER BY freq, o_custkey) AS r2,
                    row_number() OVER (ORDER BY monetary, o_custkey) AS r3,
                    count(*) OVER () AS n
             FROM per)
      SELECT o_custkey,
             ((r1 - 1) * 4 // n)::BIGINT AS r_code,
             ((r2 - 1) * 4 // n)::BIGINT AS f_code,
             ((r3 - 1) * 4 // n)::BIGINT AS m_code,
             (((r1 - 1) * 4 // n) * 100 + ((r2 - 1) * 4 // n) * 10 +
              ((r3 - 1) * 4 // n))::BIGINT AS rfm
      FROM rk
    """,

    "q_pareto_8020" -> """
      WITH per AS (SELECT o_custkey,
                          sum(floor(o_totalprice * 100 + 0.5)::BIGINT) AS rev
                   FROM orders GROUP BY 1),
      rk AS (SELECT *, row_number() OVER (ORDER BY rev DESC, o_custkey) AS rk,
                    sum(rev) OVER () AS total_rev,
                    count(*) OVER () AS n_cust
             FROM per)
      SELECT n_cust, count(*) AS top_cust, total_rev::BIGINT AS total_rev,
             sum(rev)::BIGINT AS top_rev,
             ((sum(rev) * 1000000) // total_rev)::BIGINT AS top_share_ppm
      FROM rk WHERE rk * 5 <= n_cust + 4
      GROUP BY n_cust, total_rev
    """,

    // CUSUM via the same prefix − running-min identity the Spark side
    // inherits from cappedBalance (positive mean ⇒ div ≡ //)
    "q_cusum" -> """
      WITH e AS (SELECT event_id, user_id, event_type, ts,
                        floor(value * 100 + 0.5)::BIGINT AS cents
                 FROM events WHERE value IS NOT NULL),
      m AS (SELECT event_type, sum(cents) // count(*) AS mean_c
            FROM e GROUP BY 1),
      d AS (SELECT e.*, cents - mean_c AS delta, mean_c
            FROM e JOIN m USING (event_type)),
      p AS (SELECT *, sum(delta) OVER w AS prefix FROM d
            WINDOW w AS (PARTITION BY user_id, event_type
                         ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)),
      c AS (SELECT *, prefix - least(0, min(prefix) OVER w2) AS cusum
            FROM p
            WINDOW w2 AS (PARTITION BY user_id, event_type
                          ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING))
      SELECT event_id, user_id, event_type,
             delta::BIGINT AS delta, cusum::BIGINT AS cusum,
             (CASE WHEN cusum > mean_c * 4 THEN 1 ELSE 0 END)::BIGINT
               AS alarm
      FROM c
    """,

    "q_lorenz" -> """
      WITH per AS (SELECT o_custkey,
                          sum(floor(o_totalprice * 100 + 0.5)::BIGINT) AS rev
                   FROM orders GROUP BY 1),
      rk AS (SELECT *, row_number() OVER (ORDER BY rev, o_custkey) AS rk,
                    count(*) OVER () AS n, sum(rev) OVER () AS total_rev
             FROM per),
      dec AS (SELECT (rk - 1) * 10 // n AS decile, total_rev,
                     count(*) AS n_cust, sum(rev) AS dec_rev
              FROM rk GROUP BY 1, 2)
      SELECT decile, n_cust, dec_rev::BIGINT AS dec_rev,
             (sum(dec_rev) OVER w)::BIGINT AS cum_rev,
             ((sum(dec_rev) OVER w) * 1000000 // total_rev)::BIGINT
               AS cum_share_ppm
      FROM dec
      WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)
    """,

    "q_chisq" -> """
      WITH o AS (SELECT o_orderpriority AS pri, o_orderstatus AS st
                 FROM orders),
      obs AS (SELECT pri, st, count(*) AS obs FROM o GROUP BY 1, 2),
      rt AS (SELECT pri, count(*) AS row_tot FROM o GROUP BY 1),
      ct AS (SELECT st, count(*) AS col_tot FROM o GROUP BY 1),
      n AS (SELECT count(*) AS n FROM o)
      SELECT pri, st, obs, row_tot, col_tot, n,
             ((row_tot::HUGEINT * col_tot * 1000000) // n)::BIGINT
               AS expected_micro,
             (((n::HUGEINT * obs - row_tot::HUGEINT * col_tot) *
               (n::HUGEINT * obs - row_tot::HUGEINT * col_tot) * 1000000) //
              (n::HUGEINT * row_tot * col_tot))::BIGINT AS chi_micro
      FROM obs JOIN rt USING (pri) JOIN ct USING (st) CROSS JOIN n
    """,

    // +1e6 cents shift keeps the bucket div on non-negatives, where
    // Spark `div` (truncate) and DuckDB `//` (floor) agree
    "q_k_anon" -> """
      WITH c AS (SELECT c_nationkey::BIGINT AS nation,
                        c_mktsegment AS segment,
                        (floor(c_acctbal * 100 + 0.5)::BIGINT + 1000000)
                          // 100000 AS bal_bucket
                 FROM customer),
      fine AS (SELECT nation, segment, bal_bucket, count(*) AS k_fine
               FROM c GROUP BY 1, 2, 3),
      coarse AS (SELECT nation, segment, count(*) AS k_coarse
                 FROM c GROUP BY 1, 2)
      SELECT nation, segment, bal_bucket, k_fine, k_coarse,
             (CASE WHEN k_fine < 5 THEN 1 ELSE 0 END)::BIGINT AS risky,
             (CASE WHEN k_fine < 5 AND k_coarse >= 5 THEN 1 ELSE 0 END)::BIGINT
               AS generalize_rescues
      FROM fine JOIN coarse USING (nation, segment)
    """,

    "q_quantile_norm" -> """
      WITH d AS (SELECT doc_id, source, n_chars FROM documents),
      ranked AS (SELECT *,
                        row_number() OVER (PARTITION BY source
                                           ORDER BY n_chars, doc_id) AS rk,
                        count(*) OVER (PARTITION BY source) AS n_src
                 FROM d),
      p AS (SELECT *, CASE WHEN n_src > 1
                           THEN (rk - 1) * 1000000 // (n_src - 1)
                           ELSE 0 END AS p_ppm
            FROM ranked),
      vals AS (SELECT n_chars AS pool_chars, count(*) AS cnt,
                      sum(count(*)) OVER (ORDER BY n_chars
                        ROWS UNBOUNDED PRECEDING) AS cum
               FROM d GROUP BY n_chars),
      v AS (SELECT pool_chars, cum::BIGINT AS cum,
                   (cum - cnt)::BIGINT AS cum_before
            FROM vals),
      tot AS (SELECT count(*) AS n_tot FROM d)
      SELECT doc_id, source, n_chars, p_ppm,
             pool_chars AS norm_chars
      FROM p CROSS JOIN tot
      JOIN v ON (1 + p_ppm * (n_tot - 1) // 1000000) > cum_before
            AND (1 + p_ppm * (n_tot - 1) // 1000000) <= cum
    """,

    "q_churn_risk" -> """
      WITH e AS (SELECT user_id, epoch_ns(ts) // 1000000 AS ms
                 FROM events),
      per AS (SELECT user_id, min(ms) AS first_ms, max(ms) AS last_ms,
                     count(*) AS n_events
              FROM e GROUP BY 1 HAVING count(*) > 1),
      g AS (SELECT *, (last_ms - first_ms) // (n_events - 1) AS mean_gap_ms,
                   (SELECT max(ms) FROM e) - last_ms AS idle_ms
            FROM per)
      SELECT user_id, n_events, mean_gap_ms, idle_ms,
             idle_ms * 1000000 // mean_gap_ms AS overdue_ppm,
             (CASE WHEN idle_ms * 1000000 // mean_gap_ms > 3000000
                   THEN 1 ELSE 0 END)::BIGINT AS at_risk
      FROM g WHERE mean_gap_ms > 0
    """,

    "q_growth_accounting" -> """
      WITH um AS (SELECT DISTINCT user_id,
                         epoch_ns(ts) // 86400000000000 AS m_idx
                  FROM events),
      s AS (SELECT *,
                   min(m_idx) OVER (PARTITION BY user_id) AS first_m,
                   lag(m_idx) OVER (PARTITION BY user_id
                                    ORDER BY m_idx) AS prev_m,
                   lead(m_idx) OVER (PARTITION BY user_id
                                     ORDER BY m_idx) AS next_m
            FROM um)
      SELECT m_idx, count(*) AS n_active,
             sum(CASE WHEN m_idx = first_m THEN 1 ELSE 0 END)::BIGINT
               AS n_new,
             sum(CASE WHEN prev_m = m_idx - 1 THEN 1 ELSE 0 END)::BIGINT
               AS n_retained,
             sum(CASE WHEN m_idx > first_m
                       AND (prev_m IS NULL OR prev_m < m_idx - 1)
                      THEN 1 ELSE 0 END)::BIGINT AS n_resurrected,
             sum(CASE WHEN next_m IS NULL OR next_m > m_idx + 1
                      THEN 1 ELSE 0 END)::BIGINT AS n_churned_after
      FROM s GROUP BY 1
    """,

    "q_pps_sample" -> """
      WITH per AS (SELECT o_custkey,
                          sum(floor(o_totalprice * 100 + 0.5)::BIGINT)
                            ::BIGINT AS rev
                   FROM orders GROUP BY 1),
      c AS (SELECT *,
                   sum(rev) OVER (ORDER BY o_custkey
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(rev) OVER () AS total_rev
            FROM per),
      g AS (SELECT *, total_rev // 500 AS stride,
                   (total_rev // 500) // 2 AS off
            FROM c WHERE total_rev // 500 > 0)
      SELECT * FROM (
        SELECT o_custkey, rev, cum::BIGINT AS cum,
               ((CASE WHEN cum >= off
                      THEN (cum - off) // stride + 1 ELSE 0 END) -
                (CASE WHEN cum - rev >= off
                      THEN (cum - rev - off) // stride + 1 ELSE 0 END)
               )::BIGINT AS n_hits
        FROM g)
      WHERE n_hits > 0
    """,

    "q_contamination_matrix" -> s"""
      WITH $minhashLshCtes,
      ab AS (SELECT least(da.source, db.source) AS src_a,
                    greatest(da.source, db.source) AS src_b
             FROM lsh_pairs p
             JOIN documents da ON p.doc_a = da.doc_id
             JOIN documents db ON p.doc_b = db.doc_id)
      SELECT src_a, src_b, count(*) AS dup_pairs
      FROM ab GROUP BY 1, 2
    """,

    "q_abc_class" -> """
      WITH per AS (SELECT l_partkey,
                          sum(floor(l_extendedprice * 100 + 0.5)::BIGINT)
                            AS rev
                   FROM lineitem GROUP BY 1),
      c AS (SELECT *,
                   sum(rev) OVER (ORDER BY rev DESC, l_partkey
                                  ROWS UNBOUNDED PRECEDING) AS cum,
                   sum(rev) OVER () AS total_rev
            FROM per),
      k AS (SELECT *, cum * 1000000 // total_rev AS cum_ppm FROM c),
      cls AS (SELECT *, CASE WHEN cum_ppm <= 800000 THEN 'A'
                             WHEN cum_ppm <= 950000 THEN 'B'
                             ELSE 'C' END AS abc
              FROM k)
      SELECT abc, count(*) AS n_parts, sum(rev)::BIGINT AS class_rev,
             min(cum_ppm)::BIGINT AS min_cum_ppm,
             max(cum_ppm)::BIGINT AS max_cum_ppm
      FROM cls GROUP BY 1
    """,

    "q_discount_response" -> """
      SELECT floor(l_discount * 100 + 0.5)::BIGINT AS disc_pct,
             count(*) AS n_items,
             sum(l_quantity::BIGINT)::BIGINT AS total_qty,
             sum(floor(l_extendedprice * 100 + 0.5)::BIGINT)::BIGINT
               AS rev_cents,
             (sum(l_quantity::BIGINT) * 1000000 // count(*))::BIGINT
               AS qty_per_item_ppm
      FROM lineitem GROUP BY 1
    """,

    "q_emb_centroid" -> """
      WITH ex AS (SELECT label::BIGINT AS label,
                         unnest(list_transform(range(len(embedding)),
                           i -> {'pos': i,
                                 'v': floor(CAST(embedding[i+1] AS DOUBLE)
                                            * 1000 + 0.5)::BIGINT})) AS u
                  FROM embeddings),
      g AS (SELECT label, u.pos::BIGINT AS pos, count(*) AS n,
                   sum(u.v)::BIGINT AS sum_milli
            FROM ex GROUP BY 1, 2)
      SELECT label, pos, n, sum_milli,
             ((sum_milli + 10000 * n) * 1000 // n - 10000000)::BIGINT
               AS centroid_micro
      FROM g
    """,

    "q_dataset_card" -> """
      SELECT source, count(*) AS n_docs,
             sum(n_chars)::BIGINT AS total_chars,
             count(DISTINCT lang) AS n_langs,
             min(n_chars) AS min_chars, max(n_chars) AS max_chars,
             sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END)::BIGINT
               AS n_short,
             (sum(n_chars) * 1000000 // count(*))::BIGINT
               AS mean_chars_micro,
             (sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) * 1000000
               // count(*))::BIGINT AS short_ppm
      FROM documents GROUP BY 1
    """,

    "q_join_size" -> """
      WITH a AS (SELECT o_custkey AS k, count(*) AS cnt_a
                 FROM orders GROUP BY 1),
      b AS (SELECT user_id AS k, count(*) AS cnt_b
            FROM events GROUP BY 1)
      SELECT sum(cnt_a * cnt_b)::BIGINT AS join_rows,
             count(*) AS shared_keys,
             max(cnt_a * cnt_b)::BIGINT AS max_key_contrib
      FROM a JOIN b USING (k)
    """,

    "q_skew_report" -> """
      WITH s1 AS (SELECT o_custkey::BIGINT AS k FROM orders),
      s2 AS (SELECT l_partkey::BIGINT AS k FROM lineitem),
      s3 AS (SELECT l_suppkey::BIGINT AS k FROM lineitem),
      s4 AS (SELECT user_id::BIGINT AS k FROM events),
      agg AS (
        SELECT 'orders.o_custkey' AS join_key, count(*) AS cnt
        FROM s1 GROUP BY k
        UNION ALL SELECT 'lineitem.l_partkey', count(*)
        FROM s2 GROUP BY k
        UNION ALL SELECT 'lineitem.l_suppkey', count(*)
        FROM s3 GROUP BY k
        UNION ALL SELECT 'events.user_id', count(*)
        FROM s4 GROUP BY k)
      SELECT join_key, sum(cnt)::BIGINT AS n_rows, count(*) AS n_keys,
             max(cnt)::BIGINT AS max_cnt,
             (max(cnt) * 1000000 // sum(cnt))::BIGINT AS top1_ppm,
             (max(cnt) * count(*) * 1000000 // sum(cnt))::BIGINT
               AS skew_ratio_ppm
      FROM agg GROUP BY 1
    """,

    "q_ltv_curve" -> """
      WITH e AS (SELECT user_id,
                        epoch_ns(ts) // 86400000000000 AS day,
                        CASE WHEN event_type = 'purchase'
                             THEN floor(value * 100 + 0.5)::BIGINT
                             ELSE 0 END AS cents
                 FROM events),
      f AS (SELECT user_id, min(day) AS first_day FROM e GROUP BY 1),
      n AS (SELECT count(*) AS n_users FROM f),
      byage AS (SELECT e.day - f.first_day AS age,
                       sum(e.cents)::BIGINT AS age_rev
                FROM e JOIN f USING (user_id) GROUP BY 1)
      SELECT age, age_rev,
             (sum(age_rev) OVER (ORDER BY age
                ROWS UNBOUNDED PRECEDING))::BIGINT AS cum_rev,
             ((sum(age_rev) OVER (ORDER BY age ROWS UNBOUNDED PRECEDING))
               * 1000000 // n_users)::BIGINT AS ltv_micro
      FROM byage CROSS JOIN n
    """,

    "q_conversion_lag" -> """
      WITH per AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view'
                        THEN epoch_ns(ts) // 1000000 END) AS first_view_ms,
               min(CASE WHEN event_type = 'purchase'
                        THEN epoch_ns(ts) // 1000000 END)
                 AS first_purchase_ms
        FROM events GROUP BY 1),
      conv AS (
        SELECT *, first_purchase_ms - first_view_ms AS lag_ms
        FROM per
        WHERE first_view_ms IS NOT NULL AND first_purchase_ms IS NOT NULL
          AND first_purchase_ms >= first_view_ms)
      SELECT lag_ms // 3600000 AS lag_hours, count(*) AS n_users,
             min(lag_ms) AS min_lag_ms, max(lag_ms) AS max_lag_ms
      FROM conv GROUP BY 1
    """,

    "q_survivorship" -> s"""
      WITH RECURSIVE $minhashLshCtes,
      sym AS (SELECT doc_a AS u, doc_b AS v FROM lsh_pairs
              UNION SELECT doc_b, doc_a FROM lsh_pairs),
      reach(a, b) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.a, s.v FROM reach r JOIN sym s ON r.b = s.u
      ),
      comp AS (SELECT a AS node, min(b) AS component FROM reach GROUP BY a),
      lab AS (SELECT c.node, c.component, d.n_chars
              FROM comp c JOIN documents d ON c.node = d.doc_id),
      rk AS (SELECT *, row_number() OVER (PARTITION BY component
                         ORDER BY n_chars DESC, node) AS rk
             FROM lab)
      SELECT component, count(*) AS n_docs,
             min(CASE WHEN rk = 1 THEN node END) AS keep_id,
             max(CASE WHEN rk = 1 THEN n_chars END) AS keep_chars
      FROM rk GROUP BY 1 HAVING count(*) > 1
    """,

    "q_control_chart" -> """
      WITH daily AS (SELECT epoch_ns(ts) // 86400000000000 AS day,
                            count(*) AS n,
                            sum(CASE WHEN event_type = 'error'
                                     THEN 1 ELSE 0 END)::BIGINT AS err
                     FROM events GROUP BY 1),
      tot AS (SELECT sum(n)::BIGINT AS big_n, sum(err)::BIGINT AS big_e
              FROM daily)
      SELECT day, n, err,
             err * 1000000 // n AS rate_ppm,
             big_e * 1000000 // big_n AS base_ppm,
             (CASE WHEN err::HUGEINT * big_n - big_e::HUGEINT * n > 0
                    AND (err::HUGEINT * big_n - big_e::HUGEINT * n) *
                        (err::HUGEINT * big_n - big_e::HUGEINT * n) * big_n >
                        9 * big_e::HUGEINT * (big_n - big_e) * n
                   THEN 1 ELSE 0 END)::BIGINT AS out_of_control
      FROM daily CROSS JOIN tot
    """,

    "q_backlog" -> """
      WITH opens AS (SELECT date_diff('day', DATE '1970-01-01',
                              o_orderdate)::BIGINT AS day,
                            1::BIGINT AS delta
                     FROM orders),
      closes AS (SELECT (date_diff('day', DATE '1970-01-01',
                           max(l_shipdate)) + 1)::BIGINT AS day,
                        (-1)::BIGINT AS delta
                 FROM lineitem GROUP BY l_orderkey),
      d AS (SELECT day, sum(delta)::BIGINT AS net_delta
            FROM (SELECT * FROM opens UNION ALL SELECT * FROM closes)
            GROUP BY 1)
      SELECT day, net_delta,
             (sum(net_delta) OVER (ORDER BY day
                ROWS UNBOUNDED PRECEDING))::BIGINT AS backlog
      FROM d
    """,

    "q_price_index" -> """
      WITH li AS (SELECT p.p_brand AS brand, l.l_partkey,
                         year(l.l_shipdate)::BIGINT AS yr,
                         floor(l.l_extendedprice * 100 + 0.5)::BIGINT
                           AS cents,
                         l.l_quantity::BIGINT AS qty
                  FROM lineitem l JOIN part p
                    ON l.l_partkey = p.p_partkey),
      yrs AS (SELECT min(yr) AS y0, max(yr) AS y1 FROM li),
      uv AS (SELECT brand, l_partkey, yr, y0,
                    sum(cents) * 1000 // sum(qty) AS uv_milli,
                    sum(qty)::BIGINT AS q
             FROM li CROSS JOIN yrs
             WHERE yr = y0 OR yr = y1
             GROUP BY 1, 2, 3, 4),
      base AS (SELECT brand, l_partkey, uv_milli AS uv0, q AS q0
               FROM uv WHERE yr = y0),
      cur AS (SELECT brand, l_partkey, uv_milli AS uv1
              FROM uv WHERE yr <> y0)
      SELECT brand, count(*) AS n_parts,
             sum(uv1 * q0)::BIGINT AS num,
             sum(uv0 * q0)::BIGINT AS den,
             (sum(uv1 * q0) * 1000000 // sum(uv0 * q0))::BIGINT
               AS index_ppm
      FROM base JOIN cur USING (brand, l_partkey)
      GROUP BY 1
    """,

    "q_trimmed_mean" -> """
      WITH c AS (SELECT c_mktsegment AS segment,
                        floor(c_acctbal * 100 + 0.5)::BIGINT AS cents,
                        c_custkey
                 FROM customer),
      r AS (SELECT segment, cents,
                   row_number() OVER (PARTITION BY segment
                                      ORDER BY cents, c_custkey) AS rk,
                   count(*) OVER (PARTITION BY segment) AS n
            FROM c)
      SELECT segment, count(*) AS n_kept,
             (sum(cents + 100000) * 10000 // count(*) - 1000000000
               )::BIGINT AS trimmed_mean_micro
      FROM r WHERE rk > n // 10 AND rk <= n - n // 10
      GROUP BY 1
    """,

    "q_ks_test" -> """
      WITH o AS (SELECT floor(o_totalprice * 100 + 0.5)::BIGINT AS cents,
                        (CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS is_f
                 FROM orders WHERE o_orderstatus IN ('F', 'O')),
      byv AS (SELECT cents, sum(is_f)::BIGINT AS cf,
                     sum(1 - is_f)::BIGINT AS co
              FROM o GROUP BY 1),
      cum AS (SELECT sum(cf) OVER w AS cum_f, sum(co) OVER w AS cum_o
              FROM byv
              WINDOW w AS (ORDER BY cents ROWS UNBOUNDED PRECEDING)),
      tot AS (SELECT sum(is_f)::BIGINT AS n_f,
                     sum(1 - is_f)::BIGINT AS n_o FROM o)
      SELECT n_f, n_o, max(abs(cum_f * n_o - cum_o * n_f))::BIGINT AS d_num,
             (max(abs(cum_f * n_o - cum_o * n_f)) * 1000000
               // (n_f * n_o))::BIGINT AS ks_ppm
      FROM cum CROSS JOIN tot
      GROUP BY 1, 2
    """,

    "q_mann_whitney" -> """
      WITH e AS (SELECT floor(value * 1000000 + 0.5)::BIGINT AS v,
                        (CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS is_a
                 FROM events WHERE event_type IN ('click', 'purchase')),
      byv AS (SELECT v, sum(is_a)::BIGINT AS ca, count(*)::BIGINT AS ct
              FROM e GROUP BY 1),
      ranked AS (SELECT ca, ct,
                        coalesce(sum(ct) OVER (ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0)::BIGINT AS before
                 FROM byv),
      tot AS (SELECT sum(is_a)::BIGINT AS n_a,
                     sum(1 - is_a)::BIGINT AS n_b FROM e)
      SELECT n_a, n_b,
             sum(ca * (2 * before + ct + 1))::BIGINT AS r2_a,
             (sum(ca * (2 * before + ct + 1)) - n_a * (n_a + 1))::BIGINT
               AS u2_a
      FROM ranked CROSS JOIN tot
      GROUP BY 1, 2
    """,

    "q_confusion" -> """
      WITH o AS (SELECT floor(o_totalprice * 100 + 0.5)::BIGINT AS cents,
                        (o_orderstatus = 'F') AS lbl
                 FROM orders),
      c AS (SELECT
              sum(CASE WHEN cents >= 15000000 AND lbl
                       THEN 1 ELSE 0 END)::BIGINT AS tp,
              sum(CASE WHEN cents >= 15000000 AND NOT lbl
                       THEN 1 ELSE 0 END)::BIGINT AS fp,
              sum(CASE WHEN cents < 15000000 AND lbl
                       THEN 1 ELSE 0 END)::BIGINT AS fn,
              sum(CASE WHEN cents < 15000000 AND NOT lbl
                       THEN 1 ELSE 0 END)::BIGINT AS tn
            FROM o),
      m AS (SELECT *,
              (tp * 1000000 // (tp + fp))::BIGINT AS precision_ppm,
              (tp * 1000000 // (tp + fn))::BIGINT AS recall_ppm
            FROM c)
      SELECT tp, fp, fn, tn, precision_ppm, recall_ppm,
             (2 * precision_ppm * recall_ppm
               // (precision_ppm + recall_ppm))::BIGINT AS f1_ppm
      FROM m
    """,

    "q_calibration" -> """
      WITH o AS (SELECT floor(o_totalprice * 100 + 0.5)::BIGINT AS s,
                        (CASE WHEN o_orderstatus = 'F'
                              THEN 1 ELSE 0 END)::BIGINT AS y
                 FROM orders),
      r AS (SELECT s, y, rank() OVER (ORDER BY s) AS rk,
                   count(*) OVER () AS n
            FROM o),
      g AS (SELECT ((rk - 1) * 10 // n)::BIGINT AS bucket,
                   count(*)::BIGINT AS n_rows,
                   sum(y)::BIGINT AS n_pos, sum(s)::BIGINT AS sum_score
            FROM r GROUP BY 1)
      SELECT bucket, n_rows, n_pos,
             (sum_score // n_rows)::BIGINT AS mean_score,
             (n_pos * 1000000 // n_rows)::BIGINT AS pos_rate_ppm
      FROM g
    """,

    "q_rater_kappa" -> """
      WITH d AS (SELECT (lang = 'en') AS a, (n_chars >= 200) AS b
                 FROM documents),
      c AS (SELECT count(*)::BIGINT AS n,
                   sum(CASE WHEN a = b THEN 1 ELSE 0 END)::BIGINT AS agree,
                   sum(CASE WHEN a THEN 1 ELSE 0 END)::BIGINT AS na1,
                   sum(CASE WHEN b THEN 1 ELSE 0 END)::BIGINT AS nb1
            FROM d),
      m AS (SELECT *,
              (na1 * nb1 + (n - na1) * (n - nb1))::BIGINT AS pe_num
            FROM c)
      SELECT n, agree,
             (agree * 1000000 // n)::BIGINT AS po_ppm,
             (pe_num * 1000000 // (n * n))::BIGINT AS pe_ppm,
             (n * agree - pe_num)::BIGINT AS kappa_num,
             (n * n - pe_num)::BIGINT AS kappa_den
      FROM m
    """,

    "q_anova" -> """
      WITH c AS (SELECT c_mktsegment AS seg,
                        floor(c_acctbal * 100 + 0.5)::BIGINT + 100000 AS v
                 FROM customer),
      g AS (SELECT seg, count(*)::BIGINT AS n_g, sum(v)::BIGINT AS s_g,
                   sum(v::HUGEINT * v) AS ss_g
            FROM c GROUP BY 1),
      w AS (SELECT n_g, s_g, ss_g,
                   ss_g - (s_g::HUGEINT * s_g // n_g) AS w_g
            FROM g),
      t AS (SELECT count(*)::BIGINT AS k, sum(n_g)::BIGINT AS n,
                   sum(s_g)::BIGINT AS s, sum(ss_g) AS ss_tot,
                   sum(w_g) AS ssw_d
            FROM w)
      SELECT k, n,
             (ss_tot - (s::HUGEINT * s // n) - ssw_d)::BIGINT AS ssb,
             ssw_d::BIGINT AS ssw,
             ((ss_tot - (s::HUGEINT * s // n) - ssw_d) * (n - k) * 1000000
               // (ssw_d * (k - 1)))::BIGINT AS f_ppm
      FROM t
    """,

    "q_spearman" -> """
      WITH o AS (SELECT o_orderkey,
                        floor(o_totalprice * 100 + 0.5)::BIGINT AS cents,
                        o_orderdate
                 FROM orders),
      r AS (SELECT
              row_number() OVER (ORDER BY cents, o_orderkey)::BIGINT AS rx,
              row_number() OVER (ORDER BY o_orderdate, o_orderkey)::BIGINT
                AS ry
            FROM o),
      t AS (SELECT count(*)::BIGINT AS n,
                   sum((rx - ry)::HUGEINT * (rx - ry)) AS sum_d2_w
            FROM r)
      SELECT n, sum_d2_w::BIGINT AS sum_d2,
             ((2 * n::HUGEINT * (n::HUGEINT * n - 1) - 6 * sum_d2_w)
               * 1000000
               // (2 * n::HUGEINT * (n::HUGEINT * n - 1)))::BIGINT
               AS rho_shift_ppm
      FROM t
    """,

    "q_fd_check" -> """
      WITH f1 AS (SELECT o_custkey AS k,
                         count(DISTINCT o_orderpriority)::BIGINT AS d
                  FROM orders GROUP BY 1),
      f2 AS (SELECT l_orderkey AS k,
                    count(DISTINCT l_returnflag)::BIGINT AS d
             FROM lineitem GROUP BY 1),
      f3 AS (SELECT c_nationkey AS k,
                    count(DISTINCT c_mktsegment)::BIGINT AS d
             FROM customer GROUP BY 1)
      SELECT 'o_custkey->o_orderpriority' AS fd, count(*) AS n_groups,
             sum(CASE WHEN d > 1 THEN 1 ELSE 0 END)::BIGINT AS n_violating,
             max(d) AS max_rhs
      FROM f1
      UNION ALL
      SELECT 'l_orderkey->l_returnflag', count(*),
             sum(CASE WHEN d > 1 THEN 1 ELSE 0 END)::BIGINT, max(d)
      FROM f2
      UNION ALL
      SELECT 'c_nationkey->c_mktsegment', count(*),
             sum(CASE WHEN d > 1 THEN 1 ELSE 0 END)::BIGINT, max(d)
      FROM f3
    """,

    "q_ref_integrity" -> """
      SELECT 'orders->customer' AS chk, count(*) AS n_rows,
             sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
               AS n_orphans
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      UNION ALL
      SELECT 'lineitem->part', count(*),
             sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)::BIGINT
      FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
      UNION ALL
      SELECT 'lineitem->supplier', count(*),
             sum(CASE WHEN s.s_suppkey IS NULL THEN 1 ELSE 0 END)::BIGINT
      FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
      UNION ALL
      SELECT 'events->customer', count(*),
             sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT
      FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    """,

    "q_l_diversity" -> """
      SELECT c_nationkey::BIGINT AS nation, c_mktsegment AS segment,
             count(*) AS n,
             count(DISTINCT (floor(c_acctbal * 100 + 0.5)::BIGINT + 100000)
                            // 100000) AS n_sens,
             (CASE WHEN count(DISTINCT (floor(c_acctbal * 100 + 0.5)::BIGINT
                                        + 100000) // 100000) >= 3
                   THEN 1 ELSE 0 END)::BIGINT AS meets_l3
      FROM customer
      GROUP BY 1, 2
    """,

    "q_pmi_collocations" -> s"""
      WITH d AS (SELECT list_filter($duckToks, x -> x <> '') AS t
                 FROM documents),
      uni AS (SELECT unnest(t) AS w FROM d),
      uc AS (SELECT w, count(*)::BIGINT AS c FROM uni GROUP BY 1),
      bg0 AS (SELECT unnest(list_transform(range(1, len(t)),
                                           i -> t[i] || ' ' || t[i+1]))
                AS bigram
              FROM d WHERE len(t) >= 2),
      bg AS (SELECT bigram, count(*)::BIGINT AS c_ab FROM bg0
             GROUP BY 1 HAVING count(*) >= 5),
      nu AS (SELECT sum(c)::HUGEINT AS n_u FROM uc),
      nbg AS (SELECT sum(len(t) - 1)::HUGEINT AS n_bg FROM d
              WHERE len(t) >= 2)
      SELECT bigram, c_ab,
             (c_ab::HUGEINT * n_u * n_u * 1000000
              // (n_bg * ca.c * cb.c))::BIGINT AS pmi_ratio_ppm
      FROM bg
      JOIN uc ca ON split_part(bigram, ' ', 1) = ca.w
      JOIN uc cb ON split_part(bigram, ' ', 2) = cb.w
      CROSS JOIN nu CROSS JOIN nbg
    """,

    "q_zipf" -> s"""
      WITH uni AS (SELECT unnest(list_filter($duckToks, x -> x <> ''))
                     AS w
                   FROM documents),
      uc AS (SELECT w, count(*)::BIGINT AS n FROM uni GROUP BY 1),
      r AS (SELECT w, n, row_number() OVER (ORDER BY n DESC, w)::BIGINT
                          AS rank
            FROM uc)
      SELECT w, n, rank, rank * n AS rank_x_freq
      FROM r WHERE rank <= 100
    """,

    "q_neg_sample" -> """
      WITH idx AS (SELECT doc_id, source,
                          (row_number() OVER (ORDER BY doc_id) - 1)::BIGINT
                            AS i
                   FROM documents),
      n AS (SELECT count(*)::BIGINT AS n_docs FROM idx),
      q AS (SELECT doc_id AS q_id, source AS q_source
            FROM idx WHERE i < 20),
      drawn AS (SELECT q_id, q_source, j::BIGINT AS j,
                       (q_id * 2654435761 + j * 40503) % n_docs AS neg_i
                FROM q CROSS JOIN n
                CROSS JOIN (SELECT unnest(range(1, 6)) AS j))
      SELECT q_id, j, x.doc_id AS neg_id,
             (CASE WHEN q_source = x.source THEN 1 ELSE 0 END)::BIGINT
               AS same_source
      FROM drawn JOIN idx x ON drawn.neg_i = x.i
      WHERE x.doc_id <> q_id
    """,

    "q_feature_hash" -> s"""
      WITH uni AS (SELECT unnest(list_filter($duckToks, x -> x <> ''))
                     AS w
                   FROM documents)
      SELECT (length(w) * 31 + ascii(substring(w, 1, 1)) * 7
              + ascii(substring(w, -1, 1))) % 64 AS bucket,
             count(*)::BIGINT AS n_tokens
      FROM uni GROUP BY 1
    """,

    "q_seasonal_forecast" -> """
      WITH m AS (SELECT (year(o_orderdate) * 12
                         + month(o_orderdate))::BIGINT AS month_id,
                        count(*)::BIGINT AS actual
                 FROM orders GROUP BY 1)
      SELECT a.month_id, a.actual, f.actual AS forecast,
             abs(a.actual - f.actual)::BIGINT AS abs_err,
             abs(a.actual - f.actual) * 1000000 // f.actual AS err_ppm
      FROM m a JOIN m f ON a.month_id = f.month_id + 12
    """,

    "q_psi_buckets" -> """
      WITH o AS (SELECT year(o_orderdate)::BIGINT AS yr,
                        floor(o_totalprice * 100 + 0.5)::BIGINT // 5000000
                          AS bucket
                 FROM orders),
      yrs AS (SELECT min(yr) AS y0, max(yr) AS y1 FROM o),
      b AS (SELECT bucket,
                   sum(CASE WHEN yr = y0 THEN 1 ELSE 0 END)::BIGINT AS n0,
                   sum(CASE WHEN yr = y1 THEN 1 ELSE 0 END)::BIGINT AS n1
            FROM o CROSS JOIN yrs
            WHERE yr = y0 OR yr = y1
            GROUP BY 1),
      tot AS (SELECT sum(n0)::BIGINT AS big0, sum(n1)::BIGINT AS big1
              FROM b)
      SELECT bucket, n0, n1,
             n0 * 1000000 // big0 AS share0_ppm,
             n1 * 1000000 // big1 AS share1_ppm,
             abs(n0 * 1000000 // big0 - n1 * 1000000 // big1) AS drift_ppm
      FROM b CROSS JOIN tot
    """,

    "q_allen_intervals" -> """
      WITH spans AS (SELECT o.o_custkey, o.o_orderkey,
                            date_diff('day', DATE '1970-01-01',
                              o.o_orderdate)::BIGINT AS s,
                            e.e
                     FROM orders o
                     JOIN (SELECT l_orderkey,
                                  max(date_diff('day', DATE '1970-01-01',
                                      l_shipdate))::BIGINT AS e
                           FROM lineitem GROUP BY 1) e
                       ON o.o_orderkey = e.l_orderkey),
      nxt AS (SELECT s, e,
                     lead(s) OVER w AS s2, lead(e) OVER w AS e2
              FROM spans
              WINDOW w AS (PARTITION BY o_custkey ORDER BY s, o_orderkey))
      SELECT CASE
               WHEN e < s2 THEN 'precedes'
               WHEN e = s2 THEN 'meets'
               WHEN s = s2 AND e = e2 THEN 'equals'
               WHEN s = s2 THEN 'starts'
               WHEN e = e2 THEN 'finishes'
               WHEN s < s2 AND e > e2 THEN 'contains'
               WHEN s > s2 AND e < e2 THEN 'inside'
               ELSE 'overlaps' END AS relation,
             count(*) AS n_pairs
      FROM nxt WHERE s2 IS NOT NULL
      GROUP BY 1
    """,

    "q_audience_overlap" -> """
      WITH ut AS (SELECT DISTINCT user_id, event_type AS t FROM events),
      sizes AS (SELECT t, count(*)::BIGINT AS n FROM ut GROUP BY 1),
      inter AS (SELECT a.t AS t1, b.t AS t2, count(*)::BIGINT AS n_both
                FROM ut a JOIN ut b
                  ON a.user_id = b.user_id AND a.t < b.t
                GROUP BY 1, 2)
      SELECT t1, t2, s1.n AS n1, s2.n AS n2, n_both,
             n_both * 1000000 // (s1.n + s2.n - n_both) AS jaccard_ppm
      FROM inter
      JOIN sizes s1 ON t1 = s1.t
      JOIN sizes s2 ON t2 = s2.t
    """,

    "q_runs_test" -> """
      WITH daily AS (SELECT date_diff('day', DATE '1970-01-01',
                              o_orderdate)::BIGINT AS day,
                            count(*)::BIGINT AS n
                     FROM orders GROUP BY 1),
      med AS (SELECT n AS m
              FROM (SELECT n, day,
                           row_number() OVER (ORDER BY n, day) AS rk,
                           count(*) OVER () AS cnt
                    FROM daily)
              WHERE rk = (cnt + 1) // 2),
      signed AS (SELECT day,
                        (CASE WHEN n > m THEN 1 ELSE 0 END)::BIGINT
                          AS above
                 FROM daily CROSS JOIN med
                 WHERE n <> m),
      flips AS (SELECT above,
                       (CASE WHEN lag(above) OVER (ORDER BY day) IS NULL
                              OR lag(above) OVER (ORDER BY day) <> above
                             THEN 1 ELSE 0 END)::BIGINT AS new_run
                FROM signed)
      SELECT sum(CASE WHEN above = 1 THEN 1 ELSE 0 END)::BIGINT AS n1,
             sum(CASE WHEN above = 0 THEN 1 ELSE 0 END)::BIGINT AS n2,
             sum(new_run)::BIGINT AS runs,
             (1000000 + 2 * sum(CASE WHEN above = 1 THEN 1 ELSE 0 END)
                          * sum(CASE WHEN above = 0 THEN 1 ELSE 0 END)
                          * 1000000
                        // (sum(CASE WHEN above = 1 THEN 1 ELSE 0 END)
                            + sum(CASE WHEN above = 0 THEN 1 ELSE 0 END))
               )::BIGINT AS expected_micro
      FROM flips
    """,

    "q_ngram_novelty" -> s"""
      WITH d AS (SELECT doc_id, list_filter($duckToks, x -> x <> '') AS t
                 FROM documents),
      bg AS (SELECT doc_id,
                    unnest(list_transform(range(1, len(t)),
                                          i -> t[i] || ' ' || t[i+1]))
                      AS bigram
             FROM d WHERE len(t) >= 2),
      counts AS (SELECT bigram, count(*)::BIGINT AS c FROM bg GROUP BY 1)
      SELECT doc_id, count(*) AS n_bigrams,
             sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS n_novel,
             (sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
               // count(*))::BIGINT AS novelty_ppm
      FROM bg JOIN counts USING (bigram)
      GROUP BY 1
    """,

    "q_lsh_recall" -> s"""
      WITH $minhashLshCtes,
      sizes AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY doc_id),
      inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       count(*) AS i
                FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
      exact AS (SELECT doc_a, doc_b FROM (
                  SELECT doc_a, doc_b,
                         round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
                  FROM inter JOIN sizes sa ON doc_a = sa.doc_id
                             JOIN sizes sb ON doc_b = sb.doc_id)
                WHERE jaccard >= 0.8),
      ne AS (SELECT count(*)::BIGINT AS n_exact FROM exact),
      nl AS (SELECT count(*)::BIGINT AS n_lsh FROM lsh_pairs),
      hit AS (SELECT count(*)::BIGINT AS n_hit
              FROM exact JOIN lsh_pairs USING (doc_a, doc_b))
      SELECT n_exact, n_lsh, n_hit,
             n_hit * 1000000 // n_exact AS recall_ppm,
             n_hit * 1000000 // n_lsh AS precision_ppm
      FROM ne CROSS JOIN nl CROSS JOIN hit
    """,

    "q_bootstrap_ci" -> """
      WITH o AS (SELECT o_orderkey,
                        floor(o_totalprice * 100 + 0.5)::BIGINT AS cents
                 FROM orders),
      rep AS (SELECT cents, b::BIGINT AS b
              FROM o CROSS JOIN (SELECT unnest(range(0, 32)) AS b)
              WHERE (o_orderkey * (2654435761 + 2 * b)) % 1000003
                    < 500002)
      SELECT b, count(*) AS n,
             (sum(cents) * 10000 // count(*))::BIGINT AS mean_micro
      FROM rep GROUP BY 1
    """,

    "q_degree_hist" -> """
      WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
      e0 AS (SELECT a.l_suppkey AS u, b.l_suppkey AS v, count(*) AS w
             FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
                                AND a.l_suppkey < b.l_suppkey
             GROUP BY 1, 2),
      e AS (SELECT u, v FROM e0 WHERE w >= 5),
      deg AS (SELECT node, count(*)::BIGINT AS d
              FROM (SELECT u AS node FROM e
                    UNION ALL SELECT v FROM e)
              GROUP BY 1)
      SELECT d // 8 AS bucket, count(*) AS n_nodes,
             min(d) AS min_deg, max(d) AS max_deg
      FROM deg GROUP BY 1
    """,

    "q_ooo_lateness" -> """
      WITH e AS (SELECT user_id, event_id,
                        (epoch_ns(ts) // 1000) * 1000 AS tns
                 FROM events),
      x AS (SELECT user_id, tns,
                   max(tns) OVER (PARTITION BY user_id ORDER BY event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS prior_max
            FROM e)
      SELECT user_id, count(*) AS n_events,
             sum(CASE WHEN tns < prior_max THEN 1 ELSE 0 END)::BIGINT
               AS n_late,
             max(CASE WHEN tns < prior_max THEN prior_max - tns
                      ELSE 0 END)::BIGINT AS max_late_ns
      FROM x GROUP BY 1
    """,

    "q_trigram_transitions" -> """
      WITH e AS (SELECT user_id, event_id, event_type,
                        (epoch_ns(ts) // 1000) * 1000 AS tns
                 FROM events),
      tri AS (SELECT event_type AS prev2,
                     lead(event_type, 1) OVER w AS prev1,
                     lead(event_type, 2) OVER w AS next_type
              FROM e
              WINDOW w AS (PARTITION BY user_id ORDER BY tns, event_id)),
      g AS (SELECT prev2, prev1, next_type, count(*)::BIGINT AS n
            FROM tri WHERE next_type IS NOT NULL
            GROUP BY 1, 2, 3)
      SELECT prev2, prev1, next_type, n,
             sum(n) OVER (PARTITION BY prev2, prev1)::BIGINT AS n_ctx,
             (n * 1000000 // sum(n) OVER (PARTITION BY prev2, prev1)
               )::BIGINT AS p_ppm
      FROM g
    """,

    "q_label_windows" -> """
      WITH daily AS (
        SELECT user_id, epoch_ns(ts) // 86400000000000 AS day,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
                 AS clicks,
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT
                 AS views,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
                 AS purchases
        FROM events GROUP BY 1, 2)
      SELECT user_id, day,
             coalesce(sum(clicks) OVER past, 0)::BIGINT AS clicks_7d,
             coalesce(sum(views) OVER past, 0)::BIGINT AS views_7d,
             (CASE WHEN coalesce(sum(purchases) OVER future, 0) > 0
                   THEN 1 ELSE 0 END)::BIGINT AS label
      FROM daily
      WINDOW past AS (PARTITION BY user_id ORDER BY day
                      RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING),
             future AS (PARTITION BY user_id ORDER BY day
                        RANGE BETWEEN 1 FOLLOWING AND 7 FOLLOWING)
    """,

    "q_sessionized_conversion" -> """
      WITH e AS (SELECT user_id, event_id, event_type,
                        (epoch_ns(ts) // 1000) * 1000 AS tns
                 FROM events),
      x AS (SELECT user_id, event_id, event_type, tns,
                   CASE WHEN prev IS NULL OR tns - prev > 1800000000000
                        THEN 1 ELSE 0 END AS new_s
            FROM (SELECT user_id, event_id, event_type, tns,
                         lag(tns) OVER (PARTITION BY user_id
                           ORDER BY tns, event_id) AS prev FROM e)),
      y AS (SELECT user_id, event_type, tns, event_id,
                   sum(new_s) OVER (PARTITION BY user_id
                     ORDER BY tns, event_id
                     ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
            FROM x),
      sess AS (SELECT user_id, session_id,
                      min(CASE WHEN rk = 1 THEN event_type END)
                        AS entry_type,
                      max(CASE WHEN event_type = 'purchase' THEN 1
                               ELSE 0 END)::BIGINT AS converted
               FROM (SELECT *, row_number() OVER (
                       PARTITION BY user_id, session_id
                       ORDER BY tns, event_id) AS rk
                     FROM y)
               GROUP BY 1, 2)
      SELECT entry_type, count(*) AS n_sessions,
             sum(converted)::BIGINT AS n_converted,
             (sum(converted) * 1000000 // count(*))::BIGINT AS cvr_ppm
      FROM sess GROUP BY 1
    """,

    "q_peak_detect" -> """
      WITH daily AS (SELECT date_diff('day', DATE '1970-01-01',
                              o_orderdate)::BIGINT AS day,
                            count(*)::BIGINT AS n
                     FROM orders GROUP BY 1),
      x AS (SELECT day, n,
                   lag(n) OVER (ORDER BY day) AS prev_n,
                   lead(n) OVER (ORDER BY day) AS next_n,
                   sum(n) OVER (ORDER BY day
                     RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS sum7,
                   count(*) OVER (ORDER BY day
                     RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS n7
            FROM daily)
      SELECT day, n, sum7::BIGINT AS sum7,
             (n * 7000000 // sum7)::BIGINT AS vs_mean_ppm
      FROM x
      WHERE prev_n IS NOT NULL AND next_n IS NOT NULL AND n7 = 7
        AND n > prev_n AND n > next_n AND 14 * n > 3 * sum7
    """,

    "q_incremental_dedup" -> s"""
      WITH $minhashLshCtes,
      bounds AS (SELECT min(doc_id) + (max(doc_id) - min(doc_id)) * 9 // 10
                   AS thr
                 FROM documents)
      SELECT doc_b AS new_doc, count(*) AS n_old_matches,
             min(doc_a) AS first_partner
      FROM lsh_pairs CROSS JOIN bounds
      WHERE doc_b > thr AND doc_a <= thr
      GROUP BY 1
    """,

    "q_range_boundaries" -> """
      WITH samp AS (SELECT floor(o_totalprice * 100 + 0.5)::BIGINT
                             AS cents, o_orderkey
                    FROM orders WHERE o_orderkey % 97 = 0),
      rk AS (SELECT cents,
                    row_number() OVER (ORDER BY cents, o_orderkey)::BIGINT
                      AS rk
             FROM samp),
      pos AS (SELECT bucket::BIGINT AS bucket,
                     bucket * (SELECT count(*) FROM samp) // 32 AS rk
              FROM (SELECT unnest(range(1, 32)) AS bucket))
      SELECT bucket, cents AS boundary_cents
      FROM rk JOIN pos USING (rk)
    """,

    "q_zvalue" -> s"""
      WITH xy AS (SELECT c_custkey % 32 AS x,
                         c_nationkey::BIGINT % 32 AS y
                  FROM customer),
      zv AS (SELECT ${(0 until 5).map(i =>
              s"((x // ${1 << i}) % 2) * ${1L << (2 * i)} + " +
              s"((y // ${1 << i}) % 2) * ${1L << (2 * i + 1)}")
              .mkString(" + ")} AS z
             FROM xy)
      SELECT z // 64 AS bucket, count(*) AS n,
             min(z) AS min_z, max(z) AS max_z
      FROM zv GROUP BY 1
    """,

    "q_drawdown" -> """
      WITH daily AS (SELECT date_diff('day', DATE '1970-01-01',
                              o_orderdate)::BIGINT AS day,
                            sum(floor(o_totalprice * 100 + 0.5)::BIGINT)
                              AS rev
                     FROM orders GROUP BY 1),
      cm AS (SELECT day, sum(rev) OVER (ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS cum
             FROM daily),
      c AS (SELECT day, cum,
                   max(cum) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                     AS peak
            FROM cm)
      SELECT day AS worst_day, (peak - cum)::BIGINT AS max_dd_cents,
             peak::BIGINT AS peak_cents, cum::BIGINT AS cum_cents
      FROM c
      ORDER BY max_dd_cents DESC, day
      LIMIT 1
    """,

    "q_sparse_cosine_pairs" -> s"""
      WITH tok AS (SELECT doc_id,
                          unnest(list_filter($duckToks, x -> x <> ''))
                            AS w
                   FROM documents),
      tf AS (SELECT doc_id, w, count(*)::BIGINT AS tf
             FROM tok GROUP BY 1, 2),
      kept AS (SELECT doc_id, w, tf
               FROM (SELECT doc_id, w, tf,
                            count(*) OVER (PARTITION BY w) AS df
                     FROM tf)
               WHERE df <= 100),
      norms AS (SELECT doc_id, sum(tf * tf)::BIGINT AS n2
                FROM kept GROUP BY 1),
      dot AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     sum(a.tf * b.tf)::BIGINT AS dot
              FROM kept a JOIN kept b
                ON a.w = b.w AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
      SELECT doc_a, doc_b, dot,
             dot * dot * 1000000 // (na.n2 * nb.n2) AS cos2_ppm
      FROM dot
      JOIN norms na ON doc_a = na.doc_id
      JOIN norms nb ON doc_b = nb.doc_id
      WHERE dot * dot * 1000000 // (na.n2 * nb.n2) >= 250000
    """,

    "q_scan_pruning" -> """
      WITH o AS (SELECT o_custkey, o_orderkey,
                        date_diff('day', DATE '1970-01-01',
                          o_orderdate)::BIGINT AS day
                 FROM orders),
      bounds AS (SELECT min(o_custkey) + (max(o_custkey) - min(o_custkey))
                          * 4 // 10 AS lo,
                        min(o_custkey) + (max(o_custkey) - min(o_custkey))
                          * 5 // 10 AS hi
                 FROM o),
      ck AS (SELECT ntile(64) OVER (ORDER BY o_custkey, o_orderkey)
                      ::BIGINT AS file_id, o_custkey
             FROM o),
      dt AS (SELECT ntile(64) OVER (ORDER BY day, o_orderkey)
                      ::BIGINT AS file_id, o_custkey
             FROM o),
      cks AS (SELECT file_id, min(o_custkey) AS mn_ck,
                     max(o_custkey) AS mx_ck
              FROM ck GROUP BY 1),
      dts AS (SELECT file_id, min(o_custkey) AS mn_ck,
                     max(o_custkey) AS mx_ck
              FROM dt GROUP BY 1)
      SELECT 'clustered_by_custkey' AS layout, count(*) AS n_files,
             sum(CASE WHEN mx_ck < lo OR mn_ck > hi THEN 1 ELSE 0 END)
               ::BIGINT AS n_pruned
      FROM cks CROSS JOIN bounds
      UNION ALL
      SELECT 'appended_by_date', count(*),
             sum(CASE WHEN mx_ck < lo OR mn_ck > hi THEN 1 ELSE 0 END)
               ::BIGINT
      FROM dts CROSS JOIN bounds
    """,

    "q_dict_encodability" -> """
      SELECT 'lineitem.l_returnflag' AS column_name, count(*) AS n,
             count(DISTINCT l_returnflag)::BIGINT AS ndv,
             count(DISTINCT l_returnflag) * 1000000 // count(*) AS ndv_ppm
      FROM lineitem
      UNION ALL
      SELECT 'lineitem.l_suppkey', count(*),
             count(DISTINCT l_suppkey)::BIGINT,
             count(DISTINCT l_suppkey) * 1000000 // count(*)
      FROM lineitem
      UNION ALL
      SELECT 'lineitem.l_extendedprice', count(*),
             count(DISTINCT l_extendedprice)::BIGINT,
             count(DISTINCT l_extendedprice) * 1000000 // count(*)
      FROM lineitem
      UNION ALL
      SELECT 'orders.o_orderpriority', count(*),
             count(DISTINCT o_orderpriority)::BIGINT,
             count(DISTINCT o_orderpriority) * 1000000 // count(*)
      FROM orders
      UNION ALL
      SELECT 'orders.o_custkey', count(*),
             count(DISTINCT o_custkey)::BIGINT,
             count(DISTINCT o_custkey) * 1000000 // count(*)
      FROM orders
      UNION ALL
      SELECT 'orders.o_totalprice', count(*),
             count(DISTINCT o_totalprice)::BIGINT,
             count(DISTINCT o_totalprice) * 1000000 // count(*)
      FROM orders
    """,
  )

  /** DuckDB mirror of [[graft.operators.PageRank.integerPageRank]] on
    * the bipartite customer↔supplier graph: integer micro-unit
    * contributions make every round exact, so the fixed iterations
    * unroll into CTE stages (positive operands ⇒ Spark `div` ≡ DuckDB
    * `//`). */
  private def pageRankOracle(iters: Int): String = {
    val head = """
      WITH be AS (SELECT DISTINCT (o_custkey * 2) AS u,
                         (l_suppkey * 2 + 1) AS v
                  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
                  WHERE o_orderkey < 60000),
      e AS (SELECT u, v FROM be UNION SELECT v, u FROM be),
      deg AS (SELECT u, count(*) AS outdeg FROM e GROUP BY 1),
      nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e),
      p0 AS (SELECT node, 1000000::BIGINT AS pr FROM nodes)"""
    val stages = (0 until iters).map { i => s""",
      c$i AS (SELECT e.v AS node, (p.pr * 850) // (1000 * d.outdeg) AS c
              FROM e JOIN deg d USING (u) JOIN p$i p ON p.node = e.u),
      p${i + 1} AS (SELECT n.node, (150000 + coalesce(s.s, 0))::BIGINT AS pr
              FROM nodes n LEFT JOIN (SELECT node, sum(c) AS s FROM c$i
                                      GROUP BY 1) s USING (node))"""
    }.mkString
    head + stages + s"""
      SELECT node, pr FROM p$iters
    """
  }

  /** DuckDB mirror of [[graft.functions.Similarity.kmeansModel]]: the
    * fixed iteration count lets the loop unroll into CTE stages
    * (assign aᵢ → update cᵢ₊₁, final assignment a_iters carries the
    * exact squared distance); every quantity is an integer-valued
    * double, so assignments and floor-mean centroids match the Spark
    * run bit-for-bit. */
  private def kmeansCtes(k: Int, iters: Int): String = {
    def dotq(x: String, c: String) =
      s"list_sum(list_transform(range(1, 65), i -> $x[i] * $c[i]))"
    val head = s"""
      WITH sc AS (SELECT vec_id,
                    CAST(list_max(list_transform(embedding, x -> abs(x)))
                         AS DOUBLE) AS s
                  FROM embeddings),
      qv AS (SELECT e.vec_id,
               CASE WHEN sc.s = 0
                    THEN list_transform(e.embedding, x -> 0.0)
                    ELSE list_transform(e.embedding,
                      x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / sc.s + 0.5)
                                AS DOUBLE))
               END AS embedding
             FROM embeddings e JOIN sc USING (vec_id)),
      xx AS (SELECT vec_id, embedding,
                    ${dotq("embedding", "embedding")} AS xx FROM qv),
      c0 AS (SELECT row_number() OVER (ORDER BY h, vec_id) AS cid,
                    embedding AS ce
             FROM (SELECT vec_id, embedding,
                     ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT AS h
                   FROM qv ORDER BY h, vec_id LIMIT $k))"""
    def assignStage(i: Int) = s""",
      a$i AS (SELECT vec_id, embedding, cid, d AS dist FROM (
          SELECT q.vec_id, q.embedding, s.cid,
                 q.xx - 2 * ${dotq("q.embedding", "s.ce")} + s.cc AS d,
                 row_number() OVER (PARTITION BY q.vec_id
                   ORDER BY q.xx - 2 * ${dotq("q.embedding", "s.ce")} + s.cc,
                            s.cid) AS rn
          FROM xx q CROSS JOIN (SELECT cid, ce, ${dotq("ce", "ce")} AS cc
                                FROM c$i) s)
        WHERE rn = 1)"""
    val stages = (0 until iters).map { i =>
      assignStage(i) + s""",
      c${i + 1} AS (SELECT cid, list(c ORDER BY pos) AS ce FROM (
          SELECT cid, pos, floor(sum(x) / count(*)) AS c FROM (
            SELECT cid, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS pos FROM a$i)
          GROUP BY cid, pos) GROUP BY cid)"""
    }.mkString
    head + stages + assignStage(iters)
  }

  /** Shared CTE chain producing MinHash-LSH candidate pairs as
    * `lsh_pairs(doc_a, doc_b)` over `table(doc_id, text)` — used by the
    * pair query, the cluster query, and the curation pipeline. */
  private def minhashLshCtesFor(table: String): String = s"""
      ex AS (
        SELECT doc_id, unnest(list_distinct(list_transform(
                 range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' ')))) AS s
        FROM (SELECT doc_id, $duckToks AS t FROM $table)
        WHERE len(t) >= 3
      ),
      hx AS (SELECT doc_id,
                    (('0x' || substr(md5(s), 1, 15))::BIGINT % 2147483647) AS x
             FROM ex),
      pj AS (SELECT j, (1103515245 * j + 12345) % 2147483647 AS a,
                    (69069 * j + 1) % 2147483647 AS b
             FROM range(16) t(j)),
      sig AS (SELECT doc_id, j, min((a * x + b) % 2147483647) AS mh
              FROM hx CROSS JOIN pj GROUP BY doc_id, j),
      band AS (SELECT doc_id, j // 4 AS band,
                      string_agg(mh::VARCHAR, ',' ORDER BY j) AS sig
               FROM sig GROUP BY doc_id, j // 4),
      lsh_pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM band a JOIN band b ON a.band = b.band AND a.sig = b.sig
                               AND a.doc_id < b.doc_id
      )"""

  private lazy val minhashLshCtes: String = minhashLshCtesFor("documents")

  /** DuckDB snippet: rounded cosine between two 64-dim list exprs,
    * folding left-to-right in double like Spark's aggregate∘zip_with.
    * Zero-norm inputs yield NULL (nullif guard), mirroring
    * `CosineSimilarity`'s null-on-degenerate-input contract. */
  private def duckCos(a: String, b: String): String = {
    def d(x: String, y: String) =
      s"list_sum(list_transform(range(1, 65), i -> $x[i]::DOUBLE * $y[i]::DOUBLE))"
    s"round(${d(a, b)} / nullif(sqrt(${d(a, a)}) * sqrt(${d(b, b)}), 0), 6)"
  }

  /** DuckDB snippet: INTEGER dot product of two int8-quantized 64-dim
    * list exprs (values are whole numbers stored as DOUBLE): products
    * ≤ 127² summed over 64 dims stay exact in double, so the BIGINT
    * cast is lossless — mirrors `dotFused(...).cast("long")`. */
  private def duckIDot(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, 65), " +
      s"i -> $a[i] * $b[i])) AS BIGINT)"

  /** DuckDB literal list of Rabin powers B^15..B^0 mod M (B = 257,
    * M = 2³¹−1) — the per-window polynomial weights mirroring
    * [[graft.functions.expressions.RabinBoundaries]]'s rolled value. */
  private val rabinPows: String = {
    val M = 2147483647L
    Array.iterate(1L, 16)(p => p * 257L % M).reverse.mkString("[", ", ", "]")
  }

  /** DuckDB snippet: normalized whitespace tokens of `text`. */
  private val duckToks =
    "string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ')"

  private def sqlList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString(", ")

  private val allStopwordsSql: String =
    sqlList(graft.functions.TextAnalysis.stopwords.flatMap(_._2))

  private def langHitSql(lang: String): String = {
    val words = graft.functions.TextAnalysis.stopwords.toMap.apply(lang)
    s"len(list_filter(toks, t -> list_contains([${sqlList(words)}], t)))"
  }
}
