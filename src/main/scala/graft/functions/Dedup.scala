package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection operators for training-data curation
  * (additive beyond the reference): exact, normalized-fingerprint,
  * n-gram Jaccard, and MinHash+LSH.
  *
  * Scale design: every operator is expressed as shuffle-bounded
  * relational ops — shingle/band inverted indexes joined on their key
  * — never an O(n²) cross join. At 100 TB the candidate space is
  * bounded by the index key's selectivity (band buckets for MinHash),
  * which is the standard web-scale dedup shape (shingle→minhash→band→
  * bucket-join).
  */
object Dedup {

  /** Exact-duplicate groups keyed on md5 of the raw text. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** (id, shingle) inverted index over distinct word n-grams. */
  private def shingleIndex(docs: DataFrame, idCol: String, textCol: String,
                           n: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
                TextAnalysis.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), explode(array_distinct(col("sh"))).as("s"))

  /** All pairs with n-gram Jaccard ≥ threshold. Pairs are generated
    * ONLY for documents sharing ≥1 shingle (inverted-index self-join),
    * then scored exactly: |A∩B| from the join, |A∪B| = |A|+|B|−|A∩B|.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double): DataFrame = {
    val ex = shingleIndex(docs, idCol, textCol, n)
    val sizes = ex.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = ex.as("a").join(ex.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
                 .withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
                 .withColumnRenamed("sz", "sz_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
              round(col("inter") / (col("sz_a") + col("sz_b") - col("inter")), 6)
                .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---- MinHash + LSH ----------------------------------------------------

  /** Mersenne prime 2^31−1: keeps a*x+b inside 63 bits (no ANSI
    * overflow) while remaining a decent universal-hash modulus. */
  val MinhashPrime: Long = 2147483647L

  /** 60-bit integer hash of a string via md5 — chosen because DuckDB
    * can reproduce it exactly (('0x'||substr(md5(s),1,15))::BIGINT),
    * making the whole MinHash pipeline oracle-checkable. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Permutation constants, LCG-derived so both engines can inline the
    * same literals: a_j, b_j for j ∈ [0, k). */
  def perms(k: Int): Seq[(Long, Long)] =
    (0 until k).map { j =>
      ((1103515245L * j + 12345L) % MinhashPrime,
       (69069L * j + 1L) % MinhashPrime)
    }

  /** MinHash signatures: one row per (doc, permutation j) with the min
    * permuted shingle hash. Partial-aggregates map-side (min), so the
    * shuffle carries k rows per doc, not the shingle set. */
  def minhashSignature(docs: DataFrame, idCol: String, textCol: String,
                       n: Int, k: Int): DataFrame = {
    val ex = shingleIndex(docs, idCol, textCol, n)
      .withColumn("x", md5Hash60(col("s")) % MinhashPrime)
    val permArr = array(perms(k).zipWithIndex.map { case ((a, b), j) =>
      struct(lit(j).as("j"), lit(a).as("a"), lit(b).as("b"))
    }: _*)
    ex.select(col("doc_id"), col("x"), explode(permArr).as("p"))
      .groupBy(col("doc_id"), col("p.j").as("j"))
      .agg(min((col("p.a") * col("x") + col("p.b")) % MinhashPrime).as("mh"))
  }

  /** LSH candidate pairs: band the k-row signature into `bands` groups
    * of k/bands rows, bucket on the concatenated band signature, and
    * emit distinct pairs sharing ≥1 bucket. */
  def lshCandidatePairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, k: Int, bands: Int): DataFrame = {
    val r = k / bands
    val sig = minhashSignature(docs, idCol, textCol, n, k)
    val bandSig = sig
      .withColumn("band", expr(s"j div $r"))
      .groupBy("doc_id", "band")
      // sort_array over struct(j, mh) gives a j-ordered signature in
      // both engines — collect_list alone is order-nondeterministic.
      .agg(concat_ws(",",
        transform(sort_array(collect_list(struct(col("j"), col("mh")))),
                  s => s.getField("mh").cast("string"))).as("sig"))
    bandSig.as("a").join(bandSig.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  // ---- SimHash ----------------------------------------------------------

  /** Register graft's custom Catalyst expressions for SQL use. */
  def registerExpressions(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash60", exprs => expressions.SimHash60(exprs.head), "scala_udf")

  /** 60-bit SimHash per document over normalized whitespace tokens,
    * via the custom codegen-resident expression (one pass per row — no
    * tokens×bits explosion). */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    registerExpressions(docs.sparkSession)
    docs.select(col(idCol).as("doc_id"),
                split(TextAnalysis.normalized(col(textCol)), " ").as("toks"))
      .select(col("doc_id"), expr("simhash60(toks)").as("sim"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming,
    * candidate-generated by banding the 60 bits into 4×15-bit chunks
    * (any pair within distance 3 must agree on ≥1 chunk; wider
    * distances trade recall, the standard Hamming-LSH shape). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int): DataFrame = {
    val sigs = simhashSignatures(docs, idCol, textCol)
    val bands = sigs.select(col("doc_id"), col("sim"),
        explode(sequence(lit(0), lit(3))).as("bnd"))
      .withColumn("bv", expr("shiftright(sim, bnd * 15) & 32767"))
    bands.as("a").join(bands.as("b"),
        col("a.bnd") === col("b.bnd") && col("a.bv") === col("b.bv") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
              expr("bit_count(a.sim ^ b.sim)").cast("int").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
