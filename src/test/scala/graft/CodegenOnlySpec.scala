package graft

import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Similarity, TextAnalysis}

/** Forces CODEGEN_ONLY (no interpreted fallback): every custom
  * expression must generate compilable Java for every input shape,
  * including the degenerate paths (null branches, empty arrays) —
  * a broken doGenCode otherwise silently falls back to interpreted
  * eval and only shows up as a 10× perf cliff at scale. */
class CodegenOnlySpec extends SparkSpec {
  import spark.implicits._

  private def codegenOnly[A](body: => A): A = {
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }

  test("all custom expressions execute under CODEGEN_ONLY") {
    codegenOnly {
      val docs = Seq((1L, "the quick brown fox jumps"), (2L, ""),
                     (3L, "a"), (4L, "Zw0rd! Zw0rd! Zw0rd!"))
        .toDF("doc_id", "text")
      // NormalizeText + WordShingles + SimHash60
      assert(Dedup.simhashSignatures(docs, "doc_id", "text").count() == 4)
      assert(docs.select(TextAnalysis.shingles($"text", 2)).count() == 4)
      // CosineSimilarity incl. null branches (zero norm, length mismatch)
      val vecs = Seq(
        (1L, Array(1f, 2f), Array(2f, 1f)),
        (2L, Array(0f, 0f), Array(1f, 1f)),
        (3L, Array(1f, 2f, 3f), Array(1f, 2f))).toDF("id", "a", "b")
      val cos = vecs.select($"id",
          Similarity.cosineFused($"a", $"b").as("c"))
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
                                             else Some(r.getDouble(1)))).toMap
      assert(cos(1L).exists(_ > 0.7) && cos(2L).isEmpty && cos(3L).isEmpty)
      // DotProduct incl. the zero-vector (non-null) and mismatch paths
      val dot = vecs.select($"id",
          Similarity.dotFused($"a", $"b").as("d"))
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
                                             else Some(r.getDouble(1)))).toMap
      assert(dot(1L).contains(4.0) && dot(2L).contains(0.0) &&
             dot(3L).isEmpty)
    }
  }
}
