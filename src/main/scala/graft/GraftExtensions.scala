package graft

import org.apache.spark.sql.{GraftSqlBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.IntegerType

import graft.functions.expressions.{CosineSimilarity, DotProduct, NormalizeText, SimHash60, WordShingles}

/** Session-extension entry point: registers graft's custom Catalyst
  * expressions as SQL functions, so a pure-SQL user gets the whole
  * surface without touching the Scala API:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)   // or
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * spark.sql("SELECT simhash60(split(text, ' ')), cosine_sim(a, b) FROM t")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  /** Shared validation for expression-parameterizing arguments: a
    * foldable positive integral literal that fits in INT (accepting
    * any integral literal type — 2, 2L, CAST(2 AS SMALLINT), ...),
    * with an analysis-time error instead of a CCE at builder time. */
  private def posIntLit(fn: String, arg: String, e: Expression): Int = {
    if (!e.foldable) GraftSqlBridge.nonFoldableArgumentError(fn, arg, IntegerType)
    val integral = e.dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    e.eval() match {
      case i: java.lang.Number
          if integral && i.longValue == i.intValue.toLong && i.intValue > 0 =>
        i.intValue
      case _ => GraftSqlBridge.analysisError(
        s"$fn: $arg must be a positive integral literal that fits in INT, " +
          s"got ${e.sql} (${e.dataType.catalogString})")
    }
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n) GraftSqlBridge.analysisError(
      s"$fn takes exactly $n arguments, got ${args.length}")

  override def apply(e: SparkSessionExtensions): Unit = {
    // whole-operator tier: the native as-of join's planner strategy +
    // the pruning rule Catalyst can't derive for an unknown node
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.PruneAsOfJoinValues)
    e.injectFunction((FunctionIdentifier("simhash60"),
      info("simhash60", "simhash60(tokens) — 60-bit SimHash of ARRAY<STRING>"),
      (args: Seq[Expression]) => SimHash60(args.head)))
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) — fused cosine over ARRAY<FLOAT|DOUBLE>"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) — fused dot over ARRAY<FLOAT|DOUBLE>"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(tokens, n) — word n-grams of ARRAY<STRING>"),
      (args: Seq[Expression]) => {
        // `n` parameterizes the expression itself, so it must be a
        // foldable integral literal — validate at analysis time with a
        // proper error instead of CCE/NPE at builder time, and accept
        // any integral literal type (2, 2L, CAST(2 AS SMALLINT), ...).
        if (args.length != 2) GraftSqlBridge.analysisError(
          s"word_shingles(tokens, n) takes exactly 2 arguments, got ${args.length}")
        val nExpr = args(1)
        if (!nExpr.foldable) GraftSqlBridge.nonFoldableArgumentError(
          "word_shingles", "n", IntegerType)
        val integral = nExpr.dataType match {
          case org.apache.spark.sql.types.ByteType |
               org.apache.spark.sql.types.ShortType |
               IntegerType | org.apache.spark.sql.types.LongType => true
          case _ => false
        }
        val n = nExpr.eval() match {
          case i: java.lang.Number
              if integral && i.longValue == i.intValue.toLong => i.intValue
          case v => GraftSqlBridge.analysisError(
            "word_shingles(tokens, n): n must be an integral literal " +
              s"that fits in INT, got ${nExpr.sql} " +
              s"(${nExpr.dataType.catalogString}${if (v == null) ", NULL" else ""})")
        }
        WordShingles(args(0), n)
      }))
    e.injectFunction((FunctionIdentifier("normalize_text"),
      info("normalize_text", "normalize_text(s) — lower, strip non-alnum, collapse ws"),
      (args: Seq[Expression]) => NormalizeText(args.head)))
    e.injectFunction((FunctionIdentifier("heavy_hitters"),
      info("heavy_hitters",
        "heavy_hitters(s, k) — Misra-Gries frequent-items sketch of k counters"),
      (args: Seq[Expression]) => {
        if (args.length != 2) GraftSqlBridge.analysisError(
          s"heavy_hitters(s, k) takes exactly 2 arguments, got ${args.length}")
        val kExpr = args(1)
        if (!kExpr.foldable) GraftSqlBridge.nonFoldableArgumentError(
          "heavy_hitters", "k", IntegerType)
        val integral = kExpr.dataType match {
          case org.apache.spark.sql.types.ByteType |
               org.apache.spark.sql.types.ShortType |
               IntegerType | org.apache.spark.sql.types.LongType => true
          case _ => false
        }
        val k = kExpr.eval() match {
          case i: java.lang.Number
              if integral && i.longValue == i.intValue.toLong && i.intValue > 0 =>
            i.intValue
          case _ => GraftSqlBridge.analysisError(
            "heavy_hitters(s, k): k must be a positive integral literal, " +
              s"got ${kExpr.sql} (${kExpr.dataType.catalogString})")
        }
        graft.functions.expressions.MisraGriesAgg(args.head, k)
      }))
    e.injectFunction((FunctionIdentifier("rabin_boundaries"),
      info("rabin_boundaries",
        "rabin_boundaries(text, w, div) — content-defined chunk cut " +
          "positions (rolling-hash windows of w chars, cut where " +
          "hash mod div = 0)"),
      (args: Seq[Expression]) => {
        arity("rabin_boundaries(text, w, div)", args, 3)
        graft.functions.expressions.RabinBoundaries(args.head,
          posIntLit("rabin_boundaries", "w", args(1)),
          posIntLit("rabin_boundaries", "div", args(2)))
      }))
    e.injectFunction((FunctionIdentifier("topk_pairs"),
      info("topk_pairs",
        "topk_pairs(score, id, k) — bounded-heap per-group top-k of " +
          "(DOUBLE, BIGINT) pairs, score DESC / id ASC"),
      (args: Seq[Expression]) => {
        arity("topk_pairs(score, id, k)", args, 3)
        graft.functions.expressions.TopKPairsAgg(args(0), args(1),
          posIntLit("topk_pairs", "k", args(2)))
      }))
  }
}
