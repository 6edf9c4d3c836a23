package graft.tmp_diag

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMPORARY round-10 diagnostic: candidate-pair volume of the PPJoin
  * prefix filter at a given sf dir, without generating the pairs. */
object DiagNgram {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val threshold = if (args.length > 1) args(1).toDouble else 0.8
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, dir, "documents")
    val n = 3
    val sets = docs.select(col("doc_id"),
        transform(array_distinct(graft.functions.TextAnalysis.shingles(col("text"), n)),
                  s => graft.functions.Dedup.md5Hash60(s)).as("sh"))
      .filter(size(col("sh")) > 0)
    val ex = sets.select(col("doc_id"), size(col("sh")).as("sz"),
                         explode(col("sh")).as("h"))
    val wdf = org.apache.spark.sql.expressions.Window.partitionBy("h")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("df", "h")
    val prefix = ex.withColumn("df", count(lit(1)).over(wdf))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz")) + 1)
      .select("doc_id", "h")
    println("ex rows: " + ex.count())
    println("prefix rows: " + prefix.count())
    val byH = prefix.groupBy("h").agg(count(lit(1)).as("c"))
    byH.agg(sum(expr("c * (c - 1) / 2")).as("cand_pairs"),
            max("c").as("max_bucket"), count(lit(1)).as("n_tokens"))
      .show(false)
    spark.stop()
  }
}
