package graft.tmp_diag

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** TEMPORARY round-10 diagnostic: sparse-cosine candidate volume. */
object DiagSparse {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tf = graft.QueryHelpers.postingsFor(spark, dir)
      .select(col("doc_id"), col("term").as("w"), col("tf"))
    val kept = tf.withColumn("df", count(lit(1)).over(Window.partitionBy("w")))
      .crossJoin(broadcast(graft.Tables.load(spark, dir, "documents")
        .agg(count(lit(1)).as("n_docs"))))
      .filter(expr("df * 100 <= n_docs * 20")).drop("n_docs")
    kept.groupBy("w").agg(count(lit(1)).as("c"))
      .agg(sum(expr("c * (c - 1) / 2")).as("cand_pairs"),
           max("c").as("max_df"), count(lit(1)).as("n_terms")).show(false)
    spark.stop()
  }
}
