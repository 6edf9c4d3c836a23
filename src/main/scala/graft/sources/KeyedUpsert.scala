package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed upsert sink over parquet — the relational stand-in for the
  * reference's Elasticsearch bulk upsert (`saveToEsWithMeta` with
  * es.write.operation=upsert, reference
  * HouseholdRetentionProcessing.scala:297-302, SURVEY.md S7): each run
  * replaces the full row for every updated key and leaves other keys
  * untouched.
  *
  * Scale design: the table is laid out in `numBuckets` hash partitions
  * of the key (directory-partitioned by `_bucket`). An upsert only
  * rewrites the buckets that contain updated keys — Spark's dynamic
  * partition overwrite — so a 0.1% update touches ~0.1% of a 100 TB
  * table instead of rewriting it. Untouched-bucket data is never read.
  */
object KeyedUpsert {

  val BucketCol = "_bucket"

  private def bucketed(df: DataFrame, keyCol: String, numBuckets: Int): DataFrame =
    df.withColumn(BucketCol, pmod(hash(col(keyCol)), lit(numBuckets)))

  /** Upsert `updates` (one row per key) into the keyed table at `path`.
    * Whole-row replace per key, matching the reference's per-person
    * array replacement semantics.
    */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
             keyCol: String, numBuckets: Int = 64): Unit = {
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val news = bucketed(updates, keyCol, numBuckets)
    val merged =
      if (!fs.exists(new Path(path))) news
      else {
        val touched = news.select(BucketCol).distinct()
        // survivors: rows in touched buckets whose key is NOT updated.
        // localCheckpoint materializes them BEFORE the overwrite below
        // deletes the files they are read from.
        val survivors = spark.read.parquet(path)
          .join(broadcast(touched), BucketCol)
          .join(updates.select(col(keyCol)), Seq(keyCol), "left_anti")
        survivors.unionByName(news).localCheckpoint(true)
      }
    merged.write.mode(SaveMode.Overwrite)
      .partitionBy(BucketCol).parquet(path)
  }

  /** Read back the keyed table (dropping the bucketing column). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop(BucketCol)
}
