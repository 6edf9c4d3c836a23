package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed managed tables (Hive-style `bucketBy` + `sortBy`): the
  * storage-layout half of the 100-TB join strategy. Writing both fact
  * tables bucketed and sorted on the join key pre-pays the shuffle and
  * sort ONCE at ingest; every subsequent equi-join or aggregation on
  * that key plans with zero Exchange operators — at cluster scale that
  * is the difference between moving 100 TB per query and moving
  * nothing.
  *
  * Complements [[KeyedUpsert]] (which buckets directories for
  * incremental rewrites): this is Spark-native bucketing that the
  * OPTIMIZER understands — `spark.table(...)` exposes the bucket
  * spec as `HashPartitioning`, so Catalyst drops the exchange (and,
  * with `sortBy`, the sort) from join plans. Contract asserted by
  * BucketedSpec: bucket-key join of two co-bucketed tables contains
  * no shuffle; bucket counts must match for co-location.
  */
object Bucketed {

  /** Persist `df` as a bucketed+sorted managed parquet table. */
  def write(df: DataFrame, table: String, keyCol: String,
            numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, keyCol).sortBy(keyCol)
      .format("parquet").saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
