package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed star-schema catalog.
  *
  * The reference reads two Elasticsearch types (`person` parent,
  * `encounter` child — reference HouseholdRetentionProcessing.scala:399,
  * :464) with hand-built query-DSL pushdown. Here every table is a
  * columnar parquet scan and Catalyst does pushdown/pruning natively
  * (SURVEY.md §4): filters land in `PushedFilters`, projections in
  * `ReadSchema`, so a scan at 100 TB touches only the row groups and
  * columns a query needs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  /** Register every table as a temp view so `spark.sql` parity queries and
    * user SQL resolve the same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }

  /** The events table is written with TIMESTAMP(NANOS) — Spark's parquet
    * reader rejects that outright (PARQUET_TYPE_ILLEGAL) unless
    * `spark.sql.legacy.parquet.nanosAsLong` is set, which surfaces `ts`
    * as a nanos-since-epoch LongType. Expose both the raw nanos
    * (`ts_ns`) and a micros-truncated proper TimestampType (`ts`).
    *
    * NB the conf is session-scoped BY NECESSITY: it is a static read
    * path switch with no per-reader option form, and the frame is lazy
    * (the conf must hold whenever the scan later executes). It is
    * additive-only — it turns a hard reader error into a typed column —
    * so leaving it set cannot change the result of any query that
    * would otherwise succeed. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumnRenamed("ts", "ts_ns")
      // truncate to µs resolution: DuckDB (and most engines) carry
      // TIMESTAMP at µs, so sub-µs tails would silently diverge in any
      // cross-engine comparison; µs is the portable contract
      .withColumn("ts_ns", org.apache.spark.sql.functions.expr(
        "(ts_ns div 1000) * 1000"))
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts_ns div 1000)"))
  }
}
