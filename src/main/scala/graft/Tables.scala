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

  /** The events table surfaces two columns regardless of how the parquet
    * file encodes its timestamp:
    *   - `ts_ns`: LongType epoch nanos, truncated to µs resolution —
    *     DuckDB (and most engines) carry TIMESTAMP at µs, so sub-µs
    *     tails would silently diverge in any cross-engine comparison;
    *     µs is the portable contract every downstream operator keys on.
    *   - `ts`: a proper TimestampType at the same µs instant.
    *
    * Fixtures have shipped the column BOTH ways across rounds, so the
    * loader branches on the ACTUAL read schema rather than assuming one:
    *   - TIMESTAMP(NANOS) parquet: Spark's reader rejects it
    *     (PARQUET_TYPE_ILLEGAL) unless
    *     `spark.sql.legacy.parquet.nanosAsLong` is set, which surfaces
    *     `ts` as nanos-since-epoch LongType → truncate to µs.
    *   - timestamp[us] parquet (TIMESTAMP or TIMESTAMP_NTZ): already µs;
    *     derive the nanos via unix_micros. NTZ casts through TIMESTAMP
    *     under the session's UTC timezone (all entry points pin
    *     spark.sql.session.timeZone=UTC), matching DuckDB's naive-UTC
    *     epoch_ns reading of the same file.
    *
    * NB the nanosAsLong conf is session-scoped BY NECESSITY: it is a
    * static read-path switch with no per-reader option form, and the
    * frame is lazy (the conf must hold whenever the scan later
    * executes). It is additive-only — it turns a hard reader error into
    * a typed column — so leaving it set cannot change the result of any
    * query that would otherwise succeed. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEvents(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /** Schema-driven ts normalization shared by the batch and streaming
    * events loaders (StreamingOps.eventsStream applies the same contract
    * to a readStream frame). */
  private[graft] def normalizeEvents(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.LongType
    raw.schema("ts").dataType match {
      case LongType => // legacy TIMESTAMP(NANOS) surfaced as epoch-nanos long
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts_ns", expr("(ts_ns div 1000) * 1000"))
          .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
      case _ => // timestamp[us], TZ or NTZ — already at µs resolution
        raw.withColumn("ts", expr("cast(ts as timestamp)"))
          .withColumn("ts_ns", expr("unix_micros(ts) * 1000"))
    }
  }
}
