package graft.retention

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Maps the driver's TPC-H-ish star schema onto the reference's data
  * model (FIXTURES.md role mapping): customer→person, orders→encounter
  * (o_custkey, admit_date=o_orderdate::date).
  *
  * household_id = c_custkey div 2 (customer pairs) rather than
  * FIXTURES.md's c_nationkey suggestion: 25 nations would mean (a) zero
  * phase-2 coverage — every nation has orders, so the "household with
  * no encounters at all" branch (reference
  * HouseholdRetentionProcessing.scala:762-784) would never execute —
  * and (b) 25 giant hash keys, the worst skew shape for the
  * household-clustered DAG. Pairs keep the multi-person-household
  * fan-out (J7) real AND leave ~11% of households encounter-free
  * (TPC-H: 1 in 3 customers has no orders), exercising phase 2.
  *
  * The as-of anchor is max(o_orderdate) — a data-derived constant
  * replacing the reference's wall-clock `now` anchors (:486, :556,
  * :753) so every run and the DuckDB oracle agree (SURVEY.md §7.4).
  */
object StarAdapter {
  def persons(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey").as("person_id"),
              expr("c_custkey div 2").as("household_id"))

  /** Tenant-scoped persons — the reference's `client_code` equality
    * predicate (P5, pushed into every ES query; here pushed into the
    * parquet scan by Catalyst). */
  def personsForTenant(spark: SparkSession, sfDir: String, segment: String): DataFrame =
    Tables.load(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === segment)
      .select(col("c_custkey").as("person_id"),
              expr("c_custkey div 2").as("household_id"))

  def encounters(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey").as("person_id"),
              to_date(col("o_orderdate")).as("admit_date"))

  /** Driver-side scalar probe (the reference does the same for its count
    * gates, SURVEY.md A6/A8) — one tiny max() job, then a literal in the
    * plan so Catalyst constant-folds the month spine.
    */
  def asOf(spark: SparkSession, sfDir: String): LocalDate =
    Tables.load(spark, sfDir, "orders")
      .agg(max(to_date(col("o_orderdate"))))
      .head().getDate(0).toLocalDate

  def config(spark: SparkSession, sfDir: String): RetentionConfig =
    RetentionConfig(asOf = asOf(spark, sfDir))
}
