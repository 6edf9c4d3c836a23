package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.expressions.BloomMightContainLong

/** Bloom-prefiltered equi-join: build a Bloom filter over the
  * (smaller) build side's join keys, drop probe rows that cannot match
  * BEFORE the shuffle, then run the exact join.
  *
  * This is Spark's own runtime row-level filter
  * (`spark.sql.optimizer.runtime.bloomFilter.*`) re-expressed as an
  * explicit library operator the caller controls: the optimizer's
  * version only fires under cost heuristics on shuffle-join subtrees,
  * while a pipeline that KNOWS its dim side is selective (the
  * reference's 10k-household batch probe against a full encounter scan
  * — reference HouseholdRetentionProcessing.scala:361-399 — is exactly
  * this shape) can install the filter unconditionally.
  *
  * Results are exact: the Bloom filter admits false positives only,
  * and every admitted row still goes through the real join. At 100 TB
  * the payoff is shuffle volume — a 1% -selective dim side turns a
  * 100 TB probe-side shuffle into ~1 TB (+fpp) for the one-time cost
  * of a distributed aggregate over dim keys and a few MB of filter
  * bytes in the task binary.
  */
object BloomJoin {

  /** Serialized Bloom filter over `dim`'s `dimKey` column (BIGINT).
    * Built distributed (partition-local sketches, driver merge — the
    * same path as `df.stat.bloomFilter`). */
  def bloomBytes(dim: DataFrame, dimKey: String, expectedItems: Long,
                 fpp: Double): Array[Byte] = {
    val bloom = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** The `might_contain` predicate as a Column (codegen expression). */
  def mightContain(key: Column, bytes: Array[Byte]): Column =
    org.apache.spark.sql.GraftSqlBridge.column(BloomMightContainLong(
      org.apache.spark.sql.GraftSqlBridge.expression(key), bytes))

  /** Exact inner equi-join with the probe side Bloom-pruned at the
    * scan. `expectedItems` should bound the dim-side distinct keys —
    * oversizing costs filter bytes, undersizing costs fpp, never
    * correctness. */
  def prefilteredJoin(probe: DataFrame, dim: DataFrame,
                      probeKey: String, dimKey: String,
                      expectedItems: Long = 1L << 20,
                      fpp: Double = 0.01): DataFrame = {
    val bytes = bloomBytes(dim, dimKey, expectedItems, fpp)
    probe.filter(mightContain(col(probeKey), bytes))
      .join(dim, col(probeKey) === col(dimKey))
  }
}
