package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) write layout: cluster files so that
  * selective filters on ANY of the layout columns prune row groups —
  * single-column range clustering only helps its own column, but a
  * 100 TB fact table is filtered by different dimensions on different
  * queries.
  *
  * Mechanics: each layout column is quantized to 2^bits equal-
  * population buckets against boundaries from `approxQuantile` (a
  * distributed quantile sketch + one small driver collect — NOT a
  * global sort or a single-partition rank window, which would
  * bottleneck the whole write at scale); bucket indices are
  * bit-interleaved into the Morton code; the write range-partitions +
  * sorts by that code. Bucketing and interleaving are built-in
  * expressions inside whole-stage codegen; the only shuffle is the
  * final range partitioner — the same cost as a plain sorted write.
  */
object ZOrderLayout {

  /** Bucket id in [0, 2^bits) for `c` given sorted quantile bounds
    * (length 2^bits - 1): count of bounds ≤ value. */
  private def bucketOf(c: Column, bounds: Seq[Double]): Column =
    bounds.map(b => when(c >= lit(b), 1L).otherwise(0L))
      .reduceOption(_ + _).getOrElse(lit(0L))

  /** Morton code for numeric `cols` (2-4 recommended), `bits` per
    * column. Runs one approxQuantile per column (driver-side bounds). */
  def zValue(df: DataFrame, cols: Seq[String], bits: Int): Column = {
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"z-value needs cols*bits <= 63, got ${cols.size} * $bits")
    val n = cols.size
    val nBuckets = 1 << bits
    val probes = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val buckets = cols.map { c =>
      val bounds = df.stat.approxQuantile(c, probes, 0.001).toSeq.distinct
      bucketOf(col(c).cast("double"), bounds)
    }
    // interleave: output bit (i*n + j) = bit i of column j's bucket
    (0 until bits).flatMap { i =>
      buckets.zipWithIndex.map { case (b, j) =>
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), i * n + j)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Write `df` z-ordered by `cols` into `nFiles` parquet files. */
  def write(df: DataFrame, cols: Seq[String], path: String,
            nFiles: Int, bits: Int = 6): Unit =
    df.withColumn("_z", zValue(df, cols, bits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.parquet(path)
}
