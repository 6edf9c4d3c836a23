package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}

/** Small-files compaction — the table-maintenance operator every
  * long-running ingestion needs: streaming/incremental writers leave
  * thousands of KB-sized parquet files per directory, and at 100 TB
  * the resulting task-per-file scheduling and footer-read overhead
  * dominates scan time long before I/O does.
  *
  * Strategy: measure actual on-disk bytes, rewrite to
  * ceil(bytes / targetBytes) files via a round-robin repartition
  * (size-balanced regardless of key skew), and publish through the
  * same staging-rename protocol as [[KeyedUpsert]] so readers never
  * observe a half-compacted directory and a crash loses nothing.
  */
object Compaction {

  /** Compact the parquet directory at `path` toward `targetBytes` per
    * output file. Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(root)
      .filter(f => f.getPath.getName.endsWith(".parquet"))
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (parts.length <= nOut) return (parts.length, parts.length)
    val stage = new Path(root.getParent, root.getName + "_graft_compact")
    spark.read.parquet(path)
      .repartition(nOut) // round-robin: size-balanced, skew-immune
      .write.mode(SaveMode.Overwrite).parquet(stage.toString)
    // swap: the moment of truth is a single directory rename pair
    val old = new Path(root.getParent, root.getName + "_graft_precompact")
    if (!fs.rename(root, old))
      throw new java.io.IOException(s"failed to retire $root")
    if (!fs.rename(stage, root)) {
      fs.rename(old, root) // roll back
      throw new java.io.IOException(s"failed to publish $stage")
    }
    fs.delete(old, true)
    val after = fs.listStatus(root)
      .count(f => f.getPath.getName.endsWith(".parquet"))
    (parts.length, after)
  }
}
