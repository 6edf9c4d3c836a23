package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
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
  * rewrites the buckets that contain updated keys — a 0.1% update
  * touches ~0.1% of a 100 TB table, and untouched-bucket data is never
  * read.
  *
  * Durability design (no ACID table format available, so the commit
  * protocol is explicit): merged buckets are first written COMPLETELY
  * to a staging directory (the live table is only read at that point,
  * never mutated), then swapped in per bucket via metadata-only
  * renames, with the old bucket dirs preserved in a backup directory
  * and a manifest (written before the first rename) recording the
  * touched bucket set. A crash at ANY point leaves every pre-upsert
  * row recoverable: the next `upsert`/`read` call rolls an
  * interrupted swap back to the pre-upsert state from the backup +
  * manifest. This replaces an earlier design that Overwrite-wrote the
  * live path while holding survivor rows only in a localCheckpoint —
  * where executor loss mid-write destroyed untouched rows.
  *
  * Concurrency contract: SINGLE WRITER (matching the reference's one
  * batch job per index). Two concurrent upserts to the same path would
  * race on the staging/backup directories; serialize writers or give
  * each its own table. Readers are safe at any time — they see either
  * a bucket's old or new directory, and `read` first rolls back any
  * interrupted swap.
  */
object KeyedUpsert {

  val BucketCol = "_bucket"
  private val StageDir = "_graft_stage"
  private val BackupDir = "_graft_backup"
  private val Manifest = "_MANIFEST"

  private def bucketed(df: DataFrame, keyCol: String, numBuckets: Int): DataFrame =
    df.withColumn(BucketCol, pmod(hash(col(keyCol)), lit(numBuckets)))

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Upsert `updates` (one row per key) into the keyed table at `path`.
    * Whole-row replace per key, matching the reference's per-person
    * array replacement semantics.
    */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
             keyCol: String, numBuckets: Int = 64): Unit = {
    val root = new Path(path)
    val fs = fsOf(spark, path)
    recover(fs, root) // roll back any interrupted previous swap first
    val news = bucketed(updates, keyCol, numBuckets)
    val stage = new Path(root.getParent, root.getName + StageDir)

    if (!fs.exists(root)) {
      // First write: stage fully, then publish with one rename.
      news.write.mode(SaveMode.Overwrite).partitionBy(BucketCol)
        .parquet(stage.toString)
      if (!fs.rename(stage, root))
        throw new java.io.IOException(s"failed to publish $stage -> $root")
      return
    }

    // Survivors: rows in touched buckets whose key is NOT updated.
    // Reads the live table; the live table is not modified until the
    // staging write below has fully committed.
    //
    // The touched-bucket set is collected to the driver — ≤ numBuckets
    // ints, O(buckets) never O(rows), the same bounded-sketch class as
    // GlobalOrder's bounds sample — and applied as a LITERAL partition
    // filter. The previous broadcast-join form relied on dynamic
    // partition pruning firing against the store scan; when it did not
    // (plan-dependent), a 0.1% upsert READ the whole table to rewrite
    // 0.1% of it. A literal In() prunes at the file index
    // deterministically: the survivor scan now lists and reads ONLY
    // the touched bucket directories (round-15; plan shows
    // PartitionFilters: [_bucket IN (...)]).
    val touched = news.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).sorted
    val survivors = spark.read.parquet(path)
      .filter(col(BucketCol).isin(touched.map(Integer.valueOf): _*))
      .join(updates.select(col(keyCol)), Seq(keyCol), "left_anti")
    survivors.unionByName(news)
      .write.mode(SaveMode.Overwrite).partitionBy(BucketCol)
      .parquet(stage.toString)

    // Swap staged buckets into the live table. Manifest first, so an
    // interruption anywhere below is rolled back by recover().
    val backup = new Path(root.getParent, root.getName + BackupDir)
    fs.mkdirs(backup)
    val stagedBuckets = fs.listStatus(stage).map(_.getPath)
      .filter(_.getName.startsWith(BucketCol + "="))
    writeManifest(fs, new Path(backup, Manifest),
      stagedBuckets.map(_.getName).toIndexedSeq)
    stagedBuckets.foreach { staged =>
      val live = new Path(root, staged.getName)
      if (fs.exists(live) &&
          !fs.rename(live, new Path(backup, staged.getName)))
        throw new java.io.IOException(s"failed to back up $live")
      if (!fs.rename(staged, live))
        throw new java.io.IOException(s"failed to swap in $staged")
    }
    // COMMIT POINT: deleting the manifest — a single-file delete — makes
    // the new buckets final. It MUST go before the recursive backup
    // delete: a crash midway through deleting the backup dir would
    // otherwise leave the manifest alongside a PARTIAL backup, and
    // recovery would "roll back" committed buckets whose backups are
    // already gone — destroying them.
    fs.delete(new Path(backup, Manifest), false)
    fs.delete(backup, true)
    fs.delete(stage, true)
  }

  /** Roll back an interrupted swap: restore every manifest-listed
    * bucket from backup (or drop it, if it was newly created by the
    * interrupted run), then clear staging. The manifest's existence is
    * the authority: it is written before the first rename and deleted
    * (single-file, effectively atomic) only at commit, so when it is
    * present the backup is guaranteed complete for every pre-existing
    * touched bucket. Idempotent — safe to call any number of times,
    * including after a crash mid-recovery. */
  private def recover(fs: FileSystem, root: Path): Unit = {
    val backup = new Path(root.getParent, root.getName + BackupDir)
    val stage = new Path(root.getParent, root.getName + StageDir)
    val manifest = new Path(backup, Manifest)
    if (fs.exists(manifest)) {
      readManifest(fs, manifest).foreach { name =>
        val live = new Path(root, name)
        val saved = new Path(backup, name)
        if (fs.exists(saved)) {          // pre-existing bucket: restore
          if (fs.exists(live)) fs.delete(live, true)
          if (!fs.rename(saved, live))
            throw new java.io.IOException(s"failed to restore $saved")
        } else if (fs.exists(stage) &&
                   !fs.exists(new Path(stage, name))) {
          // bucket was new in the interrupted run and already moved
          // out of staging — it did not exist before; drop it
          if (fs.exists(live)) fs.delete(live, true)
        }
      }
    }
    if (fs.exists(backup)) fs.delete(backup, true)
    if (fs.exists(stage)) fs.delete(stage, true)
  }

  private def writeManifest(fs: FileSystem, p: Path, names: Seq[String]): Unit = {
    val out = fs.create(p, true)
    try out.write(names.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readManifest(fs: FileSystem, p: Path): Seq[String] = {
    val in = fs.open(p)
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray, StandardCharsets.UTF_8)
        .split("\n").toSeq.filter(_.nonEmpty)
    } finally in.close()
  }

  /** Read back the keyed table (dropping the bucketing column),
    * rolling back any interrupted swap first. */
  def read(spark: SparkSession, path: String): DataFrame = {
    recover(fsOf(spark, path), new Path(path))
    spark.read.parquet(path).drop(BucketCol)
  }
}
