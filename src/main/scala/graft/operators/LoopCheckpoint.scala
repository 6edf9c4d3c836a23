package graft.operators

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}

/** Eager localCheckpoint for LOOP-CARRIED frames in iterative
  * operators (components, PageRank, BFS, k-core, k-means).
  *
  * Plain `localCheckpoint` truncates lineage but — since SPARK-39748 —
  * PRESERVES the origin plan's Statistics on the resulting LogicalRDD.
  * When the checkpointed frame feeds the next round's join tree, the
  * carried sizeInBytes is re-multiplied every round and carried again:
  * its bit length grows geometrically with the round count, and after
  * ~10 rounds the driver hangs multiplying million-bit BigIntegers
  * inside stats estimation (observed on the sf1 sweep:
  * ConnectedComponents pinned in BigInteger.multiply for 30+ minutes).
  * One-shot checkpoints are immune — only loop-carried ones compound.
  *
  * This wrapper drops the carried stats (keeping the checkpointed RDD,
  * partitioning, and ordering — zero data movement), so every round
  * plans against the same bounded default estimate. */
private[graft] object LoopCheckpoint {
  def apply(df: DataFrame): DataFrame =
    GraftSqlBridge.dropCarriedStats(df.localCheckpoint(true))
}
