package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused A/B for q_incremental_neardup's per-delivery fixed cost
  * (round-15, VERDICT item 6): runs the three-delivery replay through
  * [[Bench.incrementalNeardupReplay]] (same store protocol, same
  * timings decomposition) and then dumps the plan shapes of the two
  * per-delivery jobs — the candidate-pair join and the store-survivor
  * scan — so join-strategy / partition-pruning claims are checkable.
  *
  *   SPARK_GRAFT_CPUS=32 runMain graft.NeardupAb <sfDir> [out.json]
  */
object NeardupAb {
  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outJson = args.drop(1).headOption
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val replay = graft.operators.CheckpointScope.scoped(
      Bench.incrementalNeardupReplay(spark, srcDir))
    println(s"""{$replay,"sf":"$srcDir"}""")

    // Reconstruct delivery-3's two frames verbatim against the store
    // the replay left behind is not possible (the replay uses a temp
    // dir), so rebuild a 2/3 store here and explain the delta-3 join.
    val docs = Tables.load(spark, srcDir, "documents")
    val store = java.nio.file.Files
      .createTempDirectory("graft_nd_ab").toString + "/store"
    (0 until 2).foreach { t =>
      graft.functions.Dedup.incrementalNearDup(spark, store,
        docs.filter(pmod(col("doc_id"), lit(3)) === t),
        "doc_id", "text", 3, 16, 4, numBuckets = 8).count()
    }
    val delta = docs.filter(pmod(col("doc_id"), lit(3)) === 2)
    val deltaSigs = graft.operators.LoopCheckpoint(
      delta.select(col("doc_id")).distinct()
        .join(graft.functions.Dedup.docBandSignatures(
          delta, "doc_id", "text", 3, 16, 4), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("sigs"), array().cast("array<string>")).as("sigs")))
    val st = graft.sources.KeyedUpsert.read(spark, store)
    val all = st.join(deltaSigs.select("doc_id"), Seq("doc_id"), "left_anti")
      .unionByName(deltaSigs)
    def bands(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), posexplode(col("sigs")).as(Seq("band", "sig")))
    val pairs = bands(deltaSigs).as("a").join(bands(all).as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
              greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct()
    pairs.write.format("noop").mode("overwrite").save()
    println("=== delta-3 candidate-pair plan (executed) ===")
    println(pairs.queryExecution.executedPlan.toString.take(6000))
    // the survivor scan KeyedUpsert.upsert now builds: literal
    // partition filter over the touched buckets — the plan must show
    // PartitionFilters pruning untouched bucket directories
    val survScan = spark.read.parquet(store)
      .filter(col(graft.sources.KeyedUpsert.BucketCol)
        .isin(Integer.valueOf(0), Integer.valueOf(3)))
    survScan.write.format("noop").mode("overwrite").save()
    println("=== survivor-scan shape (literal touched-bucket prune) ===")
    println(survScan.queryExecution.executedPlan.toString.take(2500))
    spark.stop()
  }
}
