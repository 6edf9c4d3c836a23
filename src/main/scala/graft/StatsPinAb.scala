package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B for the round-12 `materialize` knob on the crossing machinery:
  * q_mad (6 source passes) and q_winsorize (4 passes) with the
  * default rescan form vs the pinned-projection form, same fixture,
  * min-of-N — the measurement BASELINE.md's contract row points at.
  *
  *   tools/run.sh graft.StatsPinAb /tmp/graft_sf10 [passes]
  */
object StatsPinAb {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def madInput = Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag").as("rf"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
    def winInput = Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag").as("rf"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("v"))
      .withColumn("w", lit(1L))

    val forms = Seq[(String, () => DataFrame)](
      ("mad_rescan", () => graft.operators.Stats.medianAbsDev(
        madInput, Seq("rf"), col("cents"))),
      ("mad_pinned", () => graft.operators.Stats.medianAbsDev(
        madInput, Seq("rf"), col("cents"), materialize = true)),
      ("win_rescan", () => graft.operators.Stats.groupedWeightedCrossings(
        winInput, Seq("rf"), "v", "w",
        Seq((20L, 1L, "p05"), (20L, 19L, "p95")))),
      ("win_pinned", () => graft.operators.Stats.groupedWeightedCrossings(
        winInput, Seq("rf"), "v", "w",
        Seq((20L, 1L, "p05"), (20L, 19L, "p95")), materialize = true)))
    val best = scala.collection.mutable.LinkedHashMap[String, Double]()
    for (pass <- 1 to passes; (name, f) <- forms) {
      val t0 = System.nanoTime()
      val n = f().count()
      val sec = math.rint((System.nanoTime() - t0) / 1e6) / 1000
      best(name) = best.get(name).fold(sec)(math.min(_, sec))
      println(f"[statspin] pass$pass $name%-12s rows=$n%-4d $sec%.2fs")
    }
    println(best.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}"))
    spark.stop()
  }
}
