package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Focused A/B for q_spearman's double numbering (round-15, VERDICT
  * item 4): the CHAINED form (second distributed numbering consumes
  * the first's output — a derived input, so the gate pins a full-width
  * 150M-row frame at sf100) vs the JOIN form (both numberings run over
  * scan-rooted projections of the fact table — no pin anywhere — and
  * the two narrow (key, rank) frames meet in one equi-join).
  *
  *   SPARK_GRAFT_CPUS=32 runMain graft.SpearmanAb <sfDir> [out.json]
  *
  * Both forms compute the identical (n, sum_d2) pair — cross-checked
  * before any timing is trusted. Each form runs twice; min reported.
  * The `*Auto` gate is left ON (the production call path), so at small
  * SF this also measures the small-branch shapes.
  */
object SpearmanAb {
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

    def o: DataFrame = Tables.load(spark, srcDir, "orders")
      .select(col("o_orderkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
        col("o_orderdate"))

    def agg(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)).as("n"),
        sum(expr("cast((rx - ry) * (rx - ry) as decimal(38,0))"))
          .as("sum_d2_w")).head()
      (r.getLong(0), r.getDecimal(1))
    }

    def chainForm(): (Long, java.math.BigDecimal) = agg(
      graft.operators.GlobalOrder.withRowNumberAuto(
        graft.operators.GlobalOrder.withRowNumberAuto(
          o, Seq(col("cents"), col("o_orderkey")), "rx"),
        Seq(col("o_orderdate"), col("o_orderkey")), "ry"))

    def joinForm(): (Long, java.math.BigDecimal) = {
      val rx = graft.operators.GlobalOrder.withRowNumberAuto(
          o.select(col("o_orderkey"), col("cents")),
          Seq(col("cents"), col("o_orderkey")), "rx")
        .select(col("o_orderkey"), col("rx"))
      val ry = graft.operators.GlobalOrder.withRowNumberAuto(
          o.select(col("o_orderkey"), col("o_orderdate")),
          Seq(col("o_orderdate"), col("o_orderkey")), "ry")
        .select(col("o_orderkey"), col("ry"))
      agg(rx.join(ry, "o_orderkey"))
    }

    def time(mk: () => (Long, java.math.BigDecimal))
        : (Double, Long, java.math.BigDecimal) = {
      var best = Double.MaxValue
      var res: (Long, java.math.BigDecimal) = null
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        res = graft.operators.CheckpointScope.scoped(mk())
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, res._1, res._2)
    }

    val (tc, nc, dc) = time(chainForm)
    val (tj, nj, dj) = time(joinForm)
    require(nc == nj && dc.compareTo(dj) == 0,
      s"spearman mismatch: chain=($nc,$dc) join=($nj,$dj)")

    val line =
      f"""{"metric":"spearman_ab","rows":$nc,"chain_sec":$tc%.3f,""" +
      f""""join_sec":$tj%.3f,"sum_d2":"$dc","sf":"$srcDir"}"""
    println(line)
    outJson.foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        line.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    spark.stop()
  }
}
