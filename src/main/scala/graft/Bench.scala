package graft

import org.apache.spark.sql.SparkSession

/** Driver-contract benchmark: times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * A full untimed warmup pass runs first so the timed pass measures
  * steady-state execution (JIT-compiled codegen, loaded parquet
  * footers, warmed buffer pools) rather than charging the first query
  * in map order with the whole session's warmup cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // local-iteration aid: SPARK_GRAFT_ONLY=q_a,q_b restricts the suite
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val suite = only.fold(SparkEntry.queries)(ks =>
      SparkEntry.queries.filter(kv => ks(kv._1)))
    // A failing query must fail the bench (exit ≠ 0), never silently
    // score ~0 s: errors are collected per query, reported on stderr,
    // and turn the run into a nonzero exit after all queries ran (so
    // one broken query doesn't hide the others' numbers).
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def run1(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      try fn(spark, sfDir).count()
      catch { case e: Throwable =>
        errors.getOrElseUpdate(name, s"${e.getClass.getName}: ${e.getMessage}")
      }
    suite.foreach { case (name, fn) => run1(name, fn) } // untimed warmup
    // two timed passes, min per query: single-pass numbers on a shared
    // 32-thread box swing ±50% from GC/scheduler noise; min-of-2 is the
    // repeatable steady-state figure the 2× perf gate compares against.
    def timedPass(): Map[String, Double] = suite.map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        run1(name, fn)
        name -> (System.nanoTime() - t0) / 1e9
    }
    val (p1, p2) = (timedPass(), timedPass())
    val results = p1.map { case (k, v) => k -> math.min(v, p2(k)) }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) {
      errors.foreach { case (name, msg) =>
        System.err.println(s"BENCH FAILURE $name: $msg")
      }
      sys.exit(1)
    }
  }
}
