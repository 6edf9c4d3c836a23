package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.LoopCheckpoint

/** Pins the fix for the iterative-plan stats blowup: Spark 4 carries
  * the origin plan's Statistics through eager localCheckpoint
  * (SPARK-39748), so a loop whose checkpointed frame re-enters its own
  * join tree compounds the carried sizeInBytes every round — the
  * BigInt's BIT LENGTH grows geometrically and stats estimation
  * eventually hangs the driver in BigInteger.multiply (observed:
  * ConnectedComponents on the sf1 sweep, 30+ min pinned).
  * LoopCheckpoint must keep the estimate bounded round over round. */
class LoopCheckpointSpec extends SparkSpec {
  import spark.implicits._

  private def statsBits(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength

  // one loop round that references the loop frame THREE times through
  // 1:1 self-joins (row-preserving, so only the stats multiply):
  // sizeInBytes' = sizeInBytes³ — the CC pointer-jump shape in miniature
  private def round(cur: DataFrame): DataFrame =
    cur.join(cur.select(col("id").as("k2")), col("id") === col("k2"))
      .drop("k2")
      .join(cur.select(col("id").as("k3")), col("id") === col("k3"))
      .drop("k3")

  test("plain localCheckpoint compounds carried stats; LoopCheckpoint " +
       "keeps them bounded") {
    val base = (1L to 64L).map(i => (i, i % 8)).toDF("id", "k")

    // demonstrate the mechanism cheaply: 4 plain rounds already push
    // the carried estimate's bit length way past any real byte count
    var plain = base.localCheckpoint(true)
    (1 to 4).foreach(_ => plain = round(plain).localCheckpoint(true))
    assert(statsBits(plain) > 500,
      s"expected compounded stats, got ${statsBits(plain)} bits — if this" +
        " ever fails because Spark stopped carrying checkpoint stats," +
        " LoopCheckpoint can be retired")

    // the fixed path: twice the rounds, bit length stays that of a
    // real byte count (the block manager's actual cached size)
    var fixed = LoopCheckpoint(base)
    (1 to 8).foreach(_ => fixed = LoopCheckpoint(round(fixed)))
    assert(statsBits(fixed) < 64,
      s"LoopCheckpoint must bound stats; got ${statsBits(fixed)} bits")
    // and the 1:1 joins really were row-preserving
    assert(fixed.count() == 64L)
  }

  test("LoopCheckpoint plans exactly like plain localCheckpoint " +
       "(same exchanges, same rows) — only the stats differ") {
    val df = (1L to 100L).toDF("id").repartition(col("id"))
    def agg(d: DataFrame) = d.groupBy("id").agg(count(lit(1)).as("n"))
    val plain = df.localCheckpoint(true)
    val fixed = LoopCheckpoint(df.localCheckpoint(true))
    def exchanges(d: DataFrame): Int =
      "Exchange".r.findAllIn(
        agg(d).queryExecution.executedPlan.toString).size
    assert(exchanges(fixed) == exchanges(plain))
    assert(agg(fixed).collect().toSet == agg(plain).collect().toSet)
    // the fixed stats are a real (positive, bounded) byte count
    assert(statsBits(fixed) > 0 && statsBits(fixed) < 64)
  }

  private def withReliable[T](dir: Option[String])(body: => T): T = {
    spark.conf.set("spark.graft.checkpoint.reliable", "true")
    dir.foreach(d => spark.conf.set("spark.graft.checkpoint.dir", d))
    try body finally {
      spark.conf.unset("spark.graft.checkpoint.reliable")
      spark.conf.unset("spark.graft.checkpoint.dir")
      // reset so later suites/tests don't inherit a checkpoint dir
      spark.sparkContext.setCheckpointDir(null)
    }
  }

  test("reliable mode writes checkpoint files and loops unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    withReliable(Some(dir)) {
      val base = (1L to 64L).map(i => (i, i % 8)).toDF("id", "k")
      var cur = LoopCheckpoint(base)
      (1 to 4).foreach(_ => cur = LoopCheckpoint(round(cur)))
      assert(cur.count() == 64L)
      assert(statsBits(cur) < 64, "stats must stay bounded in reliable mode")
      // files actually landed in fault-tolerant storage
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(java.nio.file.Files.isRegularFile(_)).count()
      assert(files > 0, s"no checkpoint files under $dir")
    }
  }

  test("reliable mode without a checkpoint dir fails loudly") {
    withReliable(None) {
      val base = (1L to 8L).toDF("id")
      val e = intercept[IllegalStateException] { LoopCheckpoint(base) }
      assert(e.getMessage.contains("spark.graft.checkpoint.dir"))
    }
  }

  test("iterative operators produce identical results under both modes") {
    import graft.operators.ConnectedComponents
    val nodes = (1L to 10L).toDF("id")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L), (8L, 9L), (9L, 1L))
      .toDF("u", "v")
    val local = ConnectedComponents.run(nodes, edges)
      .collect().map(_.toSeq).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt2").toString
    val reliable = withReliable(Some(dir)) {
      ConnectedComponents.run(nodes, edges)
        .collect().map(_.toSeq).toSet
    }
    assert(reliable == local)
  }
}
