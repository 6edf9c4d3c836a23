package graft

import org.apache.spark.sql.functions._

/** Invariants for the session-5 statistical-testing / audit / training-
  * data operators, checked on the sf0.01 tables via the SparkEntry
  * query surface (the same code path the driver verifies).
  */
class StatsAuditSpec extends SparkSpec {
  import spark.implicits._

  val dir = "/root/testdata/sf0.01"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("trimmed mean lies strictly inside the untrimmed min/max and " +
       "trims exactly 2×(n div 10) rows per segment") {
    val full = Tables.load(spark, dir, "customer")
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_all"),
        min(col("c_acctbal")).as("lo"), max(col("c_acctbal")).as("hi"))
    val joined = run("q_trimmed_mean").join(full, "segment")
      .select($"n_kept".as[Long], $"n_all".as[Long],
        $"trimmed_mean_micro".as[Long], $"lo".as[Double], $"hi".as[Double])
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { case (kept, all, mMicro, lo, hi) =>
      assert(kept == all - 2 * (all / 10))
      val mean = mMicro / 1e6
      assert(mean > lo && mean < hi)
    }
  }

  test("KS statistic is within [0, 1e6] ppm and d_num ≤ n_f·n_o") {
    val r = run("q_ks_test")
      .select($"n_f".as[Long], $"n_o".as[Long], $"d_num".as[Long],
        $"ks_ppm".as[Long]).head()
    assert(r._3 >= 0 && r._3 <= r._1 * r._2)
    assert(r._4 >= 0 && r._4 <= 1000000)
  }

  test("Mann–Whitney doubled U is symmetric: U_A + U_B = n_a·n_b") {
    // 2U_A + 2U_B = 2·n_a·n_b, and 2U_B = 2R_B − n_b(n_b+1) where
    // 2R_A + 2R_B = 2·(N(N+1)/2) = N(N+1), N = n_a + n_b
    val r = run("q_mann_whitney")
      .select($"n_a".as[Long], $"n_b".as[Long], $"r2_a".as[Long],
        $"u2_a".as[Long]).head()
    val (na, nb, r2a, u2a) = r
    val n = na + nb
    val r2b = n * (n + 1) - r2a
    val u2b = r2b - nb * (nb + 1)
    assert(u2a + u2b == 2 * na * nb)
    assert(u2a >= 0 && u2a <= 2 * na * nb)
  }

  test("referential integrity: synthetic star has no orphan FK edges " +
       "except possibly events→customer, and counts match table sizes") {
    val byChk = run("q_ref_integrity").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(byChk("orders->customer")._2 == 0)
    assert(byChk("lineitem->part")._2 == 0)
    assert(byChk("orders->customer")._1 ==
      Tables.load(spark, dir, "orders").count())
    assert(byChk.size == 4)
  }

  test("l-diversity groups partition the customer table") {
    val agg = run("q_l_diversity").agg(sum("n")).as[Long].head()
    assert(agg == Tables.load(spark, dir, "customer").count())
  }

  test("negative sampling: no self-pairs, k per query doc unless a " +
       "hash collision self-draw dropped one, deterministic re-run") {
    val a = run("q_neg_sample").collect()
    val b = run("q_neg_sample").collect()
    assert(a.toSet == b.toSet) // affine hash ⇒ bit-identical re-run
    assert(a.forall(r => r.getLong(0) != r.getLong(2)))
    val perQ = a.groupBy(_.getLong(0)).map(_._2.length)
    assert(perQ.forall(n => n == 5 || n == 4))
  }

  test("PMI ratio: a bigram whose parts only co-occur scores above " +
       "1e6 ppm (independence line)") {
    val top = run("q_pmi_collocations")
      .orderBy(desc("pmi_ratio_ppm")).limit(1)
      .select($"pmi_ratio_ppm".as[Long]).head()
    assert(top > 1000000L)
  }

  test("label windows: labels are 0/1 and every (user,day) of the " +
       "daily activity grid appears exactly once") {
    val lw = run("q_label_windows")
    val n = lw.count()
    val nDistinct = lw.select("user_id", "day").distinct().count()
    assert(n == nDistinct)
    assert(lw.filter(!col("label").isin(0L, 1L)).count() == 0)
  }

  test("sessionized conversion: session counts reconcile with " +
       "q_events_sessionize and cvr_ppm ≤ 1e6") {
    val bySess = run("q_events_sessionize").count()
    val byEntry = run("q_sessionized_conversion")
      .agg(sum("n_sessions")).as[Long].head()
    assert(byEntry == bySess)
    assert(run("q_sessionized_conversion")
      .filter(col("cvr_ppm") > 1000000L).count() == 0)
  }

  test("LSH recall: hits never exceed either side, exact pairs " +
       "nonempty at sf0.01") {
    val r = run("q_lsh_recall")
      .select($"n_exact".as[Long], $"n_lsh".as[Long], $"n_hit".as[Long])
      .head()
    assert(r._1 > 0)
    assert(r._3 <= r._1 && r._3 <= r._2)
  }

  test("runs test: runs count is consistent with n1+n2 bounds") {
    val r = run("q_runs_test")
      .select($"n1".as[Long], $"n2".as[Long], $"runs".as[Long]).head()
    val (n1, n2, runs) = r
    assert(runs >= 1 && runs <= n1 + n2)
    assert(runs <= 2 * math.min(n1, n2) + 1)
  }

  test("Allen relations are mutually exclusive and total: pair count " +
       "equals consecutive-order pair count") {
    val nPairs = run("q_allen_intervals").agg(sum("n_pairs")).as[Long].head()
    val spansPairs = {
      val orders = Tables.load(spark, dir, "orders")
      val withShip = orders.join(
        Tables.load(spark, dir, "lineitem")
          .groupBy("l_orderkey").agg(max("l_shipdate")),
        col("o_orderkey") === col("l_orderkey"))
      val perCust = withShip.groupBy("o_custkey").agg(count(lit(1)).as("k"))
      perCust.agg(sum(col("k") - 1)).as[Long].head()
    }
    assert(nPairs == spansPairs)
  }

  test("confusion matrix cells partition the table and F1 is the " +
       "integer harmonic mean of the emitted ppm precision/recall") {
    val (tp, fp, fn, tn, p, rec, f1) = run("q_confusion")
      .select("tp", "fp", "fn", "tn", "precision_ppm", "recall_ppm",
        "f1_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    val n = Tables.load(spark, dir, "orders").count()
    assert(tp + fp + fn + tn == n)
    assert(tp > 0 && fp > 0 && fn > 0 && tn > 0) // threshold really splits
    assert(p == tp * 1000000L / (tp + fp))
    assert(rec == tp * 1000000L / (tp + fn))
    assert(f1 == 2 * p * rec / (p + rec))
    assert(f1 <= math.max(p, rec) && f1 >= math.min(p, rec))
  }

  test("calibration buckets partition the rows, rates are in [0, 1e6] " +
       "and mean score is monotone in bucket") {
    val rows = run("q_calibration").orderBy("bucket")
      .select($"bucket".as[Long], $"n_rows".as[Long], $"n_pos".as[Long],
        $"mean_score".as[Long], $"pos_rate_ppm".as[Long]).collect()
    assert(rows.length == 10)
    assert(rows.map(_._2).sum == Tables.load(spark, dir, "orders").count())
    rows.foreach { case (_, nr, np, _, ppm) =>
      assert(np <= nr && ppm >= 0 && ppm <= 1000000L)
      assert(ppm == np * 1000000L / nr)
    }
    // equi-depth by VALUE rank: mean score must strictly increase
    assert(rows.map(_._4).sliding(2).forall(w => w(0) < w(1)))
  }

  test("rater agreement reproduces a hand-computed kappa on a tiny " +
       "frame and bounds hold on the corpus") {
    // hand frame: a=[T,T,F,F], b=[T,F,T,F] -> agree=2, po=0.5, pe=0.5,
    // kappa = 0 exactly
    val tiny = Seq((true, true), (true, false), (false, true),
      (false, false)).toDF("a", "b")
    val t = graft.functions.Eval.raterAgreement(tiny, col("a"), col("b"))
      .select("n", "agree", "po_ppm", "pe_ppm", "kappa_num", "kappa_den")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(t == ((4L, 2L, 500000L, 500000L, 0L, 8L)))
    val c = run("q_rater_kappa")
      .select("n", "agree", "po_ppm", "pe_ppm", "kappa_num", "kappa_den")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(c._1 == Tables.load(spark, dir, "documents").count())
    assert(c._2 <= c._1 && c._3 <= 1000000L && c._4 <= 1000000L)
    // kappa <= 1 always; den > 0 unless a rater is constant
    assert(c._6 > 0 && c._5 <= c._6)
  }

  test("ANOVA decomposition is consistent and F matches its own parts") {
    val (k, n, ssb, ssw, f) = run("q_anova")
      .select("k", "n", "ssb", "ssw", "f_ppm")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(k == 5 && n == Tables.load(spark, dir, "customer").count())
    assert(ssb >= 0 && ssw > 0) // floor contract keeps both nonnegative
    assert(f == BigInt(ssb) * (n - k) * 1000000 / (BigInt(ssw) * (k - 1)))
    // between-group variation is a small share of balance variance
    // (mktsegment is ~independent of acctbal) but must be nonzero
    assert(ssb < ssw)
  }

  test("Spearman rho shifted-ppm surface is a bounded correlation over " +
       "true rank permutations") {
    val (n, d2, shift) = run("q_spearman")
      .select("n", "sum_d2", "rho_shift_ppm")
      .as[(Long, Long, Long)].head()
    assert(n == Tables.load(spark, dir, "orders").count())
    val den = BigInt(n) * (BigInt(n) * n - 1)
    // rho in [-1, 1]  <=>  0 <= 6*sum_d2 <= 2*den; shift = (rho+1)/2·1e6
    assert(d2 >= 0 && BigInt(6) * d2 <= 2 * den)
    assert(shift >= 0L && shift <= 1000000L)
    // shift reproduces from the surface: (2·den − 6·Σd²)·1e6 / (2·den)
    val expect = ((2 * den - BigInt(6) * d2) * 1000000 / (2 * den)).toLong
    assert(shift == expect)
  }

  test("markov stationary vector stays a (floor-lossy) distribution") {
    val rows = run("q_markov_stationary")
      .select("state", "v_ppm").as[(String, Long)].collect()
    assert(rows.length >= 2 && rows.forall(_._2 > 0))
    val mass = rows.map(_._2).sum
    // each of the 3 iterations floors once per edge (≤ k² edges of ~5
    // states) plus the uniform init floors once per state — total
    // leakage well under 1000 ppm, and mass can never grow
    assert(mass <= 1000000L && mass >= 999000L)
  }
}
