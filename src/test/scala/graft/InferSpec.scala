package graft

import org.apache.spark.sql.functions._
import graft.stats.{Inferential, PValues}

class InferSpec extends SparkSpec {
  import spark.implicits._

  test("tTestWelch detects a mean shift and PValues agree with tables") {
    val rnd = new scala.util.Random(1)
    val rows = Seq.fill(500)(("a", 10.0 + rnd.nextGaussian())) ++
      Seq.fill(500)(("b", 10.5 + rnd.nextGaussian()))
    val df = rows.toDF("g", "x")
    val r = Inferential.tTestWelch(df, "x", "g", "a", "b").head
    val t = r.getAs[Double]("t_stat")
    assert(t < -3.0) // strong shift
    val p = PValues.tTwoSided(t, r.getAs[Double]("welch_df"))
    assert(p < 0.01)
  }

  test("chi2Test is ~0 for independent uniform labels") {
    val rnd = new scala.util.Random(5)
    val df = Seq.fill(2000)((rnd.nextInt(3).toString, rnd.nextInt(4).toString))
      .toDF("a", "b")
    val r = Inferential.chi2Test(df, "a", "b").head
    assert(r.getAs[Long]("dof") == 6)
    val p = PValues.chi2Upper(r.getAs[Double]("chi2"), r.getAs[Long]("dof").toDouble)
    assert(p > 0.001) // independence not rejected at extreme levels
  }

  test("ksTest D=0 for identical samples, large for disjoint ones") {
    val same = (Seq.fill(100)(("a", 1.0)) ++ Seq.fill(100)(("b", 1.0))).toDF("g", "x")
    assert(Inferential.ksTest(same, "x", "g", "a", "b").head.getDouble(0) == 0.0)
    val disj = (Seq.fill(100)(("a", 1.0)) ++ Seq.fill(100)(("b", 2.0))).toDF("g", "x")
    assert(Inferential.ksTest(disj, "x", "g", "a", "b").head.getDouble(0) == 1.0)
  }

  test("anovaF near 1 for equal-mean groups, large for shifted groups") {
    val rnd = new scala.util.Random(3)
    val eq = (1 to 900).map(i => (s"g${i % 3}", rnd.nextGaussian())).toDF("g", "x")
    val f1 = Inferential.anovaF(eq, "x", "g").head.getAs[Double]("f_stat")
    assert(f1 < 5.0)
    val sh = (1 to 900).map(i => (s"g${i % 3}", rnd.nextGaussian() + (i % 3) * 2.0))
      .toDF("g", "x")
    val f2 = Inferential.anovaF(sh, "x", "g").head.getAs[Double]("f_stat")
    assert(f2 > 100.0)
  }

  test("cronbachAlpha is high for correlated items") {
    val rnd = new scala.util.Random(9)
    val rows = Seq.fill(1000) {
      val base = rnd.nextGaussian() * 10
      (base + rnd.nextGaussian(), base + rnd.nextGaussian(), base + rnd.nextGaussian())
    }
    val df = rows.toDF("i1", "i2", "i3")
    val a = Inferential.cronbachAlpha(df, Seq("i1", "i2", "i3")).head.getDouble(0)
    assert(a > 0.9)
  }

  test("kruskalWallis matches the textbook no-tie value") {
    // groups {1,2,3},{4,5,6},{7,8,9}: ranks 1..9, H = 7.2 exactly
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0), ("b", 5.0),
      ("b", 6.0), ("c", 7.0), ("c", 8.0), ("c", 9.0)).toDF("g", "x")
    val r = Inferential.kruskalWallis(df, "x", "g").head
    assert(math.abs(r.getAs[Double]("h_stat") - 7.2) < 1e-9)
    assert(r.getAs[Long]("dof") == 2)
  }

  test("levene (Brown-Forsythe) matches a hand computation") {
    // Z1={1.5,.5,.5,1.5}, Z2={3,1,1,3}: W = (6/1)*(2/5) = 2.4
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 2.0), ("b", 4.0), ("b", 6.0), ("b", 8.0)).toDF("g", "x")
    val r = Inferential.levene(df, "x", "g").head
    assert(math.abs(r.getAs[Double]("w_stat") - 2.4) < 1e-9)
    assert(r.getAs[Long]("df_within") == 6)
  }

  test("wilcoxonSignedRank matches hand-ranked W+ and z") {
    // d = {1,-2,3,-4,5}: |d| ranks 1..5, W+ = 1+3+5 = 9,
    // z = (9 - 7.5) / sqrt(13.75)
    val df = Seq(1.0, -2.0, 3.0, -4.0, 5.0).toDF("d")
    val r = Inferential.wilcoxonSignedRank(df, col("d")).head
    assert(r.getAs[Double]("w_plus") == 9.0)
    assert(r.getAs[Long]("n_nonzero") == 5L)
    assert(math.abs(r.getAs[Double]("z_stat") - 1.5 / math.sqrt(13.75)) < 1e-9)
  }

  test("friedman matches the no-tie closed form") {
    // 3 blocks ranking 3 treatments identically: Q = 6
    val df = (1 to 3).flatMap(b =>
      Seq((b.toLong, 1, 1.0), (b.toLong, 2, 2.0), (b.toLong, 3, 3.0)))
      .toDF("blk", "trt", "x")
    val r = Inferential.friedman(df, "blk", "trt", "x", k = 3).head
    assert(math.abs(r.getAs[Double]("q_stat") - 6.0) < 1e-9)
    assert(r.getAs[Long]("n_blocks") == 3)
  }

  test("mcnemar continuity-corrected chi2 from discordant counts") {
    // b10=5, b01=1: (|5-1|-1)^2/6 = 1.5
    val rows = Seq.fill(5)((true, false)) ++ Seq((false, true)) ++
      Seq.fill(10)((true, true))
    val df = rows.toDF("a", "b")
    val r = Inferential.mcnemar(df, col("a"), col("b")).head
    assert(r.getAs[Double]("chi2_cc") == 1.5)
    assert(r.getAs[Long]("b10") == 5 && r.getAs[Long]("b01") == 1)
  }

  test("PValues special functions match known values") {
    assert(math.abs(PValues.logGamma(5.0) - math.log(24.0)) < 1e-10)
    assert(math.abs(PValues.gammaP(1.0, 1.0) - (1 - math.exp(-1.0))) < 1e-10)
    // t with huge df ~ normal: two-sided p at t=1.96 ≈ 0.05
    assert(math.abs(PValues.tTwoSided(1.96, 1e6) - 0.05) < 0.001)
  }
}
