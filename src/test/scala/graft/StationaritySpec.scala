package graft

import org.apache.spark.sql.functions._
import graft.ts.{PerGroup, Stationarity, Temporal}

/** Cross-validates the distributed closed-form stationarity statistics
  * against the per-group (flatMapGroups) reference implementations on
  * identical 2-dp series — the closed forms aggregate exact decimals,
  * so they must agree with the in-memory float recursions to ~1e-6.
  */
class StationaritySpec extends SparkSpec {
  import spark.implicits._

  // two 2-dp series: a trending walk and mean-reverting noise
  private lazy val df = {
    val rnd = new scala.util.Random(7)
    def q(x: Double) = math.rint(x * 100) / 100
    val walk = Iterator.iterate(50.0)(v => q(v + rnd.nextGaussian()))
      .take(200).toSeq
    val noise = Seq.fill(200)(q(20 + 3 * rnd.nextGaussian()))
    (walk.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) } ++
      noise.zipWithIndex.map { case (v, i) => (2L, i.toLong, v) })
      .toDF("k", "t", "v")
  }

  test("closed-form ADF matches the per-group Gaussian-elimination fit") {
    val cf = Stationarity.adf(df, "k", Seq(col("t")), "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pg = PerGroup.adf(df, "k", "t", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (k <- Seq(1L, 2L))
      assert(math.abs(cf(k) - pg(k)) < 1e-6, s"series $k: ${cf(k)} vs ${pg(k)}")
  }

  test("closed-form KPSS matches the per-group partial-sum statistic") {
    val cf = Stationarity.kpss(df, "k", Seq(col("t")), "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pg = PerGroup.kpss(df, "k", "t", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for (k <- Seq(1L, 2L))
      assert(math.abs(cf(k) - pg(k)) < 1e-6, s"series $k: ${cf(k)} vs ${pg(k)}")
    // and the verdicts separate: the walk is non-stationary (large eta)
    assert(cf(1L) > cf(2L))
  }

  test("KPSS at n=1e5 with TPC-H magnitudes yields exact non-null eta") {
    // linear ramp to 1e5: |P_t| peaks at n^3/8 ≈ 1.25e14, whose square
    // overflowed the old decimal(28,4) carrier; decimal(38,4) holds it
    val big = spark.range(1, 100001).select(lit(1L).as("k"),
      col("id").as("t"), col("id").cast("double").as("v"))
    val r = Stationarity.kpss(big, "k", Seq(col("t")), "v").head()
    assert(!r.isNullAt(1) && !r.getDouble(1).isNaN && r.getDouble(1) > 0)
    assert(r.getLong(2) === 100000L)
  }

  test("KPSS auto-sizes the Bartlett lag past 8 and errors on truncation") {
    val rnd = new scala.util.Random(11)
    def q(x: Double) = math.rint(x * 100) / 100
    val s = Seq.tabulate(3000)(i => (1L, i.toLong, q(20 + 3 * rnd.nextGaussian())))
      .toDF("k", "t", "v")
    assert(Stationarity.bartlettLag(3000) === 9) // exceeds the old fixed 8
    val auto = Stationarity.kpss(s, "k", Seq(col("t")), "v")
      .head().getDouble(1)
    val wide = Stationarity.kpss(s, "k", Seq(col("t")), "v", maxLag = 15)
      .head().getDouble(1)
    assert(auto === wide) // every weighted gamma term l <= 9 included in both
    intercept[Exception] { // explicit maxLag too small must fail LOUDLY
      Stationarity.kpss(s, "k", Seq(col("t")), "v", maxLag = 8).collect()
    }
  }

  test("closed-form PACF(1..3) matches driver-side Durbin-Levinson") {
    val cf = Stationarity.pacf3(df, "k", Seq(col("t")), "v")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val dl = Temporal.pacf(df, "v", 3, Seq("k"), Seq(col("t")))
      .collect().map(r => (r.getString(0).toLong, r.getInt(1)) -> r.getDouble(2)).toMap
    for (k <- Seq(1L, 2L); l <- 1 to 3)
      assert(math.abs(cf((k, l)) - dl((k, l))) < 1e-6,
        s"series $k lag $l: ${cf((k, l))} vs ${dl((k, l))}")
  }
}
