package graft

import org.apache.spark.sql.functions._
import graft.ts.{PerGroup, Windows}

class PerGroupSpec extends SparkSpec {
  import spark.implicits._

  test("ewm matches the hand-computed pandas ewm(adjust=True) values") {
    val df = Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 3.0))
      .toDF("k", "t", "v")
    val out = PerGroup.ewm(df, "k", "t", "v", alpha = 0.5)
      .orderBy("t").select("ewm").as[Double].collect().toSeq
    // pandas ewm(alpha=.5, adjust=True): [1.0, (2+0.5*1)/1.5, (3+0.5*2+0.25*1)/1.75]
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(math.abs(out(1) - 2.5 / 1.5) < 1e-12)
    assert(math.abs(out(2) - 4.25 / 1.75) < 1e-12)
  }

  test("adf separates a random walk from white noise") {
    val rnd = new scala.util.Random(11)
    val walk = Iterator.iterate(0.0)(_ + rnd.nextGaussian()).take(300).toSeq
    val noise = Seq.fill(300)(rnd.nextGaussian())
    val df = (walk.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) } ++
      noise.zipWithIndex.map { case (v, i) => (2L, i.toLong, v) })
      .toDF("k", "t", "v")
    val out = PerGroup.adf(df, "k", "t", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(2L) < -5.0)       // white noise: strongly stationary
    assert(out(1L) > -3.0)       // random walk: fails to reject unit root
    assert(out(2L) < out(1L))
  }

  test("stl recovers trend and seasonality from a synthetic series") {
    val period = 12
    val rnd = new scala.util.Random(5)
    val vals = (0 until 240).map { i =>
      0.05 * i + 3.0 * math.sin(2 * math.Pi * i / period) + 0.2 * rnd.nextGaussian()
    }
    val df = vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
      .toDF("k", "t", "v")
    val out = PerGroup.stl(df, "k", "t", "v", period).orderBy("t").collect()
    // components reconstruct the series exactly
    assert(out.forall(r => math.abs(r.getDouble(2) -
      (r.getDouble(3) + r.getDouble(4) + r.getDouble(5))) < 1e-9))
    // trend rises by ~0.05/step over the middle section
    val mid = out.slice(60, 180)
    val slope = (mid.last.getDouble(3) - mid.head.getDouble(3)) / 120.0
    assert(slope > 0.03 && slope < 0.07)
    // seasonal amplitude ~3 and residual small
    val seas = out.map(_.getDouble(4))
    assert(seas.max > 2.0 && seas.min < -2.0)
    val residRms = math.sqrt(out.map(r => math.pow(r.getDouble(5), 2)).sum / out.length)
    assert(residRms < 1.0)
  }

  test("kpss distinguishes stationary noise from a random walk") {
    val rnd = new scala.util.Random(13)
    val walk = Iterator.iterate(0.0)(_ + rnd.nextGaussian()).take(400).toSeq
    val noise = Seq.fill(400)(rnd.nextGaussian())
    val df = (walk.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) } ++
      noise.zipWithIndex.map { case (v, i) => (2L, i.toLong, v) })
      .toDF("k", "t", "v")
    val out = PerGroup.kpss(df, "k", "t", "v")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out(2L) < 0.463)  // stationary: below 5% critical value
    assert(out(1L) > 0.463)  // random walk: rejects stationarity
  }

  test("pacf of an AR(1) process is near zero beyond lag 1") {
    val rnd = new scala.util.Random(21)
    var x = 0.0
    val vals = (0 until 2000).map { _ => x = 0.7 * x + rnd.nextGaussian(); x }
    val df = vals.zipWithIndex.map { case (v, i) => (1, i.toLong, v) }
      .toDF("g", "t", "v")
    val p = graft.ts.Temporal.pacf(df, "v", 3, Seq("g"), Seq(col("t")))
      .collect().map(r => r.getInt(1) -> r.getDouble(2)).toMap
    assert(p(1) > 0.6)               // strong AR(1) coefficient
    assert(math.abs(p(2)) < 0.1)     // partial correlations vanish
    assert(math.abs(p(3)) < 0.1)
  }

  test("convolve with identity kernel returns the value itself") {
    val df = (1 to 20).map(i => (1, i.toLong, i * 1.5)).toDF("g", "t", "v")
    val out = Windows.convolve(df, "v", Seq(0.0, 1.0, 0.0),
        Seq("g"), Seq(col("t")), "c")
      .filter(col("c").isNotNull)
    assert(out.filter(col("c") =!= col("v")).count() == 0)
    assert(out.count() == 18) // edges trimmed
  }

  test("rollingStd of a constant series is 0") {
    val df = (1 to 30).map(i => (1, i.toLong, 5.0)).toDF("g", "t", "v")
    val out = Windows.rollingStd(df, "v", 7, Seq("g"), Seq(col("t")), "s")
      .filter(col("s").isNotNull)
    assert(out.filter(col("s") =!= 0.0).count() == 0)
  }

  test("torresVerdin matches the reference recursion and adapts to jumps") {
    val vals = Seq(1.0, 1.1, 0.9, 1.0, 10.0, 10.1, 9.9, 10.0)
    val df = vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
      .toDF("k", "t", "v")
    val got = PerGroup.torresVerdin(df, "k", "t", null, "v",
        weightFactor = 0.1, beta = 1.0)
      .orderBy("t").select("ama").as[Double].collect()
    // reference fold (spatial_utils.py:4685 semantics)
    val expect = {
      val out = Array.fill(vals.size)(0.0)
      out(0) = vals.head
      for (i <- 1 until vals.size) {
        val w = math.min(0.1 * (1 + 1.0 * math.abs(vals(i) - vals(i - 1))), 1.0)
        out(i) = w * vals(i) + (1 - w) * out(i - 1)
      }
      out
    }
    assert(got.toSeq === expect.toSeq)
    // adaptivity: the step from 1.0 to 10.0 raises w from 0.1 to ~1, so
    // the filter reaches the new level far faster than a fixed-0.1 EMA
    val fixed = vals.tail.foldLeft(vals.head)((a, v) => 0.1 * v + 0.9 * a)
    assert(got.last > 9.0 && fixed < 6.0)
  }

  test("torresVerdin logify filters in log10 space and returns 10^ama") {
    val vals = Seq(10.0, 100.0, 1000.0, 100.0)
    val df = vals.zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
      .toDF("k", "t", "v")
    val lin = PerGroup.torresVerdin(
      df.withColumn("v", log10(col("v"))), "k", "t", null, "v")
      .orderBy("t").select("ama").as[Double].collect()
    val log = PerGroup.torresVerdin(df, "k", "t", null, "v", logify = true)
      .orderBy("t").select("ama").as[Double].collect()
    lin.zip(log).foreach { case (l, g) =>
      assert(math.abs(math.pow(10, l) - g) < 1e-9, s"$l vs $g") }
  }
}
