package graft.ts

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Per-series recursive/model-fitting operators via
  * `groupByKey.flatMapGroups` — the documented escape hatch (SURVEY
  * §2.13/§7.3) for computations that are sequential within a series but
  * embarrassingly parallel across series. One group must fit in an
  * executor's memory: that is the operator contract (chunk long series
  * upstream if needed).
  */
object PerGroup {

  /** Exact (infinite-memory) exponential moving average per series —
    * pandas `ewm(alpha).mean()` / `adaptive_moving_average`
    * (gofast/utils/spatial_utils.py:5043). Recursive, so not
    * window-expressible; each series is folded in event order. */
  def ewm(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
          alpha: Double, outName: String = "ewm"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df.select(col(keyCol).cast("long"), col(tsCol).cast("long"),
      col(valueCol).cast("double")).as[(Long, Long, Double)]
    prepared.groupByKey(_._1).flatMapGroups { (key, it) =>
      val rows = it.toArray.sortBy(_._2)
      var num = 0.0; var den = 0.0
      rows.map { case (_, t, v) =>
        num = v + (1 - alpha) * num
        den = 1 + (1 - alpha) * den
        (key, t, v, num / den)
      }
    }.toDF(keyCol, tsCol, valueCol, outName)
  }

  /** Torres-Verdín adaptive moving average (EMAP spatial filter):
    * w_i = min(wf·(1 + β·|y_i − y_{i−1}|), 1),
    * ama_i = w_i·y_i + (1 − w_i)·ama_{i−1}, ama_0 = y_0 — the weight
    * rises with local volatility so sharp fronts are tracked while
    * quiet intervals smooth hard. Reference: `torres_verdin_filter`
    * (gofast/utils/spatial_utils.py:4685). Data-dependent weights make
    * the recursion non-linear, so it is not window-expressible; each
    * bounded series is folded in event order like [[ewm]]. `logify`
    * filters log10(y) and returns 10^ama (resistivity/phase data).
    * Output: one row per input row (key, ts, tie, value, `outName`). */
  def torresVerdin(df: DataFrame, keyCol: String, tsCol: String,
                   tieCol: String, valueCol: String,
                   weightFactor: Double = 0.1, beta: Double = 1.0,
                   logify: Boolean = false, outName: String = "ama")
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val tie = if (tieCol == null) lit(0L) else col(tieCol).cast("long")
    val prepared = df.select(col(keyCol).cast("long"), col(tsCol).cast("long"),
      tie, col(valueCol).cast("double")).as[(Long, Long, Long, Double)]
    prepared.groupByKey(_._1).flatMapGroups { (key, it) =>
      val rows = it.toArray.sortBy(r => (r._2, r._3))
      var ama = 0.0
      var pv = 0.0
      var first = true
      rows.iterator.map { case (_, t, e, v0) =>
        val v = if (logify) math.log10(v0) else v0
        if (first) { first = false; ama = v }
        else {
          val w = math.min(weightFactor * (1 + beta * math.abs(v - pv)), 1.0)
          ama = w * v + (1 - w) * ama
        }
        pv = v
        (key, t, e, v0, if (logify) math.pow(10, ama) else ama)
      }
    }.toDF(keyCol, tsCol, "_tie", valueCol, outName).drop("_tie")
  }

  /** Augmented Dickey-Fuller (one augmenting lag, constant included)
    * per series: regress Δy_t on [1, y_{t-1}, Δy_{t-1}] and return the
    * t-statistic of the y_{t-1} coefficient. Strongly negative ⇒
    * stationary. Reference: `trend_analysis(method='adf')`
    * (gofast/utils/ts_utils.py:720). Hand-rolled 3×3 normal equations —
    * no linalg dependency. */
  def adf(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      tieCol: String = null): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // tieCol breaks duplicate-timestamp ordering; without it the sort
    // within a tie depends on shuffle iteration order (nondeterministic).
    val tie = if (tieCol == null) lit(0L) else col(tieCol).cast("long")
    val prepared = df.select(col(keyCol).cast("long"), col(tsCol).cast("long"),
      tie, col(valueCol).cast("double")).as[(Long, Long, Long, Double)]
    prepared.groupByKey(_._1).mapGroups { (key, it) =>
      val y = it.toArray.sortBy(r => (r._2, r._3)).map(_._4)
      if (y.length < 8) (key, Double.NaN, y.length)
      else {
        val dy = y.indices.tail.map(i => y(i) - y(i - 1)).toArray
        // rows t = 2..n-1: target dy(t), regressors [1, y(t-1), dy(t-1)]
        val xs = (1 until dy.length).map(t => Array(1.0, y(t), dy(t - 1))).toArray
        val ys = (1 until dy.length).map(t => dy(t)).toArray
        val p = 3
        val xtx = Array.ofDim[Double](p, p)
        val xty = new Array[Double](p)
        for (r <- xs.indices; i <- 0 until p) {
          xty(i) += xs(r)(i) * ys(r)
          for (j <- 0 until p) xtx(i)(j) += xs(r)(i) * xs(r)(j)
        }
        // solve xtx * b = xty (Gaussian elimination, partial pivot)
        val a = xtx.map(_.clone)
        val b = xty.clone
        for (c <- 0 until p) {
          val piv = (c until p).maxBy(r => math.abs(a(r)(c)))
          val tmp = a(c); a(c) = a(piv); a(piv) = tmp
          val tb = b(c); b(c) = b(piv); b(piv) = tb
          for (r <- c + 1 until p) {
            val f = a(r)(c) / a(c)(c)
            for (k <- c until p) a(r)(k) -= f * a(c)(k)
            b(r) -= f * b(c)
          }
        }
        val beta = new Array[Double](p)
        for (c <- (p - 1) to 0 by -1) {
          var s = b(c)
          for (k <- c + 1 until p) s -= a(c)(k) * beta(k)
          beta(c) = s / a(c)(c)
        }
        val resid = xs.indices.map(r =>
          ys(r) - (0 until p).map(i => beta(i) * xs(r)(i)).sum)
        val dof = xs.length - p
        val sigma2 = resid.map(e => e * e).sum / dof
        // var(beta_1) = sigma2 * (XtX)^-1[1][1] via solving for e1
        val inv1 = solveFor(xtx, 1)
        val se = math.sqrt(sigma2 * inv1)
        (key, beta(1) / se, y.length)
      }
    }.toDF(keyCol, "adf_t", "n")
  }

  /** Tricube-weighted local linear regression (loess) smoother —
    * the STL building block. O(n·q) per series; series-local. */
  private[ts] def loess(ys: Array[Double], frac: Double): Array[Double] = {
    val n = ys.length
    // clamp q to the series length: a 2-point cycle-subseries with
    // q=3 made hi = lo+q-1 read past the array
    val q = math.min(n, math.max(3, math.ceil(frac * n).toInt))
    Array.tabulate(n) { i =>
      val lo = math.max(0, math.min(i - q / 2, n - q))
      val hi = lo + q - 1
      val maxD = math.max(i - lo, hi - i).toDouble.max(1.0)
      var sw = 0.0; var swx = 0.0; var swy = 0.0; var swxx = 0.0; var swxy = 0.0
      var j = lo
      while (j <= hi) {
        val u = math.abs(j - i) / maxD
        val w = { val t = 1 - u * u * u; t * t * t }
        sw += w; swx += w * j; swy += w * ys(j)
        swxx += w * j * j; swxy += w * j * ys(j)
        j += 1
      }
      val den = sw * swxx - swx * swx
      if (math.abs(den) < 1e-12) swy / sw
      else {
        val b = (sw * swxy - swx * swy) / den
        val a = (swy - b * swx) / sw
        a + b * i
      }
    }
  }

  /** STL-style seasonal-trend decomposition per series: iterated
    * loess smoothing of cycle-subseries (seasonal) and of the
    * deseasonalized series (trend).
    * Reference: `decompose_ts(method='stl')`
    * (gofast/utils/ts_utils.py:2263; SURVEY: "STL = per-key
    * flatMapGroups loop"). Output: one row per input point with
    * (key, ts, value, trend, seasonal, resid). */
  def stl(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
          period: Int, iterations: Int = 2,
          seasonalFrac: Double = 0.6, trendFrac: Double = 0.4): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df.select(col(keyCol).cast("long"), col(tsCol).cast("long"),
      col(valueCol).cast("double")).as[(Long, Long, Double)]
    prepared.groupByKey(_._1).flatMapGroups { (key, it) =>
      val rows = it.toArray.sortBy(_._2)
      val y = rows.map(_._3)
      val n = y.length
      if (n < 2 * period) {
        rows.map { case (_, t, v) => (key, t, v, Double.NaN, Double.NaN, Double.NaN) }
      } else {
        var trend = new Array[Double](n)
        var seasonal = new Array[Double](n)
        for (_ <- 1 to iterations) {
          val detr = Array.tabulate(n)(i => y(i) - trend(i))
          // loess-smooth each cycle-subseries
          val seas = new Array[Double](n)
          for (p <- 0 until period) {
            val idxs = p.until(n, period).toArray
            val sub = idxs.map(detr)
            val smooth = loess(sub, seasonalFrac)
            idxs.zip(smooth).foreach { case (ix, v) => seas(ix) = v }
          }
          // low-pass the seasonal candidate (centered MA of one period)
          // and subtract it: removes the trend that leaks into the
          // cycle-subseries smooths (the STL low-pass step).
          val half = period / 2
          val lowPass = Array.tabulate(n) { i =>
            val lo = math.max(0, i - half); val hi = math.min(n - 1, i + half)
            var s = 0.0; var j = lo
            while (j <= hi) { s += seas(j); j += 1 }
            s / (hi - lo + 1)
          }
          seasonal = Array.tabulate(n)(i => seas(i) - lowPass(i))
          val deseason = Array.tabulate(n)(i => y(i) - seasonal(i))
          trend = loess(deseason, trendFrac)
        }
        rows.zipWithIndex.map { case ((_, t, v), i) =>
          (key, t, v, trend(i), seasonal(i), v - trend(i) - seasonal(i))
        }
      }
    }.toDF(keyCol, tsCol, valueCol, "trend", "seasonal", "resid")
  }

  /** KPSS level-stationarity statistic per series:
    * η = Σ_t S_t² / (n² σ̂²) with S_t the partial sums of demeaned
    * values and σ̂² the Newey-West long-run variance (Bartlett kernel,
    * lag ⌊4(n/100)^0.25⌋). Large η ⇒ REJECT stationarity (complement of
    * [[adf]]). Reference: `trend_analysis(method='kpss')`
    * (gofast/utils/ts_utils.py:720). */
  def kpss(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
      tieCol: String = null): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // tieCol: see [[adf]] — duplicate timestamps need a total order for
    // the partial-sum statistic to be deterministic across runs.
    val tie = if (tieCol == null) lit(0L) else col(tieCol).cast("long")
    val prepared = df.select(col(keyCol).cast("long"), col(tsCol).cast("long"),
      tie, col(valueCol).cast("double")).as[(Long, Long, Long, Double)]
    prepared.groupByKey(_._1).mapGroups { (key, it) =>
      val y = it.toArray.sortBy(r => (r._2, r._3)).map(_._4)
      val n = y.length
      if (n < 10) (key, Double.NaN, n)
      else {
        val mean = y.sum / n
        val e = y.map(_ - mean)
        val s = e.scanLeft(0.0)(_ + _).tail // partial sums
        val lag = math.floor(4.0 * math.pow(n / 100.0, 0.25)).toInt
        var lrv = e.map(x => x * x).sum / n
        for (l <- 1 to lag) {
          val gamma = (l until n).map(t => e(t) * e(t - l)).sum / n
          lrv += 2.0 * (1.0 - l.toDouble / (lag + 1)) * gamma
        }
        val eta = s.map(x => x * x).sum / (n.toDouble * n * lrv)
        (key, eta, n)
      }
    }.toDF(keyCol, "kpss_eta", "n")
  }

  /** column `idx` of (m)^-1 e_idx — one Gaussian solve. */
  private def solveFor(m: Array[Array[Double]], idx: Int): Double = {
    val p = m.length
    val a = m.map(_.clone)
    val b = Array.tabulate(p)(i => if (i == idx) 1.0 else 0.0)
    for (c <- 0 until p) {
      val piv = (c until p).maxBy(r => math.abs(a(r)(c)))
      val tmp = a(c); a(c) = a(piv); a(piv) = tmp
      val tb = b(c); b(c) = b(piv); b(piv) = tb
      for (r <- c + 1 until p) {
        val f = a(r)(c) / a(c)(c)
        for (k <- c until p) a(r)(k) -= f * a(c)(k)
        b(r) -= f * b(c)
      }
    }
    val x = new Array[Double](p)
    for (c <- (p - 1) to 0 by -1) {
      var s = b(c)
      for (k <- c + 1 until p) s -= a(c)(k) * x(k)
      x(c) = s / a(c)(c)
    }
    x(idx)
  }
}
