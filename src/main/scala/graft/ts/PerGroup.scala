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

  /** Augmented Dickey-Fuller (one augmenting lag, constant included)
    * per series: regress Δy_t on [1, y_{t-1}, Δy_{t-1}] and return the
    * t-statistic of the y_{t-1} coefficient. Strongly negative ⇒
    * stationary. Reference: `trend_analysis(method='adf')`
    * (gofast/utils/ts_utils.py:720). Hand-rolled 3×3 normal equations —
    * no linalg dependency. */
  def adf(df: DataFrame, keyCol: String, tsCol: String, valueCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df.select(col(keyCol).cast("long"), col(tsCol).cast("long"),
      col(valueCol).cast("double")).as[(Long, Long, Double)]
    prepared.groupByKey(_._1).mapGroups { (key, it) =>
      val y = it.toArray.sortBy(_._2).map(_._3)
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

  /** KPSS level-stationarity statistic per series:
    * η = Σ_t S_t² / (n² σ̂²) with S_t the partial sums of demeaned
    * values and σ̂² the Newey-West long-run variance (Bartlett kernel,
    * lag ⌊4(n/100)^0.25⌋). Large η ⇒ REJECT stationarity (complement of
    * [[adf]]). Reference: `trend_analysis(method='kpss')`
    * (gofast/utils/ts_utils.py:720). */
  def kpss(df: DataFrame, keyCol: String, tsCol: String, valueCol: String)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val prepared = df.select(col(keyCol).cast("long"), col(tsCol).cast("long"),
      col(valueCol).cast("double")).as[(Long, Long, Double)]
    prepared.groupByKey(_._1).mapGroups { (key, it) =>
      val y = it.toArray.sortBy(_._2).map(_._3)
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
