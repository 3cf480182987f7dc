package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** OLS y = Xβ from sufficient statistics (SURVEY §2.9 math:
  * `adjust_for_control_vars` gofast/utils/mathext.py:3217,
  * `calculate_residuals` :3912, `gradient_descent` :5008 — closed form
  * replaces the iterative fit).
  *
  * ONE aggregate pass computes X'X and X'y (p² + p sums, map-side
  * combined); the p×p solve happens on the driver. Row count is
  * irrelevant; p (regressors) is small by construction.
  */
object Regression {

  case class Fit(names: Seq[String], beta: Seq[Double]) {
    def predictExpr: Column =
      names.zip(beta).map {
        case ("__intercept", b) => lit(b)
        case (c, b) => col(c) * b
      }.reduce(_ + _)
  }

  /** Fit OLS with intercept; returns coefficient per regressor. */
  def ols(df: DataFrame, yCol: String, xCols: Seq[String]): Fit = {
    val names = "__intercept" +: xCols
    def x(i: Int): Column = if (i == 0) lit(1.0) else col(xCols(i - 1))
    val p = names.size
    val aggs =
      (for (i <- 0 until p; j <- i until p) yield
        sum(x(i) * x(j)).as(s"xx_${i}_$j")) ++
      (for (i <- 0 until p) yield sum(x(i) * col(yCol)).as(s"xy_$i"))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val xtx = Array.ofDim[Double](p, p)
    var idx = 0
    for (i <- 0 until p; j <- i until p) {
      xtx(i)(j) = r.getDouble(idx); xtx(j)(i) = xtx(i)(j); idx += 1
    }
    val xty = Array.tabulate(p)(i => r.getDouble(idx + i))
    // Gaussian elimination with partial pivoting
    val a = xtx.map(_.clone); val b = xty.clone
    for (c <- 0 until p) {
      val piv = (c until p).maxBy(rr => math.abs(a(rr)(c)))
      val t = a(c); a(c) = a(piv); a(piv) = t
      val tb = b(c); b(c) = b(piv); b(piv) = tb
      for (rr <- c + 1 until p) {
        val f = a(rr)(c) / a(c)(c)
        for (k <- c until p) a(rr)(k) -= f * a(c)(k)
        b(rr) -= f * b(c)
      }
    }
    val beta = new Array[Double](p)
    for (c <- (p - 1) to 0 by -1) {
      var s = b(c)
      for (k <- c + 1 until p) s -= a(c)(k) * beta(k)
      beta(c) = s / a(c)(c)
    }
    Fit(names, beta.toSeq)
  }

  /** Regression error metrics (`compute_errors`, mathext.py:4887) for
    * the one-regressor OLS ŷ = a + b·x, entirely in-plan: slope and
    * intercept come from exact-decimal moments (closed form — no driver
    * round-trip), residuals are quantized to 3 dp so their absolute and
    * squared sums aggregate exactly in decimal, and SStot comes from
    * the same exact moments. Output: one row (mae, rmse, r2, n). */
  def errorMetricsSimple(df: DataFrame, yCol: String, xCol: String)
      : DataFrame = {
    val xd = col(xCol).cast("decimal(12,2)")
    val yd = col(yCol).cast("decimal(12,2)")
    val m = df.filter(col(xCol).isNotNull && col(yCol).isNotNull).agg(
      count(lit(1)).as("_nl"),
      sum(xd).cast("double").as("sx"), sum(yd).cast("double").as("sy"),
      sum((xd * yd).cast("decimal(28,4)")).cast("double").as("sxy"),
      sum((xd * xd).cast("decimal(28,4)")).cast("double").as("sxx"),
      sum((yd * yd).cast("decimal(28,4)")).cast("double").as("syy"))
    val n = col("_nl").cast("double")
    val slope = (n * col("sxy") - col("sx") * col("sy")) /
      (n * col("sxx") - col("sx") * col("sx"))
    val fitted = m.select(col("_nl"), slope.as("b"),
      ((col("sy") - slope * col("sx")) / n).as("a"),
      (col("syy") - col("sy") * col("sy") / n).as("sstot"))
    // e3 = round(1000·(y − ŷ)): identical doubles in, identical bigint
    // out; |e3| and e3² then sum exactly in decimal on any engine.
    val joined = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .crossJoin(broadcast(fitted))
    val e3 = round((col(yCol).cast("double") -
      (col("a") + col("b") * col(xCol).cast("double"))) * 1000.0, 0)
      .cast("long")
    joined.groupBy("_nl", "sstot")
      .agg(sum(abs(e3).cast("decimal(38,0)")).cast("double").as("_sa"),
           sum((e3 * e3).cast("decimal(38,0)")).cast("double").as("_sq"))
      .select({
        val nn = col("_nl").cast("double")
        Seq(round(col("_sa") / 1000.0 / nn, 6).as("mae"),
            round(sqrt(col("_sq") / 1000000.0 / nn), 6).as("rmse"),
            round(lit(1.0) - (col("_sq") / 1000000.0) / col("sstot"), 9).as("r2"),
            col("_nl").as("n"))
      }: _*)
  }

  /** Residualize `yCol` against controls: y − ŷ (the
    * `adjust_for_control_vars` regression branch). */
  def residualize(df: DataFrame, yCol: String, controls: Seq[String],
                  outName: String): DataFrame = {
    val fit = ols(df, yCol, controls)
    df.withColumn(outName, col(yCol) - fit.predictExpr)
  }
}
