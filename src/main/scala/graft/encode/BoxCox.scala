package graft.encode

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Box-Cox power transform with two-pass λ selection.
  *
  * Reference: `boxcox_transformation` (gofast/dataops/
  * preprocessing.py:2545), `handle_skew` (quality.py:4372).
  *
  * Fit = ONE aggregate pass computing, for every λ on the grid, the
  * profile log-likelihood from sufficient statistics
  * (n, Σlog x, mean/var of y_λ); the driver picks argmax. Transform is
  * a codegen'd expression. Data is scanned twice total, independent of
  * grid size — the reference recomputes the transform per λ.
  */
object BoxCox {

  def transformExpr(c: Column, lambda: Double): Column =
    if (lambda == 0.0) log(c)
    else (pow(c, lambda) - 1.0) / lambda

  /** Profile log-likelihood of λ (up to constants):
    * −n/2·ln(σ²_λ) + (λ−1)·Σlog x, with σ² the population variance of
    * the transformed values. */
  def fit(df: DataFrame, column: String,
          grid: Seq[Double] = Seq(-2, -1.5, -1, -0.5, 0, 0.5, 1, 1.5, 2))
      : Double = {
    val c = col(column)
    val aggs = grid.zipWithIndex.flatMap { case (l, i) =>
      val y = transformExpr(c, l)
      Seq(avg(y).as(s"m$i"), var_pop(y).as(s"v$i"))
    } ++ Seq(sum(log(c)).as("slog"), count(c).cast("double").as("n"))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val slog = r.getAs[Double]("slog")
    val n = r.getAs[Double]("n")
    val lls = grid.zipWithIndex.map { case (l, i) =>
      val v = r.getAs[Double](s"v$i")
      l -> (-n / 2.0 * math.log(v) + (l - 1.0) * slog)
    }
    lls.maxBy(_._2)._1
  }

  /** Fit λ on `column`, append the transformed column. */
  def fitTransform(df: DataFrame, column: String, outName: String,
                   grid: Seq[Double] = Seq(-2, -1.5, -1, -0.5, 0, 0.5, 1, 1.5, 2))
      : (DataFrame, Double) = {
    val lambda = fit(df, column, grid)
    (df.withColumn(outName, transformExpr(col(column), lambda)), lambda)
  }
}
