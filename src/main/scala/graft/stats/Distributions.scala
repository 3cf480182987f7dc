package graft.stats

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Distribution scalar functions as column expressions
  * (gofast/stats/probs.py: `normal_pdf` :236, `normal_cdf` :303,
  * `binomial_pmf` :362, `poisson_logpmf` :425).
  * exp/pow cross libm boundaries, so results are rounded at 9 dp for
  * engine portability.
  */
object Distributions {

  def normalPdf(x: Column, mu: Double = 0.0, sigma: Double = 1.0): Column = {
    val z = (x - mu) / sigma
    round(exp(z * z * -0.5) / (sigma * math.sqrt(2 * math.Pi)), 9)
  }

  /** Φ(x) via the Abramowitz–Stegun 7.1.26 erf approximation (|ε|<1.5e-7)
    * — Spark SQL has no erf; identical polynomial on both engines. */
  def normalCdf(x: Column, mu: Double = 0.0, sigma: Double = 1.0): Column = {
    val z = (x - mu) / (sigma * math.sqrt(2.0))
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * abs(z))
    val poly = t * (lit(0.254829592) + t * (lit(-0.284496736) +
      t * (lit(1.421413741) + t * (lit(-1.453152027) + t * lit(1.061405429)))))
    val erfAbs = lit(1.0) - poly * exp(-abs(z) * abs(z))
    val erf = when(z >= 0, erfAbs).otherwise(-erfAbs)
    round(lit(0.5) * (lit(1.0) + erf), 9)
  }

  /** Poisson log-pmf k·lnλ − λ − ln(k!) for small k: ln(k!) from exact
    * driver-side factorials (probs.py:425). */
  def poissonLogPmf(k: Column, lambda: Double, maxK: Int = 20): Column = {
    val lnFact = (0 to maxK).map { kk =>
      kk -> math.log((1 to kk).foldLeft(1.0)(_ * _))
    }
    val m = map(lnFact.flatMap { case (kk, v) => Seq(lit(kk), lit(v)) }: _*)
    round(k.cast("double") * math.log(lambda) - lambda - element_at(m, k.cast("int")), 9)
  }

  /** C(n,k)·pᵏ(1−p)ⁿ⁻ᵏ for a small fixed n: the binomial coefficients
    * are exact driver-side longs baked into a map literal. */
  def binomialPmf(k: Column, n: Int, p: Double): Column = {
    require(n <= 60, "factorials exact only for small n")
    val coeffs = (0 to n).map { kk =>
      var c = 1.0
      for (i <- 0 until kk) c = c * (n - i) / (i + 1)
      kk -> c
    }
    val coefMap = map(coeffs.flatMap { case (kk, c) => Seq(lit(kk), lit(c)) }: _*)
    round(element_at(coefMap, k.cast("int")) *
      pow(lit(p), k.cast("double")) * pow(lit(1 - p), lit(n.toDouble) - k), 9)
  }
}
