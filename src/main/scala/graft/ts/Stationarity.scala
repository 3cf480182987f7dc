package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed closed-form stationarity statistics.
  *
  * [[PerGroup.adf]]/[[PerGroup.kpss]] hold one series per task
  * (`flatMapGroups`) — fine for bounded series, but a 100 TB table with
  * billion-row series needs the statistic as a *plan*, not a loop. The
  * regressions involved are small enough to solve in closed form from
  * sufficient statistics, so each test here is: one ordered window pass
  * (lags / partial sums, exact decimal carriers) → one groupBy of
  * exact-decimal sums → scalar IEEE arithmetic on the aggregated row.
  * Two shuffles total, no task ever materializes a series, and every
  * sum is order-independent (decimal) — deterministic across cluster
  * sizes AND engines, hence DuckDB-oracle-checkable.
  *
  * Reference semantics: `trend_analysis(method='adf'|'kpss')`
  * (gofast/utils/ts_utils.py:720) and `ts_corr_analysis` PACF
  * (gofast/utils/ts_utils.py:2913).
  */
object Stationarity {

  private def dec2(c: Column): Column = c.cast("decimal(12,2)")
  /** exact product of two ≤2-dp decimals, summed exactly. */
  private def prodSum(a: Column, b: Column, m: Column): Column =
    sum(when(m, (a * b).cast("decimal(28,4)"))).cast("double")
  private def decSum(c: Column, m: Column): Column =
    sum(when(m, c)).cast("double")

  /** Augmented Dickey–Fuller t-statistic (one augmenting lag, constant
    * included), solved in closed form: regress g = Δy_t on
    * x = [1, y_{t−1}, Δy_{t−1}] via Cramer's rule on the 3×3 normal
    * equations, whose entries are exact decimal sums. t = β₁/se(β₁)
    * with se² = σ̂²·(XᵀX)⁻¹₁₁, both from the same sums. */
  def adf(df: DataFrame, keyCol: String, orderCols: Seq[Column],
          valueCol: String, minObs: Int = 6): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols: _*)
    val y = dec2(col(valueCol))
    val withLags = df.select(col(keyCol), y.as("_y"),
        lag(y, 1).over(w).as("_l1"), lag(y, 2).over(w).as("_l2"))
    val m = col("_l2").isNotNull
    val g = col("_y") - col("_l1")   // target Δy_t (decimal(13,2))
    val yl = col("_l1")              // regressor y_{t−1}
    val dl = col("_l1") - col("_l2") // regressor Δy_{t−1}
    val agg = withLags.groupBy(keyCol).agg(
      sum(when(m, 1L).otherwise(0L)).as("_n"),
      decSum(yl, m).as("sy"), decSum(dl, m).as("sd"),
      prodSum(yl, yl, m).as("syy"), prodSum(yl, dl, m).as("syd"),
      prodSum(dl, dl, m).as("sdd"),
      decSum(g, m).as("ty"), prodSum(g, g, m).as("tyy"),
      prodSum(yl, g, m).as("tya"), prodSum(dl, g, m).as("tda"))
      .filter(col("_n") >= minObs)
    val n = col("_n").cast("double")
    // Cramer determinants of XtX with columns replaced by Xty; the
    // expression trees below are mirrored verbatim in the SQL oracle —
    // identical IEEE ops on identical doubles.
    val det = n * (col("syy") * col("sdd") - col("syd") * col("syd")) -
      col("sy") * (col("sy") * col("sdd") - col("sd") * col("syd")) +
      col("sd") * (col("sy") * col("syd") - col("sd") * col("syy"))
    val det0 = col("ty") * (col("syy") * col("sdd") - col("syd") * col("syd")) -
      col("sy") * (col("tya") * col("sdd") - col("tda") * col("syd")) +
      col("sd") * (col("tya") * col("syd") - col("tda") * col("syy"))
    val det1 = n * (col("tya") * col("sdd") - col("syd") * col("tda")) -
      col("ty") * (col("sy") * col("sdd") - col("sd") * col("syd")) +
      col("sd") * (col("sy") * col("tda") - col("sd") * col("tya"))
    val det2 = n * (col("syy") * col("tda") - col("syd") * col("tya")) -
      col("sy") * (col("sy") * col("tda") - col("sd") * col("tya")) +
      col("ty") * (col("sy") * col("syd") - col("sd") * col("syy"))
    val b0 = det0 / det
    val b1 = det1 / det
    val b2 = det2 / det
    val sigma2 = (col("tyy") - b0 * col("ty") - b1 * col("tya") -
      b2 * col("tda")) / (n - 3.0)
    val inv11 = (n * col("sdd") - col("sd") * col("sd")) / det
    agg.select(col(keyCol),
      round(b1 / sqrt(sigma2 * inv11), 9).as("adf_t"),
      col("_n").as("n_obs"))
  }

  /** SQL rendering of [[adf]] for the DuckDB oracle — same expression
    * tree. `orderBy` is the ORDER BY inside the window. */
  def adfSql(table: String, keyCol: String, orderBy: String,
             valueCol: String, minObs: Int = 6): String = {
    def ps(a: String, b: String) =
      s"CAST(SUM(CASE WHEN m THEN CAST($a * $b AS DECIMAL(28,4)) END) AS DOUBLE)"
    def ds(a: String) = s"CAST(SUM(CASE WHEN m THEN $a END) AS DOUBLE)"
    s"""WITH l AS (
       |  SELECT $keyCol,
       |    CAST($valueCol AS DECIMAL(12,2)) AS y,
       |    LAG(CAST($valueCol AS DECIMAL(12,2)), 1) OVER w AS l1,
       |    LAG(CAST($valueCol AS DECIMAL(12,2)), 2) OVER w AS l2
       |  FROM $table
       |  WINDOW w AS (PARTITION BY $keyCol ORDER BY $orderBy)),
       |r AS (
       |  SELECT $keyCol, l2 IS NOT NULL AS m,
       |    y - l1 AS g, l1 AS yl, l1 - l2 AS dl
       |  FROM l),
       |a AS (
       |  SELECT $keyCol,
       |    CAST(SUM(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_obs,
       |    ${ds("yl")} AS sy, ${ds("dl")} AS sd,
       |    ${ps("yl", "yl")} AS syy, ${ps("yl", "dl")} AS syd,
       |    ${ps("dl", "dl")} AS sdd,
       |    ${ds("g")} AS ty, ${ps("g", "g")} AS tyy,
       |    ${ps("yl", "g")} AS tya, ${ps("dl", "g")} AS tda
       |  FROM r GROUP BY $keyCol HAVING SUM(CASE WHEN m THEN 1 ELSE 0 END) >= $minObs),
       |s AS (
       |  SELECT $keyCol, n_obs, CAST(n_obs AS DOUBLE) AS n, sy, sd, syy, syd, sdd, ty, tyy, tya, tda,
       |    CAST(n_obs AS DOUBLE) * (syy * sdd - syd * syd) - sy * (sy * sdd - sd * syd) + sd * (sy * syd - sd * syy) AS det
       |  FROM a),
       |b AS (
       |  SELECT $keyCol, n_obs, n, ty, tya, tda, tyy, sdd, sd, det,
       |    (ty * (syy * sdd - syd * syd) - sy * (tya * sdd - tda * syd) + sd * (tya * syd - tda * syy)) / det AS b0,
       |    (n * (tya * sdd - syd * tda) - ty * (sy * sdd - sd * syd) + sd * (sy * tda - sd * tya)) / det AS b1,
       |    (n * (syy * tda - syd * tya) - sy * (sy * tda - sd * tya) + ty * (sy * syd - sd * syy)) / det AS b2
       |  FROM s)
       |SELECT $keyCol,
       |  ROUND(b1 / SQRT(((tyy - b0 * ty - b1 * tya - b2 * tda) / (n - 3.0))
       |    * ((n * sdd - sd * sd) / det)), 9) AS adf_t,
       |  n_obs
       |FROM b""".stripMargin
  }

  /** wide exact product for KPSS carriers: decimal(19,2) × decimal(19,2)
    * → decimal(38,4), the widest square DuckDB can mirror (its decimal
    * multiply requires w1+w2 ≤ 38; 19-wide operands also force int128
    * arithmetic there instead of silently-overflowing int64). */
  private def prodSum19(a: Column, b: Column, m: Column): Column =
    sum(when(m, (a * b).cast("decimal(38,4)"))).cast("double")

  /** Newey–West/Bartlett truncation lag L = ⌊4·√√(n/100)⌋. */
  def bartlettLag(n: Long): Int =
    math.floor(4.0 * math.sqrt(math.sqrt(n.toDouble / 100.0))).toInt

  /** KPSS level-stationarity η, closed form. Works on the n-scaled
    * demeaned series E_t = n·y_t − Σy (exact decimal — no division
    * before aggregation): partial sums P_t = Σ_{u≤t}E_u via one ordered
    * cumsum window; η = (ΣP²/n²) / (n²·lrv) with the Newey–West
    * long-run variance lrv = (ΣE² + 2Σ_{l≤L}w_l·ΣE_tE_{t−l})/n³,
    * Bartlett weights w_l = 1 − l/(L+1), L = ⌊4·√√(n/100)⌋ (√√ not
    * pow(·,0.25): sqrt is IEEE-exact, pow is libm and engine-varying).
    * Lag sums are aggregated unconditionally for l = 1..maxLag and
    * weighted post-agg once n (hence L) is known.
    *
    * `maxLag` < 0 (the default) sizes the lag window automatically from
    * one driver-side max-group-count aggregate, so L never exceeds it.
    * An explicit `maxLag` smaller than a group's L raises at runtime
    * (`raise_error`) rather than silently dropping γ terms.
    *
    * Exactness bounds (decimal(19,2) carriers, squares in decimal(38,4)):
    * |E| ≤ n·range(y) must stay < 10^17 and |P| ≤ n²·range(y) < 10^17
    * (worst case; demeaned partial sums are typically far smaller).
    * Beyond that Spark raises a decimal-overflow error (ANSI) — never a
    * silent NULL. For larger series, rescale y first. */
  def kpss(df: DataFrame, keyCol: String, orderCols: Seq[Column],
           valueCol: String, maxLag: Int = -1, minObs: Int = 10): DataFrame = {
    val effLag =
      if (maxLag >= 0) maxLag
      else {
        val maxN = Option(df.groupBy(keyCol).agg(count(lit(1)).as("_c"))
          .agg(max("_c")).head().get(0)).fold(0L)(_.asInstanceOf[Long])
        math.max(1, bartlettLag(maxN))
      }
    val wAll = Window.partitionBy(keyCol)
    val wOrd = Window.partitionBy(keyCol).orderBy(orderCols: _*)
    val y = dec2(col(valueCol))
    val e = (count(lit(1)).over(wAll) * y - sum(y).over(wAll))
      .cast("decimal(19,2)")
    val base = df.withColumn("_e", e)
    val cum = base.withColumn("_p",
      sum(col("_e")).over(wOrd.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)).cast("decimal(19,2)"))
    val withLags = (1 to effLag).foldLeft(cum) { (d, l) =>
      d.withColumn(s"_el$l", lag(col("_e"), l).over(wOrd))
    }
    val t = lit(true)
    val gammaAggs = (1 to effLag).map { l =>
      prodSum19(col("_e"), col(s"_el$l"), col(s"_el$l").isNotNull).as(s"g$l")
    }
    val agg = withLags.groupBy(keyCol).agg(
      count(lit(1)).as("_n"),
      (prodSum19(col("_p"), col("_p"), t).as("sp2") +:
        prodSum19(col("_e"), col("_e"), t).as("g0") +: gammaAggs): _*)
      .filter(col("_n") >= minObs)
    val n = col("_n").cast("double")
    val bigL = floor(lit(4.0) * sqrt(sqrt(n / 100.0)))
    // maxLag = 0 is a legal Newey-West truncation (lrv = g0/n^3):
    // an empty weight list must contribute zero, not empty.reduce
    val wsum =
      if (effLag == 0) lit(0.0)
      else (1 to effLag).map { l =>
        when(bigL >= l,
          (lit(1.0) - lit(l.toDouble) / (bigL + 1.0)) * col(s"g$l"))
          .otherwise(lit(0.0))
      }.reduce(_ + _)
    val lrv = (col("g0") + lit(2.0) * wsum) / (n * n * n)
    val ssq = col("sp2") / (n * n)
    val eta = when(bigL > lit(effLag.toDouble),
      raise_error(concat(lit("kpss: Bartlett lag L="),
        bigL.cast("string"),
        lit(s" exceeds maxLag=$effLag; pass a larger maxLag or -1 (auto)"))))
      .otherwise(round(ssq / (n * n * lrv), 9))
    agg.select(col(keyCol),
      eta.as("kpss_eta"),
      col("_n").as("n_obs"))
  }

  /** PACF at lags 1..3 in closed form: the Durbin–Levinson recursion
    * unrolled over the exact-moment ACF values (ρ rounded 9 dp — the
    * same masked-Pearson kernel as [[Temporal.acf]]), entirely as
    * column expressions — distributed, no driver collect
    * ([[Temporal.pacf]] is the any-maxLag driver-side variant).
    * Output long format: (key, lag, pacf). */
  def pacf3(df: DataFrame, keyCol: String, orderCols: Seq[Column],
            valueCol: String): DataFrame = {
    val a = Temporal.acf(df, valueCol, Seq(1, 2, 3), Seq(keyCol), orderCols)
    val r1 = col("acf1"); val r2 = col("acf2"); val r3 = col("acf3")
    val p22 = (r2 - r1 * r1) / (lit(1.0) - r1 * r1)
    val wide = a.select(col(keyCol), r1.as("p11"), p22.as("p22"),
      (r1 - p22 * r1).as("p21"), r1.as("r1"), r2.as("r2"), r3.as("r3"))
    val p33 = (col("r3") - col("p21") * col("r2") - col("p22") * col("r1")) /
      (lit(1.0) - col("p21") * col("r1") - col("p22") * col("r2"))
    wide.select(col(keyCol), col("p11"), col("p22"), p33.as("p33"))
      .selectExpr(keyCol,
        "stack(3, 1, p11, 2, p22, 3, p33) as (lag, pacf)")
  }

  /** SQL rendering of [[pacf3]] for the DuckDB oracle. */
  def pacf3Sql(table: String, keyCol: String, orderBy: String,
               valueCol: String): String = {
    def sums(k: Int) =
      s"""CAST(SUM(CASE WHEN lag$k IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) AS n$k,
         |    CAST(SUM(CASE WHEN lag$k IS NOT NULL THEN CAST($valueCol AS DECIMAL(12,3)) END) AS DOUBLE) AS sx$k,
         |    CAST(SUM(CASE WHEN lag$k IS NOT NULL THEN CAST(lag$k AS DECIMAL(12,3)) END) AS DOUBLE) AS sy$k,
         |    CAST(SUM(CASE WHEN lag$k IS NOT NULL THEN CAST(CAST($valueCol AS DECIMAL(12,3)) * CAST(lag$k AS DECIMAL(12,3)) AS DECIMAL(28,6)) END) AS DOUBLE) AS sxy$k,
         |    CAST(SUM(CASE WHEN lag$k IS NOT NULL THEN CAST(CAST($valueCol AS DECIMAL(12,3)) * CAST($valueCol AS DECIMAL(12,3)) AS DECIMAL(28,6)) END) AS DOUBLE) AS sxx$k,
         |    CAST(SUM(CASE WHEN lag$k IS NOT NULL THEN CAST(CAST(lag$k AS DECIMAL(12,3)) * CAST(lag$k AS DECIMAL(12,3)) AS DECIMAL(28,6)) END) AS DOUBLE) AS syy$k""".stripMargin
    def corrK(k: Int) =
      s"""ROUND((n$k * sxy$k - sx$k * sy$k) /
         |    (SQRT(n$k * sxx$k - sx$k * sx$k) * SQRT(n$k * syy$k - sy$k * sy$k)), 9)""".stripMargin
    s"""WITH l AS (
       |  SELECT $keyCol, $valueCol,
       |    LAG($valueCol, 1) OVER w AS lag1,
       |    LAG($valueCol, 2) OVER w AS lag2,
       |    LAG($valueCol, 3) OVER w AS lag3
       |  FROM $table
       |  WINDOW w AS (PARTITION BY $keyCol ORDER BY $orderBy)),
       |m AS (
       |  SELECT $keyCol,
       |    ${sums(1)},
       |    ${sums(2)},
       |    ${sums(3)}
       |  FROM l GROUP BY $keyCol),
       |rho AS (
       |  SELECT $keyCol, ${corrK(1)} AS r1, ${corrK(2)} AS r2, ${corrK(3)} AS r3
       |  FROM m),
       |w1 AS (
       |  SELECT $keyCol, r1, r2, r3,
       |    r1 AS p11,
       |    (r2 - r1 * r1) / (1.0 - r1 * r1) AS p22,
       |    r1 - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r1 AS p21
       |  FROM rho),
       |w2 AS (
       |  SELECT $keyCol, p11, p22,
       |    (r3 - p21 * r2 - p22 * r1) / (1.0 - p21 * r1 - p22 * r2) AS p33
       |  FROM w1)
       |SELECT $keyCol, CAST(1 AS INT) AS lag, p11 AS pacf FROM w2
       |UNION ALL SELECT $keyCol, CAST(2 AS INT), p22 FROM w2
       |UNION ALL SELECT $keyCol, CAST(3 AS INT), p33 FROM w2""".stripMargin
  }

  /** SQL rendering of [[kpss]] for the DuckDB oracle. Static SQL needs a
    * fixed lag count; results equal the (auto-sized) [[kpss]] as long as
    * `maxLag` here ≥ every group's Bartlett L — extra γ sums carry zero
    * weight via the `bigl >= l` conditionals. Carriers mirror the Scala
    * side: DECIMAL(19,2) values, DECIMAL(38,4) squares (19+19 ≤ 38 is
    * DuckDB's decimal-multiply width limit, and forces int128). */
  def kpssSql(table: String, keyCol: String, orderBy: String,
              valueCol: String, maxLag: Int = 8, minObs: Int = 10): String = {
    val lagCols = (1 to maxLag).map(l =>
      s"LAG(e, $l) OVER wo AS el$l").mkString(",\n       |    ")
    val gammaSums = (1 to maxLag).map(l =>
      s"CAST(SUM(CASE WHEN el$l IS NOT NULL THEN CAST(e * el$l AS DECIMAL(38,4)) END) AS DOUBLE) AS g$l")
      .mkString(",\n       |    ")
    val wterms = (1 to maxLag).map(l =>
      s"CASE WHEN bigl >= $l THEN (1.0 - $l.0 / (bigl + 1.0)) * g$l ELSE 0.0 END")
      .mkString(" + ")
    s"""WITH d AS (
       |  SELECT $keyCol, $orderBy,
       |    CAST(COUNT(*) OVER wa * CAST($valueCol AS DECIMAL(12,2))
       |         - SUM(CAST($valueCol AS DECIMAL(12,2))) OVER wa AS DECIMAL(19,2)) AS e
       |  FROM $table
       |  WINDOW wa AS (PARTITION BY $keyCol)),
       |c AS (
       |  SELECT $keyCol, e,
       |    CAST(SUM(e) OVER wo AS DECIMAL(19,2)) AS p,
       |    $lagCols
       |  FROM d
       |  WINDOW wo AS (PARTITION BY $keyCol ORDER BY $orderBy
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |a AS (
       |  SELECT $keyCol, COUNT(*) AS n_obs,
       |    CAST(SUM(CAST(p * p AS DECIMAL(38,4))) AS DOUBLE) AS sp2,
       |    CAST(SUM(CAST(e * e AS DECIMAL(38,4))) AS DOUBLE) AS g0,
       |    $gammaSums
       |  FROM c GROUP BY $keyCol HAVING COUNT(*) >= $minObs),
       |f AS (
       |  SELECT $keyCol, n_obs, CAST(n_obs AS DOUBLE) AS n,
       |    FLOOR(4.0 * SQRT(SQRT(CAST(n_obs AS DOUBLE) / 100.0))) AS bigl,
       |    sp2, g0, ${(1 to maxLag).map(l => s"g$l").mkString(", ")}
       |  FROM a)
       |SELECT $keyCol,
       |  ROUND((sp2 / (n * n)) / (n * n * ((g0 + 2.0 * ($wterms)) / (n * n * n))), 9) AS kpss_eta,
       |  n_obs
       |FROM f""".stripMargin
  }
}
