package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Tables => T}
import graft.stats.Inferential

/** Driver-contract entries for inferential tests (SURVEY §2.4
  * inferential row). Statistics only — p-values are driver-side
  * ([[graft.stats.PValues]], covered by InferSpec); DuckDB has no
  * distribution CDFs to oracle them against.
  */
object InferEntries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Welch t-test (inferential.py:388).
    "t_test" -> ((s, dir) => {
      Inferential.tTestWelch(T.customer(s, dir), "c_acctbal",
        "c_mktsegment", "AUTOMOBILE", "BUILDING")
    }),

    // paired t (inferential.py:526) on an exact 2-dp difference.
    "paired_t" -> ((s, dir) => {
      Inferential.pairedTTest(T.lineitem(s, dir),
        col("l_quantity") - col("l_tax") * 100.0)
    }),

    // chi-square independence (inferential.py:1496).
    "chi2" -> ((s, dir) => {
      Inferential.chi2Test(T.orders(s, dir), "o_orderpriority", "o_orderstatus")
    }),

    // one-way ANOVA (inferential.py:1605).
    "anova" -> ((s, dir) => {
      Inferential.anovaF(T.customer(s, dir), "c_acctbal", "c_mktsegment")
    }),

    // two-sample KS (inferential.py:1173) — exact rational D.
    "ks_test" -> ((s, dir) => {
      Inferential.ksTest(T.lineitem(s, dir), "l_quantity",
        "l_returnflag", "A", "R")
    }),

    // Cronbach α (inferential.py:1391).
    "cronbach" -> ((s, dir) => {
      Inferential.cronbachAlpha(T.lineitem(s, dir),
        Seq("l_quantity", "l_discount", "l_tax"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "t_test" ->
      """WITH m AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS DOUBLE) AS na,
        |    CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS DOUBLE) AS nb,
        |    CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS sa,
        |    CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS sb,
        |    CAST(SUM(CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN CAST(CAST(c_acctbal AS DECIMAL(15,2)) * CAST(c_acctbal AS DECIMAL(15,2)) AS DECIMAL(24,4)) END) AS DOUBLE) AS qa,
        |    CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN CAST(CAST(c_acctbal AS DECIMAL(15,2)) * CAST(c_acctbal AS DECIMAL(15,2)) AS DECIMAL(24,4)) END) AS DOUBLE) AS qb
        |  FROM customer WHERE c_mktsegment IN ('AUTOMOBILE','BUILDING'))
        |SELECT
        |  ROUND((sa/na - sb/nb) / SQRT((qa - sa*sa/na)/(na-1)/na + (qb - sb*sb/nb)/(nb-1)/nb), 9) AS t_stat,
        |  ROUND(((qa - sa*sa/na)/(na-1)/na + (qb - sb*sb/nb)/(nb-1)/nb)
        |      * ((qa - sa*sa/na)/(na-1)/na + (qb - sb*sb/nb)/(nb-1)/nb)
        |    / (((qa - sa*sa/na)/(na-1)/na) * ((qa - sa*sa/na)/(na-1)/na) / (na-1)
        |     + ((qb - sb*sb/nb)/(nb-1)/nb) * ((qb - sb*sb/nb)/(nb-1)/nb) / (nb-1)), 6) AS welch_df,
        |  CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b
        |FROM m""".stripMargin,

    "paired_t" ->
      """WITH m AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity - l_tax * 100.0 AS DECIMAL(18,2))) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(CAST(l_quantity - l_tax * 100.0 AS DECIMAL(15,2)) * CAST(l_quantity - l_tax * 100.0 AS DECIMAL(15,2)) AS DECIMAL(24,4))) AS DOUBLE) AS q
        |  FROM lineitem)
        |SELECT ROUND((s/n) / SQRT(((q - s*s/n)/(n-1))/n), 9) AS t_stat,
        |  CAST(n - 1 AS BIGINT) AS dof
        |FROM m""".stripMargin,

    "chi2" ->
      """WITH cells AS (
        |  SELECT o_orderpriority a, o_orderstatus b, CAST(COUNT(*) AS DOUBLE) o
        |  FROM orders GROUP BY 1, 2),
        |m AS (
        |  SELECT o, SUM(o) OVER (PARTITION BY a) ra, SUM(o) OVER (PARTITION BY b) cb,
        |    SUM(o) OVER () n, a, b
        |  FROM cells)
        |SELECT ROUND(SUM(POWER(o - ra*cb/n, 2) / (ra*cb/n)), 6) AS chi2,
        |  CAST((COUNT(DISTINCT a) - 1) * (COUNT(DISTINCT b) - 1) AS BIGINT) AS dof
        |FROM m""".stripMargin,

    "anova" ->
      """WITH g AS (
        |  SELECT c_mktsegment,
        |    CAST(COUNT(*) AS DOUBLE) ni,
        |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) si,
        |    CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(15,2)) * CAST(c_acctbal AS DECIMAL(15,2)) AS DECIMAL(24,4))) AS DOUBLE) qi
        |  FROM customer GROUP BY 1),
        |t AS (
        |  SELECT SUM(ni) n, CAST(COUNT(*) AS DOUBLE) k, SUM(si) s, SUM(qi) q,
        |    SUM(si * si / ni) sb
        |  FROM g)
        |SELECT
        |  ROUND(((sb - s*s/n) / (k-1)) / ((q - sb) / (n-k)), 9) AS f_stat,
        |  CAST(k - 1 AS BIGINT) AS df_between,
        |  CAST(n - k AS BIGINT) AS df_within
        |FROM t""".stripMargin,

    "ks_test" ->
      """WITH pv AS (
        |  SELECT l_quantity v,
        |    SUM(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) ca,
        |    SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) cb
        |  FROM lineitem WHERE l_returnflag IN ('A','R') GROUP BY 1),
        |c AS (
        |  SELECT SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) fa,
        |    SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) fb,
        |    SUM(ca) OVER () na, SUM(cb) OVER () nb
        |  FROM pv)
        |SELECT MAX(ABS(CAST(fa AS DOUBLE)/na - CAST(fb AS DOUBLE)/nb)) AS ks_d
        |FROM c""".stripMargin,

    "cronbach" ->
      """WITH m AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) s0,
        |    CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(15,2)) * CAST(l_quantity AS DECIMAL(15,2)) AS DECIMAL(24,4))) AS DOUBLE) q0,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) s1,
        |    CAST(SUM(CAST(CAST(l_discount AS DECIMAL(15,2)) * CAST(l_discount AS DECIMAL(15,2)) AS DECIMAL(24,4))) AS DOUBLE) q1,
        |    CAST(SUM(CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) s2,
        |    CAST(SUM(CAST(CAST(l_tax AS DECIMAL(15,2)) * CAST(l_tax AS DECIMAL(15,2)) AS DECIMAL(24,4))) AS DOUBLE) q2,
        |    CAST(SUM(CAST(l_quantity + l_discount + l_tax AS DECIMAL(18,2))) AS DOUBLE) st,
        |    CAST(SUM(CAST(CAST(l_quantity + l_discount + l_tax AS DECIMAL(15,2)) * CAST(l_quantity + l_discount + l_tax AS DECIMAL(15,2)) AS DECIMAL(24,4))) AS DOUBLE) qt
        |  FROM lineitem)
        |SELECT ROUND(1.5 * (1.0 -
        |    (((q0 - s0*s0/n)/(n-1) + (q1 - s1*s1/n)/(n-1)) + (q2 - s2*s2/n)/(n-1))
        |    / ((qt - st*st/n)/(n-1))), 9) AS alpha
        |FROM m""".stripMargin
  )
}
