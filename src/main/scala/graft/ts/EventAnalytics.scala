package graft.ts

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-analytics queries over event streams — the funnel and
  * cohort-retention analyses every events table ultimately feeds
  * (reference adjacency: the ts/sessionize family; these are the two
  * standard aggregations downstream of it).
  *
  * Both are keyed plans end-to-end: per-user aggregations, user-keyed
  * joins, then a tiny groupBy — nothing global-sorted, nothing
  * driver-sized.
  */
object EventAnalytics {

  /** Ordered conversion funnel: for steps s₁..s_k, a user reaches
    * step i if an event of type s_i occurs AT OR AFTER their earliest
    * qualifying time for step i−1 (the classic "unbounded window"
    * funnel). Output: (step, step_name, n_users), step 1-based —
    * counts are monotone non-increasing by construction.
    *
    * Plan: one per-user min-timestamp aggregation per step, chained
    * through user-keyed joins; the final counts are k one-row
    * aggregates unioned. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    val frames = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val ofType = events.filter(col(typeCol) === step)
          .select(col(userCol).as("_u"), col(tsCol).as("_ts"))
        val qualified = prev match {
          case None => ofType
          case Some(p) => ofType.join(p, Seq("_u"))
            .filter(col("_ts") >= col("_prev"))
            .select(col("_u"), col("_ts"))
        }
        Some(qualified.groupBy("_u").agg(min("_ts").as("_prev")))
    }.flatten
    frames.zip(steps).zipWithIndex.map { case ((f, name), i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(name).as("step_name"),
          col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** Cohort retention: users grouped by their first-seen period
    * (week/day truncation), counted as retained in every later period
    * they were active. Output: (cohort, period_offset, n_users) with
    * offset in whole periods since the cohort period.
    *
    * Plan: one per-user min aggregation (cohort assignment), one
    * distinct over (user, period) — activity, not event volume — one
    * user-keyed join, one small groupBy. */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      period: String = "week"): DataFrame = {
    require(Set("week", "day", "month").contains(period),
      s"period must be week|day|month, got $period")
    val perLen = period match {
      case "week" => 7L
      case "day" => 1L
      case "month" => 0L // month offsets use months_between
    }
    val trunc = date_trunc(period, col(tsCol)).cast("date")
    val cohorts = events.groupBy(col(userCol).as("_u"))
      .agg(min(trunc).as("cohort"))
    val active = events.select(col(userCol).as("_u"), trunc.as("_p"))
      .distinct()
    val joined = active.join(cohorts, Seq("_u"))
    val offset =
      if (period == "month")
        months_between(col("_p"), col("cohort")).cast("long")
      else (datediff(col("_p"), col("cohort")) / perLen).cast("long")
    joined.select(col("cohort"), offset.as("period_offset"))
      .groupBy("cohort", "period_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Time-to-convert distribution between two funnel steps: per user,
    * the seconds from the earliest `fromStep` to the earliest
    * at-or-after `toStep` (the funnel's own qualification rule), then
    * exact quartiles + mean over converting users. The quantiles run
    * over #converting-users rows (bounded); the mean is an exact
    * integer-seconds average. Output: one row (n_converted,
    * min_s, p25_s, median_s, p75_s, max_s, mean_s). */
  def conversionTime(events: DataFrame, userCol: String, typeCol: String,
                     tsCol: String, fromStep: String,
                     toStep: String): DataFrame = {
    val first = events.filter(col(typeCol) === fromStep)
      .groupBy(col(userCol).as("_u")).agg(min(col(tsCol)).as("_t0"))
    val conv = events.filter(col(typeCol) === toStep)
      .select(col(userCol).as("_u"), col(tsCol).as("_t1"))
      .join(first, Seq("_u"))
      .filter(col("_t1") >= col("_t0"))
      .groupBy("_u")
      .agg((min(col("_t1")).cast("long") - min(col("_t0")).cast("long"))
        .as("_dt"))
    // exact quantiles over integer seconds: percentile() is exact and
    // deterministic on a bounded per-user domain
    conv.agg(count(lit(1)).as("n_converted"),
      min("_dt").as("min_s"),
      round(expr("percentile(_dt, 0.25)"), 6).as("p25_s"),
      round(expr("percentile(_dt, 0.5)"), 6).as("median_s"),
      round(expr("percentile(_dt, 0.75)"), 6).as("p75_s"),
      max("_dt").as("max_s"),
      round(sum("_dt").cast("double") / count(lit(1)).cast("double"), 6)
        .as("mean_s"))
  }

  /** First-order transition matrix of event types per user: counts
    * and row-normalized probabilities of (from → to) over each user's
    * time-ordered event sequence (ties broken on `tieCols`). The
    * Markov-chain view of user behavior — feeds next-action models
    * and funnel design. Output: (from_type, to_type, n, p). */
  def eventTransitions(events: DataFrame, userCol: String,
                       typeCol: String, tsCol: String,
                       tieCols: Seq[String] = Nil): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy((tsCol +: tieCols).map(col): _*)
    val pairs = events
      .withColumn("_next", lead(col(typeCol), 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = pairs.groupBy("from_type").agg(sum("n").as("_tot"))
    pairs.join(fromTotals, Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / col("_tot").cast("double"), 6)
          .as("p"))
  }
}
