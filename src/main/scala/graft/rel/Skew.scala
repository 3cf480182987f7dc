package graft.rel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling primitives (north-star scale list: "salting for skew,
  * AQE for runtime re-plan").
  *
  * AQE's skew-join split covers joins; aggregations over a hot key
  * still funnel one key's rows into one task. Salting decomposes the
  * aggregate into (key, salt) partials — parallelism × `salts` on the
  * hot key — then merges partials per key. Only algebraic aggregates
  * decompose this way; the helpers below cover the exact-decimal sums
  * and counts this engine standardizes on.
  */
object Skew {

  /** Exact decimal sums + count per key, computed with a salted
    * two-phase aggregation. Results are identical to the direct
    * groupBy (decimal addition is associative-exact). */
  def saltedDecimalSum(df: DataFrame, keys: Seq[String], valueCol: String,
                       salts: Int = 16, sumName: String = "sum",
                       countName: String = "n"): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    val partial = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(col(valueCol).cast("decimal(28,2)")).as("_ps"),
           count(lit(1)).as("_pn"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("_ps")).cast("double").as(sumName),
           sum(col("_pn")).as(countName))
  }

  /** Top `topN` hot keys by row count with their frequency share — the
    * diagnostic that decides whether to salt (`handle skew` planning). */
  def keySkewReport(df: DataFrame, keys: Seq[String], topN: Int = 10): DataFrame = {
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n")).head().getLong(0).toDouble
    counts.withColumn("share", col("n").cast("double") / total)
      .orderBy(col("n").desc)
      .limit(topN)
  }
}
