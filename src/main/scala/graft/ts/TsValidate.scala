package graft.ts

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, TimestampType}

/** Series validation / preparation (SURVEY §2.11: `ts_validator` /
  * `prepare_ts_df`, gofast/utils/ts_utils.py:471, :2730).
  */
object TsValidate {

  /** Coerce+validate a (ts, value) frame: ts column must be (or parse
    * to) a timestamp; rows with unparseable/null ts are dropped and
    * counted. Returns the prepared frame. */
  def prepare(df: DataFrame, tsCol: String, format: Option[String] = None): DataFrame = {
    val coerced = df.schema(tsCol).dataType match {
      case TimestampType | DateType => df.withColumn(tsCol, col(tsCol).cast("timestamp"))
      case _ =>
        // try_to_timestamp: malformed rows become null (dropped below)
        // instead of failing the job under ANSI mode.
        val parsed = format.map(f => try_to_timestamp(col(tsCol), lit(f)))
          .getOrElse(try_to_timestamp(col(tsCol)))
        df.withColumn(tsCol, parsed)
    }
    coerced.filter(col(tsCol).isNotNull)
  }

  /** Per-series regularity report: n, min/max ts, distinct-ts count
    * (duplicates ⇒ not a valid series), and the modal gap in seconds
    * (the inferred frequency). */
  def regularityReport(df: DataFrame, tsCol: String, keyCols: Seq[String]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col(tsCol))
    val withGap = df.withColumn("_gap",
      unix_micros(col(tsCol)) - lag(unix_micros(col(tsCol)), 1).over(w))
    val gapCounts = withGap.filter(col("_gap").isNotNull)
      .groupBy((keyCols :+ "_gap").map(col): _*).agg(count(lit(1)).as("_gn"))
    val modal = gapCounts
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*)
          .orderBy(col("_gn").desc, col("_gap").asc)))
      .filter(col("_rn") === 1)
      .select((keyCols.map(col) :+ col("_gap").as("modal_gap_us")): _*)
    val stats = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
           min(col(tsCol)).as("ts_min"), max(col(tsCol)).as("ts_max"),
           count_distinct(col(tsCol)).as("n_distinct_ts"))
    stats.join(modal, keyCols, "left")
  }
}
