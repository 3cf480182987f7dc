package graft.clean

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate detection and removal.
  *
  * Reference: `has_duplicates` (gofast/utils/data_utils.py:2425),
  * `handle_duplicates` (gofast/dataops/quality.py:4677), `sanitize`
  * (gofast/dataops/transformation.py:372).
  */
object Duplicates {

  /** Exact dedup on `cols` (all columns when empty). One shuffle on the
    * key columns; Catalyst rewrites to a first-row-per-key aggregate. */
  def drop(df: DataFrame, cols: Seq[String] = Nil): DataFrame =
    if (cols.isEmpty) df.dropDuplicates() else df.dropDuplicates(cols)

  /** Dedup keeping the row with the greatest `orderCol` per key
    * (pandas `drop_duplicates(keep='last')` on a sorted frame). */
  def dropKeepLatest(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol).desc)
    df.withColumn("_rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Keys appearing more than once, with their multiplicity —
    * `handle_duplicates(return_counts)`. */
  def report(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("n_dup"))
      .filter(col("n_dup") > 1)

  /** Whether any duplicate exists on `cols` — `has_duplicates`.
    * Short-circuits via limit(1) rather than counting everything. */
  def exists(df: DataFrame, cols: Seq[String]): Boolean =
    !report(df, cols).isEmpty
}
