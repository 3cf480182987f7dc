package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise correlation matrix + correlation-based pruning
  * (SURVEY §2.4).
  *
  * Reference: `analyze_data_corr` (gofast/dataops/quality.py:1863),
  * `check_correlated_features` (:1729), `drop_correlated_features`
  * (:4054), `correlation_ops` (:3845).
  *
  * ALL pairwise exact moments come from ONE aggregate pass (p·(p+1)/2
  * sums, map-side combined); the p×p matrix lives on the driver (p is
  * column count, tiny) — the classic sufficient-statistics shape that
  * is indifferent to row count.
  */
object Correlation {

  /** Long-form exact Pearson correlation matrix over `cols`
    * (col_a < col_b). */
  def matrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) =>
      Descriptive.corrExact(col(a), col(b)).as(s"${a}__$b")
    }
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val spark = df.sparkSession
    import spark.implicits._
    pairs.zipWithIndex.map { case ((a, b), i) => (a, b, r.getDouble(i)) }
      .toDF("col_a", "col_b", "corr")
  }

  /** Columns to drop so no surviving pair has |r| ≥ threshold: greedy
    * in column order, the reference's `drop_correlated_features` rule. */
  def correlatedToDrop(df: DataFrame, cols: Seq[String],
                       threshold: Double = 0.9): Seq[String] = {
    val m = matrix(df, cols).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
    val dropped = scala.collection.mutable.Set[String]()
    for {
      i <- cols.indices; j <- (i + 1) until cols.size
      if !dropped(cols(i)) && !dropped(cols(j))
      r <- m.get((cols(i), cols(j)))
      if math.abs(r) >= threshold
    } dropped += cols(j)
    dropped.toSeq.sorted
  }

  /** Drop the correlated columns from the frame. */
  def dropCorrelated(df: DataFrame, cols: Seq[String],
                     threshold: Double = 0.9): DataFrame =
    df.drop(correlatedToDrop(df, cols, threshold): _*)
}
