package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval contamination detection over k-gram overlap.
  *
  * The benchmark-decontamination stage of a training-data pipeline
  * (the GPT-3/PaLM recipe): a training document is contaminated when
  * a high fraction of its k-grams also appear anywhere in the
  * evaluation corpus. Both sides reduce to distinct (id, k-gram)
  * rows via [[Dedup.shinglesExploded]] (codegen'd lead() windows, one
  * shuffle each); the overlap is one equi-join on the k-gram string.
  *
  * Scale shape: the eval side collapses to its DISTINCT k-gram set —
  * benchmarks are tiny next to a 100 TB corpus, so AQE turns the join
  * into a broadcast automatically when it fits; otherwise it shuffles
  * on the k-gram, which is the right key (uniform, high-cardinality).
  * No thresholds are applied on the join side, so the plan is a
  * bounded two-aggregate pipeline, not a pair enumeration.
  */
object Decontaminate {

  /** Per-train-doc overlap report: total k-grams, overlapping
    * k-grams, overlap fraction, contaminated flag. Train docs with
    * fewer than k tokens carry zero k-grams and are reported with
    * ngrams = 0, overlap_frac = 0 (never contaminated). */
  def contaminationReport(train: DataFrame, eval: DataFrame,
                          idCol: String, textCol: String,
                          k: Int = 8,
                          threshold: Double = 0.8): DataFrame = {
    val tr = Dedup.shinglesExploded(train, idCol, textCol, k)
    val ev = Dedup.shinglesExploded(eval, idCol, textCol, k)
      .select("_sh").distinct()
    val sizes = tr.groupBy("_id").agg(count(lit(1)).as("_n"))
    val hits = tr.join(ev, "_sh").groupBy("_id")
      .agg(count(lit(1)).as("_hits"))
    // left join: keep docs with zero overlap; re-attach short docs.
    // The id keeps its NATIVE type (string doc ids must not null out
    // through a numeric cast — the connectedComponents lesson).
    val base = train.select(col(idCol).as("_id")).distinct()
    base
      .join(sizes, Seq("_id"), "left")
      .join(hits, Seq("_id"), "left")
      .select(col("_id").as(idCol),
        coalesce(col("_n"), lit(0L)).as("ngrams"),
        coalesce(col("_hits"), lit(0L)).as("overlap"),
        round(coalesce(col("_hits"), lit(0L)).cast("double") /
          greatest(coalesce(col("_n"), lit(0L)), lit(1L)), 9)
          .as("overlap_frac"))
      .withColumn("contaminated",
        col("overlap_frac") >= threshold && col("ngrams") > 0)
  }

  /** Drop contaminated training docs (anti-join on the report). */
  def dropContaminated(train: DataFrame, eval: DataFrame,
                       idCol: String, textCol: String,
                       k: Int = 8,
                       threshold: Double = 0.8): DataFrame = {
    val bad = contaminationReport(train, eval, idCol, textCol, k, threshold)
      .filter(col("contaminated")).select(idCol)
    train.join(bad, Seq(idCol), "left_anti")
  }
}
