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

  /** Short-eval containment — the blind spot of the k-gram report: an
    * eval string with fewer than k tokens carries zero k-grams, so
    * [[contaminationReport]] can never flag it (a 4-token eval answer
    * would leak straight through an 8-gram decontamination pass).
    *
    * This variant covers the gap with EXACT token-level containment:
    * eval rows are normalized to their whitespace-token join; for each
    * distinct short length ℓ (0 < ℓ < k) present in the eval set, the
    * train side explodes into ℓ-grams (the same keyed
    * [[Dedup.shinglesExploded]] plan) and equi-joins the eval strings
    * of that length. The ℓ set is bounded by k−1 and collected from
    * the tiny eval side only, so the whole pass is at most k−1 keyed
    * explode+broadcast-join pipelines — never a pair scan, and the big
    * train side is never collected.
    *
    * Returns per-train-doc `short_hits` (distinct short eval strings
    * contained) and `contaminated_short`. Compose with
    * [[contaminationReport]] for full coverage. */
  def shortEvalContainment(train: DataFrame, eval: DataFrame,
                           idCol: String, textCol: String,
                           k: Int = 8): DataFrame = {
    val hits = shortEvalHits(train, eval, idCol, textCol, k)
    val base = train.select(col(idCol).as("_id")).distinct()
    hits.fold(base.select(col("_id").as(idCol),
        lit(0L).as("short_hits"), lit(false).as("contaminated_short"))) { h =>
      base.join(h, Seq("_id"), "left")
        .select(col("_id").as(idCol),
          coalesce(col("short_hits"), lit(0L)).as("short_hits"))
        .withColumn("contaminated_short", col("short_hits") > 0L)
    }
  }

  /** The hit kernel of [[shortEvalContainment]]: per-train-doc distinct
    * short-eval containment counts (`_id`, `short_hits`), HIT ROWS ONLY
    * — no zero-hit scaffold, so a consumer that only needs the
    * contaminated ids ([[dropContaminated]]) skips the full-train
    * distinct+left-join the report shape requires. None when the eval
    * set has no sub-k rows. */
  private def shortEvalHits(train: DataFrame, eval: DataFrame,
                            idCol: String, textCol: String,
                            k: Int): Option[DataFrame] = {
    require(k >= 2, s"k must be >= 2, got $k")
    val evNorm = eval.select(
        concat_ws(" ", TextFns.tokens(col(textCol))).as("_sh"),
        size(TextFns.tokens(col(textCol))).as("_len"))
      .filter(col("_len") > 0 && col("_len") < k)
      .distinct()
    // distinct short lengths: bounded by k-1 values, eval side is tiny
    val lens = evNorm.select("_len").distinct().collect()
      .map(_.getInt(0)).sorted
    lens.map { l =>
        Dedup.shinglesExploded(train, idCol, textCol, l)
          .join(evNorm.filter(col("_len") === l).select("_sh"), "_sh")
      }.reduceOption(_.unionByName(_))
      .map(_.groupBy("_id").agg(count(lit(1)).as("short_hits")))
  }

  /** Drop contaminated training docs (anti-join on the report).
    *
    * `includeShort` (default true) also drops docs containing any
    * sub-k-token eval string via [[shortEvalContainment]] — without it
    * the one-call API inherits the k-gram blind spot (a 3-token eval
    * answer would survive the drop). Pass false to reproduce the pure
    * k-gram semantics. */
  def dropContaminated(train: DataFrame, eval: DataFrame,
                       idCol: String, textCol: String,
                       k: Int = 8,
                       threshold: Double = 0.8,
                       includeShort: Boolean = true): DataFrame = {
    val bad = contaminationReport(train, eval, idCol, textCol, k, threshold)
      .filter(col("contaminated")).select(idCol)
    // hit ids directly — the report's zero-hit scaffold (full-train
    // distinct + left join) would be built only to be filtered back out
    val badAll = if (includeShort)
      shortEvalHits(train, eval, idCol, textCol, k)
        .map(h => bad.unionByName(h.select(col("_id").as(idCol))))
        .getOrElse(bad)
    else bad
    train.join(badAll, Seq(idCol), "left_anti")
  }
}
