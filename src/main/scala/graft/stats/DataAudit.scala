package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-quality audit statistics — the checks an engineer runs on a
  * table BEFORE trusting it in a pipeline (reference adjacency: the
  * audit_data composite, §3.2).
  */
object DataAudit {

  /** Benford's-law first-digit audit (Benford 1938; the classic
    * fabricated-data screen for positive, scale-spanning quantities):
    * observed first-digit shares vs the law `log10(1 + 1/d)`, plus
    * each digit's chi-square contribution. One groupBy over nine
    * groups; values ≤ 0 are excluded (the law is defined on positive
    * magnitudes). The first digit comes from the DECIMAL(18,
    * `decimals`) string rendering — deterministic in any engine,
    * where a log10/pow extraction can flip at ulp boundaries.
    * DECIMAL(38, d) so magnitudes up to 10^(38−d) render instead of
    * throwing CAST_OVERFLOW under ANSI mode — the audit targets
    * exactly the scale-spanning inputs that breach (18, d). Values
    * below 0.5·10^−d round to 0 at the chosen precision and are
    * excluded from the digit counts (same as ≤ 0); pass a larger
    * `decimals` to audit sub-cent magnitudes.
    * Output: (digit, n, observed, expected, chi2_term), shares
    * round-6. */
  def benford(df: DataFrame, valueCol: String,
              decimals: Int = 2): DataFrame = {
    val v = col(valueCol).cast("double")
    val digits = df.filter(v > 0)
      .select(substring(regexp_replace(
        v.cast(org.apache.spark.sql.types.DecimalType(38, decimals))
          .cast("string"), "[^1-9]", ""), 1, 1).as("digit"))
      .filter(col("digit") =!= "")
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = digits.agg(sum("n").as("_t"))
    digits.crossJoin(broadcast(total))
      .select(col("digit").cast("int").as("digit"), col("n"),
        round(col("n").cast("double") / col("_t").cast("double"), 6)
          .as("observed"),
        round(log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
          log(lit(10.0)), 6).as("expected"))
      .withColumn("chi2_term",
        // explicit square: pow(x, 2) is not correctly rounded in
        // every libm, x*x is one IEEE multiply in all of them
        round((col("observed") - col("expected")) *
          (col("observed") - col("expected")) / col("expected"), 6))
  }

  /** Population Stability Index between a REFERENCE and a CURRENT
    * table's numeric column — the standard production drift monitor
    * for features/scores (PSI < 0.1 stable, 0.1–0.25 moderate, > 0.25
    * shifted; the credit-scoring convention). Bin edges are the exact
    * reference quantiles ([[graft.stats.Quantiles.exactPercentiles]] —
    * distributed two-phase, driver state = bins−1 scalars, the
    * fitted-scalar pattern), bin i = 1 + #edges strictly below the
    * value, shares floored at `floor` so empty bins contribute a
    * finite term instead of ±∞. Per-bin terms are
    * `(q − p)·ln(q/p)` round-6 from the UNROUNDED shares (the
    * corpus_js convention: one libm crossing, rounded once); the PSI
    * total is their sum. Output: (bin, ref_share, cur_share,
    * psi_term), shares round-6, one row per bin including empty ones.
    * The token-distribution sibling is
    * [[graft.text.CorpusStats]]'s JS divergence; PSI is the numeric
    * axis a model-input monitor wants. */
  def psi(ref: DataFrame, cur: DataFrame, valueCol: String,
          bins: Int = 10, floor: Double = 1e-6): DataFrame = {
    require(bins >= 2, s"need >= 2 bins, got $bins")
    require(floor > 0, s"floor must be > 0, got $floor")
    val edges = graft.stats.Quantiles.exactPercentiles(ref, valueCol,
      (1 until bins).map(_.toDouble / bins))
    psiOfCounts(binCounts(ref, valueCol, edges, "_cr"),
      binCounts(cur, valueCol, edges, "_cc"), bins, floor)
  }

  /** Fit the reference bin edges once — the fitted-scalar artifact a
    * STREAMING psi deploy broadcasts as literals ([[psiStreamCounts]]);
    * exact reference quantiles, bins−1 driver scalars. */
  def psiFitEdges(ref: DataFrame, valueCol: String,
                  bins: Int = 10): Seq[Double] = {
    require(bins >= 2, s"need >= 2 bins, got $bins")
    graft.stats.Quantiles.exactPercentiles(ref, valueCol,
      (1 until bins).map(_.toDouble / bins))
  }

  private def binOf(v: org.apache.spark.sql.Column,
                    edges: Seq[Double]): org.apache.spark.sql.Column =
    edges.foldLeft(lit(1))((acc, e) => acc + when(v > lit(e), 1).otherwise(0))

  /** Per-bin counts of `df` under fitted `edges` — works unchanged on
    * a STREAMING DataFrame (pure projection + groupBy: the engine
    * maintains exactly `bins` state rows in complete mode). */
  def binCounts(df: DataFrame, valueCol: String, edges: Seq[Double],
                out: String): DataFrame = {
    val v = col(valueCol).cast("double")
    df.filter(v.isNotNull).select(binOf(v, edges).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(out))
  }

  /** The PSI arithmetic over two per-bin count tables — shared by the
    * batch [[psi]] and the streaming deploy so both land on IDENTICAL
    * doubles (same expressions, same single libm crossing).
    * `refCounts` carries `_cr`, `curCounts` `_cc`. */
  def psiOfCounts(refCounts: DataFrame, curCounts: DataFrame,
                  bins: Int, floor: Double = 1e-6): DataFrame = {
    require(bins >= 2, s"need >= 2 bins, got $bins")
    require(floor > 0, s"floor must be > 0, got $floor")
    val spark = refCounts.sparkSession
    val domain = spark.range(1, bins + 1L)
      .select(col("id").cast("int").as("bin"))
    val joined = domain
      .join(refCounts, Seq("bin"), "left")
      .join(curCounts, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("_cr"), lit(0L)).as("_cr"),
        coalesce(col("_cc"), lit(0L)).as("_cc"))
    val tot = joined.agg(sum("_cr").as("_tr"), sum("_cc").as("_tc"))
    // 1-row fitted-scalar broadcast (the benford/pareto convention —
    // PlanAudit-adjudicated)
    val p = greatest(col("_cr").cast("double") / col("_tr").cast("double"),
      lit(floor))
    val q = greatest(col("_cc").cast("double") / col("_tc").cast("double"),
      lit(floor))
    joined.crossJoin(broadcast(tot))
      .select(col("bin"),
        round(p, 6).as("ref_share"),
        round(q, 6).as("cur_share"),
        round((q - p) * log(q / p), 6).as("psi_term"))
  }

  /** STREAMING drift monitor, fit/deploy split: reference edges fitted
    * once ([[psiFitEdges]] — the fitted-scalar pattern), then the
    * stream's per-bin counts maintained by the ENGINE as `bins` state
    * rows. Start the returned frame in Complete mode (e.g. a memory
    * sink): after every micro-batch the sink holds the accumulated
    * counts, and `psiOfCounts(refCounts, sink, bins)` is the live PSI
    * — identical to the batch [[psi]] over the data ingested so far.
    * State is O(bins), shuffle is the `bins`-key aggregate; the
    * corpus is never rescanned. */
  def psiStreamCounts(stream: DataFrame, valueCol: String,
                      edges: Seq[Double]): DataFrame =
    binCounts(stream, valueCol, edges, "_cc")

  /** Categorical PSI — [[psi]]'s twin for categorical columns
    * (reference adjacency: the same monitoring family,
    * gofast/dataops/quality.py:1863 correlation/drift reporting).
    * Bins are VALUE GROUPS instead of quantile intervals: the domain
    * is every category observed in EITHER table (full-outer join of
    * the two count tables — a category present on one side only IS
    * the drift signal, floored to a finite term). NULL is its own
    * category ("(null)") so a drifting missing-share is reported, not
    * dropped. Shares floored at `floor`; terms `(q − p)·ln(q/p)`
    * round-6 from the UNROUNDED shares — one ln crossing, the [[psi]]
    * convention. Output: (category, ref_share, cur_share, psi_term),
    * one row per observed category. The shuffle is the two
    * category-count groupBys; totals ride as a 1-row broadcast. */
  def psiCategorical(ref: DataFrame, cur: DataFrame, valueCol: String,
                     floor: Double = 1e-6): DataFrame =
    psiCatOfCounts(categoryCounts(ref, valueCol, "_cr"),
      categoryCounts(cur, valueCol, "_cc"), floor)

  /** Per-category counts with the '(null)' category — works unchanged
    * on a STREAMING DataFrame (projection + groupBy: the engine
    * maintains one state row per live category in complete mode), the
    * categorical sibling of [[binCounts]]. */
  def categoryCounts(df: DataFrame, valueCol: String,
                     out: String): DataFrame =
    df.select(coalesce(col(valueCol).cast("string"), lit("(null)"))
        .as("category"))
      .groupBy("category").agg(count(lit(1)).as(out))

  /** STREAMING categorical drift monitor — [[psiStreamCounts]]'s
    * sibling: run in Complete mode, read the accumulated sink through
    * [[psiCatOfCounts]] against the fitted reference counts for the
    * live PSI. State is O(live categories); the corpus is never
    * rescanned. */
  def psiCatStreamCounts(stream: DataFrame, valueCol: String): DataFrame =
    categoryCounts(stream, valueCol, "_cc")

  /** The categorical-PSI arithmetic over two per-category count
    * tables — shared by the batch [[psiCategorical]] and the streaming
    * deploy so both land on IDENTICAL doubles. The domain is the
    * full-outer union of both tables' categories (one-sided
    * categories get the floored share). */
  def psiCatOfCounts(refCounts: DataFrame, curCounts: DataFrame,
                     floor: Double = 1e-6): DataFrame = {
    require(floor > 0, s"floor must be > 0, got $floor")
    val joined = refCounts
      .join(curCounts, Seq("category"), "full_outer")
      .select(col("category"), coalesce(col("_cr"), lit(0L)).as("_cr"),
        coalesce(col("_cc"), lit(0L)).as("_cc"))
    val tot = joined.agg(sum("_cr").as("_tr"), sum("_cc").as("_tc"))
    val p = greatest(col("_cr").cast("double") / col("_tr").cast("double"),
      lit(floor))
    val q = greatest(col("_cc").cast("double") / col("_tc").cast("double"),
      lit(floor))
    joined.crossJoin(broadcast(tot))
      .select(col("category"),
        round(p, 6).as("ref_share"),
        round(q, 6).as("cur_share"),
        round((q - p) * log(q / p), 6).as("psi_term"))
  }

  /** Pareto concentration curve ("do the top 20% of keys carry 80% of
    * the mass?"): entities ranked by descending decimal-exact mass,
    * sampled at `points` evenly spaced rank positions, emitting the
    * cumulative share of entities vs mass. The window runs over
    * #entities rows (the keySkew domain — bounded); the emitted curve
    * is `points` rows. Output: (pct_entities, pct_mass), both
    * round-6. */
  def paretoCurve(df: DataFrame, keyCol: String, valueCol: String,
                  points: Int = 10): DataFrame = {
    require(points >= 1, s"points must be >= 1, got $points")
    val money = org.apache.spark.sql.types.DecimalType(18, 2)
    val per = df.groupBy(col(keyCol).as("_k"))
      .agg(sum(col(valueCol).cast(money)).as("_v"))
    val w = Window.orderBy(col("_v").desc, col("_k").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = per.agg(sum("_v").as("_t"), count(lit(1)).as("_n"))
    per.withColumn("_r", count(lit(1)).over(w))
      .withColumn("_cum", sum("_v").over(w))
      .crossJoin(broadcast(tot))
      // sample at ceil(i·n/points): the i-th decile boundary rank
      .filter((col("_r") * points) % col("_n") < lit(points))
      .select(
        round(col("_r").cast("double") / col("_n").cast("double"), 6)
          .as("pct_entities"),
        round(col("_cum").cast("double") / col("_t").cast("double"), 6)
          .as("pct_mass"))
  }

  /** Join-key skew report — the number you need BEFORE deciding
    * between a plain shuffle join, a broadcast, or salting: distinct
    * key count, rows, the heaviest key's share, and the share of the
    * top `k` keys. One groupBy over keys + one exact top-k over the
    * (bounded) count table. Output: one row (n_rows, n_keys,
    * max_key_share, top_k_share, avg_rows_per_key). */
  def keySkew(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val counts = df.groupBy(col(keyCol).as("_k"))
      .agg(count(lit(1)).as("_c"))
    val topk = counts
      .withColumn("_r", row_number().over(
        Window.orderBy(col("_c").desc, col("_k").asc)))
      .filter(col("_r") <= k)
      .agg(sum("_c").as("_topk"))
    counts.agg(sum("_c").as("_n"), count(lit(1)).as("_d"),
        max("_c").as("_mx"))
      .crossJoin(broadcast(topk))
      .select(col("_n").as("n_rows"), col("_d").as("n_keys"),
        round(col("_mx").cast("double") / col("_n").cast("double"), 6)
          .as("max_key_share"),
        round(col("_topk").cast("double") / col("_n").cast("double"), 6)
          .as("top_k_share"),
        round(col("_n").cast("double") / col("_d").cast("double"), 6)
          .as("avg_rows_per_key"))
  }
}
