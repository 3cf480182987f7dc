package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-corpus distribution diagnostics — the measurement half of
  * data mixing. Token-budget selection (Quality.scala) and DSIR
  * (Embeddings/dsir) DECIDE what goes in the mix; these statistics
  * tell you how far two corpora (or a corpus and its filtered self,
  * or yesterday's dump and today's) have drifted — the standard
  * domain-shift dashboard number for a training-data pipeline.
  *
  * Reference north-star: corpus-comparison statistics
  * (gofast/stats descriptive + inferential families applied to text);
  * the divergence definitions are the public information-theory
  * standards (Kullback–Leibler 1951; Lin, "Divergence measures based
  * on the Shannon entropy", IEEE IT 1991 for Jensen–Shannon).
  */
object CorpusStats {

  /** Unigram-distribution divergences between two corpora: ONE row
    * (n_vocab, n_tokens_a, n_tokens_b, kl_ab, kl_ba, js).
    *
    * Both distributions are add-α smoothed over the UNION vocabulary
    * `V` — `p(w) = (c_a(w) + α) / (N_a + α·|V|)` — so every log is
    * finite and both P and Q sum to 1 over the same support (the
    * precondition KL needs). JS is Lin's symmetric form
    * `½·KL(P‖M) + ½·KL(Q‖M)` with `M = (P+Q)/2`; it is bounded by
    * ln 2 and zero iff the smoothed distributions coincide.
    *
    * Plan shape: one tokenize+count pass per corpus, ONE full outer
    * join on token (the only corpus-sized exchange), scalars
    * (N_a, N_b, |V|) ride as a 1-row broadcast (the BM25 convention),
    * then a single partial-aggregated sum — sufficient-statistics
    * throughout, nothing driver-sized but the output row.
    *
    * Determinism: each per-token contribution is a pure IEEE
    * expression (`ln` of a quotient of smoothed counts, identical SQL
    * tree in any engine); the four corpus sums round to 6 dp, the
    * same contract as `mean_logprob` in LangModel — aggregation-order
    * ulps are absorbed by the rounding.
    */
  def corpusDivergence(a: DataFrame, b: DataFrame,
                       textColA: String, textColB: String,
                       alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha must be > 0 (zero counts need mass), got $alpha")
    def counts(df: DataFrame, tc: String, out: String) =
      df.select(explode(TextFns.tokens(col(tc))).as("token"))
        .groupBy("token").agg(count(lit(1)).as(out))
    val ca = counts(a, textColA, "ca")
    val cb = counts(b, textColB, "cb")
    val joined = ca.join(cb, Seq("token"), "full_outer")
      .select(coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
    val scalars = joined.agg(sum("ca").as("_na"), sum("cb").as("_nb"),
      count(lit(1)).as("_v"))
    val al = lit(alpha)
    val p = (col("ca").cast("double") + al) /
      (col("_na").cast("double") + al * col("_v").cast("double"))
    val q = (col("cb").cast("double") + al) /
      (col("_nb").cast("double") + al * col("_v").cast("double"))
    val m = (p + q) / lit(2.0)
    joined.crossJoin(broadcast(scalars))
      .agg(
        max(col("_v")).as("n_vocab"),
        max(col("_na")).as("n_tokens_a"),
        max(col("_nb")).as("n_tokens_b"),
        round(sum(p * log(p / q)), 6).as("kl_ab"),
        round(sum(q * log(q / p)), 6).as("kl_ba"),
        round(sum(p * log(p / m) / lit(2.0) + q * log(q / m) / lit(2.0)), 6)
          .as("js"))
  }

  /** Zipf's-law fit: OLS of `ln(freq)` on `ln(rank)` over the unigram
    * frequency table — the corpus-health diagnostic (natural text
    * slopes ≈ −1; heavily templated/boilerplate corpora flatten, OCR
    * noise steepens the tail). One row:
    * (n_types, n_tokens, slope, intercept).
    *
    * Rank is `row_number` over (freq desc, token asc) — fully
    * deterministic. The ordered pass is a window over |vocab| rows
    * (vocabularies saturate in the millions — driver-safe but
    * single-task; at extreme vocab sizes pre-filter `minFreq > 1`,
    * which also removes the hapax plateau the fit shouldn't see).
    * OLS sums round to 6 dp.
    */
  // Shared OLS guard: with one point (or all-equal x) the denominator
  // Sxx − Sx²/n is 0 and a bare division emits NaN silently; the
  // family convention is NULL-on-undefined (kappaSummary, rocAuc).
  private def olsSlope(sx: Column, sy: Column, sxy: Column, sxx: Column,
                       n: Column): Column = {
    val denom = sxx - sx * sx / n
    when(n > 1 && denom =!= 0.0, (sxy - sx * sy / n) / denom)
  }

  private def olsIntercept(sx: Column, sy: Column, sxy: Column, sxx: Column,
                           n: Column): Column =
    sy / n - olsSlope(sx, sy, sxy, sxx, n) * sx / n

  def zipfFit(df: DataFrame, textCol: String, minFreq: Long = 1L): DataFrame = {
    require(minFreq >= 1, s"minFreq must be >= 1, got $minFreq")
    val counts = df.select(explode(TextFns.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)
    val ranked = counts.withColumn("rank",
      row_number().over(Window.orderBy(col("freq").desc, col("token").asc)))
    val xy = ranked.select(
      log(col("rank").cast("double")).as("x"),
      log(col("freq").cast("double")).as("y"),
      col("freq"))
    xy.agg(count(lit(1)).as("_n"), sum("freq").as("_tok"),
        sum("x").as("_sx"), sum("y").as("_sy"),
        sum(col("x") * col("y")).as("_sxy"),
        sum(col("x") * col("x")).as("_sxx"))
      .select(col("_n").as("n_types"), col("_tok").as("n_tokens"),
        round(olsSlope(col("_sx"), col("_sy"), col("_sxy"), col("_sxx"),
          col("_n").cast("double")), 6).as("slope"),
        round(olsIntercept(col("_sx"), col("_sy"), col("_sxy"), col("_sxx"),
          col("_n").cast("double")), 6).as("intercept"))
  }

  /** Vocabulary-growth curve (Heaps' law input): after each document
    * in `idCol` order, the cumulative token count N and cumulative
    * distinct-type count V. A token's first occurrence is
    * `min(idCol)` over its postings — one corpus pass — so V's
    * increments are exact without any prefix-distinct scan; both
    * cumsums are one window over the (bounded) per-doc increment
    * table. `sampleEvery` keeps the emitted curve bounded (every
    * k-th doc id); the fit-side consumer is [[heapsFit]].
    * Output: (idCol, cum_tokens, cum_types). */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
                  sampleEvery: Long = 1L,
                  bucketSize: Long = 1000000L): DataFrame = {
    require(sampleEvery >= 1, s"sampleEvery must be >= 1, got $sampleEvery")
    require(bucketSize >= 1, s"bucketSize must be >= 1, got $bucketSize")
    val toks = df.select(col(idCol).as("_id"),
      explode(TextFns.tokens(col(textCol))).as("token"))
    val perDocTokens = toks.groupBy("_id").agg(count(lit(1)).as("_nt"))
    val firstOcc = toks.groupBy("token").agg(min("_id").as("_id"))
      .groupBy("_id").agg(count(lit(1)).as("_new"))
    val incr = perDocTokens.join(firstOcc, Seq("_id"), "left")
      .withColumn("_new", coalesce(col("_new"), lit(0L)))
      .withColumn("_b", floor(col("_id") / bucketSize))
    // two-level prefix sum (the packShards / token-budget kernel): a
    // single global-ordered window would funnel every document
    // through ONE task. Level 1 sums each id-bucket (keyed groupBy);
    // level 2 runs the unpartitioned window over #buckets rows only
    // (bounded — 1e6 ids per bucket ⇒ thousands of buckets at any
    // corpus size); level 3 is a PER-BUCKET window joined back to the
    // bucket offsets. Bit-identical to the one-window form (integer
    // sums in exact arithmetic), asserted in Batch36Spec.
    val bTot = incr.groupBy("_b")
      .agg(sum("_nt").as("_bt"), sum("_new").as("_bn"))
    val wB = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    val bOff = bTot.select(col("_b"),
      coalesce(sum("_bt").over(wB), lit(0L)).as("_ot"),
      coalesce(sum("_bn").over(wB), lit(0L)).as("_on"))
    val wIn = Window.partitionBy("_b").orderBy("_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    incr.join(bOff, Seq("_b"))
      .select(col("_id"),
        (sum("_nt").over(wIn) + col("_ot")).as("cum_tokens"),
        (sum("_new").over(wIn) + col("_on")).as("cum_types"))
      .filter(col("_id") % sampleEvery === 0)
      .withColumnRenamed("_id", idCol)
  }

  /** Heaps'-law fit `V ≈ K·N^β`: OLS of `ln V` on `ln N` over the
    * [[vocabGrowth]] curve. One row: (n_points, beta, ln_k).
    * Sub-linear vocabulary growth (β ≈ 0.4–0.6 for natural text) is
    * the expected shape; β near 1 signals unbounded-type noise
    * (serial numbers, hashes) worth a cleaning pass. */
  def heapsFit(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val g = vocabGrowth(df, idCol, textCol)
    val xy = g.select(log(col("cum_tokens").cast("double")).as("x"),
      log(col("cum_types").cast("double")).as("y"))
    xy.agg(count(lit(1)).as("_n"), sum("x").as("_sx"), sum("y").as("_sy"),
        sum(col("x") * col("y")).as("_sxy"),
        sum(col("x") * col("x")).as("_sxx"))
      .select(col("_n").as("n_points"),
        round(olsSlope(col("_sx"), col("_sy"), col("_sxy"), col("_sxx"),
          col("_n").cast("double")), 6).as("beta"),
        round(olsIntercept(col("_sx"), col("_sy"), col("_sxy"), col("_sxx"),
          col("_n").cast("double")), 6).as("ln_k"))
  }

  /** Type-token ratio and basic lexical stats per group (source,
    * language, shard, ...): (groupCol, n_docs, n_tokens, n_types,
    * ttr) — the per-slice lexical-diversity dashboard. One explode,
    * two keyed aggregations. */
  def typeTokenRatio(df: DataFrame, groupCol: String,
                     textCol: String): DataFrame = {
    val toks = df.select(col(groupCol).as("grp"), col(textCol).as("_t"))
      .select(col("grp"), explode(TextFns.tokens(col("_t"))).as("token"))
    val docs = df.groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_docs"))
    val stats = toks.groupBy("grp").agg(count(lit(1)).as("n_tokens"),
      count_distinct(col("token")).as("n_types"))
    docs.join(stats, Seq("grp"), "left")
      .select(col("grp").as(groupCol), col("n_docs"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        round(col("n_types").cast("double") /
          col("n_tokens").cast("double"), 6).as("ttr"))
  }
}
