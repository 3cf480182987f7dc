package graft.text

import org.apache.spark.sql.DataFrame
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
}
