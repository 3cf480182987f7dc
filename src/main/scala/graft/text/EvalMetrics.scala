package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-scale text-generation evaluation metrics — BLEU (Papineni
  * et al. 2002) and ROUGE-N recall (Lin 2004) re-expressed as pure
  * n-gram COUNT aggregations, the eval-side operator a model-output
  * pipeline needs: scoring 10⁹ generated documents against references
  * is embarrassingly parallel when the metric is "clipped n-gram
  * matches over totals", and both metrics are exactly that.
  *
  * Plan shape: each order's n-grams materialize in-row via
  * `transform(sequence)+slice` (window-free, codegen — the
  * Quality.ngramOccurrences pattern), ONE explode feeds the
  * per-(doc, gram) counts on each side, and the clipped-match kernel
  * is a doc+gram-keyed FULL join — every shuffle keyed, nothing
  * pairwise across documents. Corpus BLEU then aggregates four
  * integer count pairs and a length pair into one row; integer
  * counts → correctly-rounded IEEE double ops, so both metrics replay
  * exactly in an external SQL engine.
  */
object EvalMetrics {

  /** Word n-grams of a token-ARRAY column as space-joined strings.
    * Empty below n tokens — guarded explicitly, because
    * `sequence(1, 0)` DESCENDS in Spark rather than being empty and
    * would feed `slice` a zero start. */
  private[text] def ngramsOf(toks: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val cnt = size(toks) - lit(n - 1)
    when(cnt <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), cnt),
        i => array_join(slice(toks, i, lit(n)), " ")))
  }

  /** (doc, _t token-array) projection of one side, MATERIALIZED
    * (`localCheckpoint`) because every order re-reads the arrays — at
    * maxN = 4 the tokenize regex would otherwise run four times per
    * side (the scoreByStupidBackoff rule). */
  private def tokSide(df: DataFrame, idCol: String,
                      textCol: String): DataFrame =
    df.select(col(idCol).as("doc"),
        TextFns.tokens(lower(col(textCol))).as("_t"))
      .localCheckpoint()

  /** Per-(doc, gram) counts of order-n grams over a [[tokSide]]. */
  private def gramCounts(toks: DataFrame, n: Int): DataFrame =
    toks.select(col("doc"), explode(ngramsOf(col("_t"), n)).as("gram"))
      .groupBy("doc", "gram").agg(count(lit(1)).as("_c"))

  /** Clipped n-gram overlap per document over two [[tokSide]]s:
    * (doc, matched_n, cand_n, ref_n) where
    * `matched_n = Σ_gram min(c_cand, c_ref)` — the shared sufficient
    * statistic of BLEU precision and ROUGE-N recall. Documents with
    * no order-n grams on either side surface with zeros (FULL join
    * over the per-gram counts). */
  private def overlapFromToks(cToks: DataFrame, rToks: DataFrame,
                              n: Int): DataFrame = {
    val c = gramCounts(cToks, n).withColumnRenamed("_c", "_cc")
    val r = gramCounts(rToks, n).withColumnRenamed("_c", "_rc")
    c.join(r, Seq("doc", "gram"), "full")
      .groupBy("doc")
      .agg(sum(least(coalesce(col("_cc"), lit(0L)),
          coalesce(col("_rc"), lit(0L)))).as(s"matched_$n"),
        sum(coalesce(col("_cc"), lit(0L))).as(s"cand_$n"),
        sum(coalesce(col("_rc"), lit(0L))).as(s"ref_$n"))
  }

  /** Public single-order overlap (tokenizes both sides). */
  def ngramOverlap(cands: DataFrame, refs: DataFrame, idCol: String,
                   candCol: String, refCol: String, n: Int): DataFrame =
    overlapFromToks(tokSide(cands, idCol, candCol),
      tokSide(refs, idCol, refCol), n)

  /** Per-document ROUGE-N recall for n = 1..maxN: clipped matches
    * over reference n-gram total, round-6 (0.0 when the reference has
    * no order-n grams — the no-reference convention that keeps the
    * metric total). Output: (doc, rouge_1, …, rouge_maxN) for every
    * candidate doc, ordered columns. */
  def rougeN(cands: DataFrame, refs: DataFrame, idCol: String,
             candCol: String, refCol: String, maxN: Int = 2): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    val cToks = tokSide(cands, idCol, candCol)
    val rToks = tokSide(refs, idCol, refCol)
    val spine = cToks.select(col("doc")).distinct()
    (1 to maxN).foldLeft(spine) { (acc, n) =>
      val ov = overlapFromToks(cToks, rToks, n)
        .select(col("doc"),
          when(col(s"ref_$n") > 0,
            round(col(s"matched_$n").cast("double") /
              col(s"ref_$n").cast("double"), 6))
            .otherwise(lit(0.0)).as(s"rouge_$n"))
      acc.join(ov, Seq("doc"), "left")
        .withColumn(s"rouge_$n", coalesce(col(s"rouge_$n"), lit(0.0)))
    }
  }

  /** Per-document ROUGE-L recall: `LCS(cand, ref) / ref_len` via the
    * native [[graft.functions.LcsLength]] codegen expression — the DP
    * is sequential PER ROW but row-local, so the operator distributes
    * perfectly (one keyed join, one projection; no shuffle beyond the
    * doc join). Candidates without a reference row score 0. Output:
    * (doc, lcs, rouge_l). */
  def rougeL(cands: DataFrame, refs: DataFrame, idCol: String,
             candCol: String, refCol: String): DataFrame = {
    graft.functions.TextExpressions.register(cands.sparkSession)
    val c = cands.select(col(idCol).as("doc"),
      TextFns.tokens(lower(col(candCol))).as("_ct"))
    val r = refs.select(col(idCol).as("doc"),
      TextFns.tokens(lower(col(refCol))).as("_rt"))
    c.join(r, Seq("doc"), "left")
      .select(col("doc"),
        coalesce(call_function("lcs_len", col("_ct"),
          coalesce(col("_rt"), array().cast("array<string>"))), lit(0))
          .as("lcs"),
        coalesce(size(col("_rt")), lit(0)).as("_rl"))
      .select(col("doc"), col("lcs"),
        when(col("_rl") > 0,
          round(col("lcs").cast("double") / col("_rl").cast("double"), 6))
          .otherwise(lit(0.0)).as("rouge_l"))
  }

  /** Corpus BLEU-maxN: ONE row with the geometric mean of corpus-level
    * clipped precisions p₁..p_maxN under the brevity penalty
    * `BP = exp(min(0, 1 − ref_len/cand_len))`. Any zero pₙ (or an
    * empty candidate corpus) gives bleu = 0 by the standard
    * convention — logs never go −∞. All inputs are exact BIGINT
    * count sums; p_n and bp round at 6 BEFORE entering the final
    * product so both engines land on the identical bleu.
    * Output: (bleu, bp, p_1…p_maxN, cand_len, ref_len). */
  def corpusBleu(cands: DataFrame, refs: DataFrame, idCol: String,
                 candCol: String, refCol: String, maxN: Int = 4): DataFrame = {
    require(maxN >= 1, s"maxN must be >= 1, got $maxN")
    val cToks = tokSide(cands, idCol, candCol)
    val rToks = tokSide(refs, idCol, refCol)
    val lens = cToks
      .select(size(col("_t")).cast("long").as("_cl"))
      .agg(sum("_cl").as("cand_len"))
      .crossJoin(rToks
        .select(size(col("_t")).cast("long").as("_rl"))
        .agg(sum("_rl").as("ref_len")))
    val totals = (1 to maxN).map { n =>
      overlapFromToks(cToks, rToks, n)
        .agg(sum(s"matched_$n").as(s"m_$n"), sum(s"cand_$n").as(s"t_$n"))
    }.reduce(_ crossJoin _)
    val joined = lens.crossJoin(totals)
    val ps = (1 to maxN).map { n =>
      when(coalesce(col(s"t_$n"), lit(0L)) > 0,
        round(coalesce(col(s"m_$n"), lit(0L)).cast("double") /
          col(s"t_$n").cast("double"), 6))
        .otherwise(lit(0.0)).as(s"p_$n")
    }
    val bp = when(col("cand_len") >= col("ref_len") && col("cand_len") > 0,
        lit(1.0))
      .otherwise(when(col("cand_len") > 0,
        round(exp(lit(1.0) - col("ref_len").cast("double") /
          col("cand_len").cast("double")), 6))
        .otherwise(lit(0.0)))
    val withP = joined.select(
      (Seq(bp.as("bp"), col("cand_len"), col("ref_len")) ++ ps): _*)
    val anyZero = (1 to maxN).map(n => col(s"p_$n") === 0.0)
      .reduce(_ || _)
    val logMean = (1 to maxN).map(n => log(col(s"p_$n")))
      .reduce(_ + _) / lit(maxN.toDouble)
    withP.select(
      (when(anyZero, lit(0.0))
        .otherwise(round(col("bp") * exp(logMean), 6)).as("bleu") +:
        col("bp") +:
        (1 to maxN).map(n => col(s"p_$n")) :+
        col("cand_len") :+ col("ref_len")): _*)
  }
}
