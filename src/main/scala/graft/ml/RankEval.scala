package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality metrics — the evaluation side of the retrieval
  * axis ([[graft.text.Retrieval]]): once BM25 / RRF / ANN produce a
  * per-query ranking, these are the numbers that compare retrievers.
  * Definitions are the IR standards: MRR, nDCG@k with exponential
  * gain (Järvelin & Kekäläinen 2002), precision/recall@k.
  *
  * Scale shape: everything is keyed by query — one join of the
  * (top-k-bounded) ranking against the qrels, one window over each
  * query's qrels for the ideal DCG, two groupBys. Nothing is
  * corpus-sized; input volume is queries × k.
  *
  * Determinism: gains are exact integers (`2^rel − 1` via bit shift),
  * discounts are `ln(pos+1)/ln 2` — the identical IEEE tree in any
  * engine — and every emitted ratio rounds to 6 dp.
  */
object RankEval {

  /** Per-query metrics of `ranking` (queryCol, docCol, rankCol; rank
    * 1-based) against graded relevance judgments `qrels` (queryCol,
    * docCol, relCol ≥ 0; absent pairs = rel 0).
    *
    * Output, one row per query that has at least one positive qrel:
    * (query, n_rel, first_rel_rank, rr, ndcg, precision_k, recall_k)
    * where rr = 1/first_rel_rank (0 when nothing relevant was
    * retrieved in the top k), ndcg normalizes by the ideal DCG of the
    * query's own qrels truncated at k, and precision/recall count
    * retrieved docs with rel > 0. Queries with no positive qrel are
    * dropped (their metrics are undefined, not zero). */
  def rankingMetrics(ranking: DataFrame, qrels: DataFrame,
                     queryCol: String, docCol: String, rankCol: String,
                     relCol: String, k: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val ln2 = log(lit(2.0))
    // ideal DCG per query: its own rels, best-first, truncated at k
    val wIdeal = Window.partitionBy("query")
      .orderBy(col("rel").desc, col("doc").asc)
    val qr = qrels.select(col(queryCol).as("query"), col(docCol).as("doc"),
        col(relCol).cast("int").as("rel"))
      .filter(col("rel") > 0)
    val ideal = qr
      .withColumn("_pos", row_number().over(wIdeal))
      .groupBy("query")
      .agg(count(lit(1)).as("n_rel"),
        sum(when(col("_pos") <= k,
          (expr("shiftleft(CAST(1 AS BIGINT), rel)") - lit(1L)).cast("double") /
            (log(col("_pos").cast("double") + lit(1.0)) / ln2))
          .otherwise(lit(0.0))).as("_idcg"))
    val topk = ranking.select(col(queryCol).as("query"),
        col(docCol).as("doc"), col(rankCol).cast("int").as("rank"))
      .filter(col("rank") <= k)
      .join(qr, Seq("query", "doc"), "left")
      .withColumn("rel", coalesce(col("rel"), lit(0)))
    val perQuery = topk.groupBy("query").agg(
      min(when(col("rel") > 0, col("rank"))).as("first_rel_rank"),
      sum(when(col("rel") > 0, 1L).otherwise(0L)).as("_hits"),
      sum((expr("shiftleft(CAST(1 AS BIGINT), rel)") - lit(1L)).cast("double") /
        (log(col("rank").cast("double") + lit(1.0)) / ln2)).as("_dcg"))
    // left join FROM the qrels side: a query the retriever returned
    // nothing for still appears, with zero metrics — dropping it
    // would silently inflate the macro averages
    ideal.join(perQuery, Seq("query"), "left")
      .select(col("query"), col("n_rel"), col("first_rel_rank"),
        round(coalesce(lit(1.0) / col("first_rel_rank").cast("double"),
          lit(0.0)), 6).as("rr"),
        round(coalesce(col("_dcg"), lit(0.0)) / col("_idcg"), 6).as("ndcg"),
        round(coalesce(col("_hits"), lit(0L)).cast("double") /
          lit(k.toDouble), 6).as("precision_k"),
        round(coalesce(col("_hits"), lit(0L)).cast("double") /
          col("n_rel").cast("double"), 6).as("recall_k"))
  }

  /** Macro average of [[rankingMetrics]] over queries: one row
    * (n_queries, mrr, mean_ndcg, mean_precision_k, mean_recall_k). */
  def summarize(metrics: DataFrame): DataFrame =
    metrics.agg(count(lit(1)).as("n_queries"),
      round(avg("rr"), 6).as("mrr"),
      round(avg("ndcg"), 6).as("mean_ndcg"),
      round(avg("precision_k"), 6).as("mean_precision_k"),
      round(avg("recall_k"), 6).as("mean_recall_k"))
}
