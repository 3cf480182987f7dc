package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Tables => T}

/** Round-11 batch: BM25 retrieval over the documents corpus (closing
  * the r10 ADVICE gap — the kernel shipped in round 10 with no entry,
  * no spec, no coverage registration).
  */
object Batch26Entries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Retrieval.bm25TopK: every ~97th document's first 5 tokens act as
    // a query against the full corpus (the "seed set similarity"
    // selection shape). Top-10 per query, Lucene idf, k1=1.2 b=0.75;
    // scores round-6 BEFORE ranking, ties broken by doc id.
    "bm25_topk" -> ((s, dir) => {
      val docs = T.documents(s, dir)
      val qs = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("qid"),
          array_join(slice(graft.text.TextFns.tokens(lower(col("text"))),
            1, 5), " ").as("qtext"))
      graft.text.Retrieval.bm25TopK(docs, qs, "doc_id", "text",
          "qid", "qtext", k = 10)
        .orderBy("query", "rank")
    }),

    // Retrieval.bm25Rankings + rrfFuse: reciprocal-rank fusion of two
    // BM25 parameterizations (k1=1.2/b=0.75 and k1=2.0/b=0.5 —
    // different length normalization) retrieved 20 deep from ONE
    // shared candidate table, fused top-10 at c=60. Two rankings →
    // the fused sum is one commutative IEEE add, so the round-6
    // scores are aggregation-order-exact.
    "rrf_fuse" -> ((s, dir) => {
      val docs = T.documents(s, dir)
      val qs = docs.filter(col("doc_id") % 97 === 0)
        .select(col("doc_id").as("qid"),
          array_join(slice(graft.text.TextFns.tokens(lower(col("text"))),
            1, 5), " ").as("qtext"))
      val rs = graft.text.Retrieval.bm25Rankings(docs, qs, "doc_id",
        "text", "qid", "qtext", Seq((1.2, 0.75), (2.0, 0.5)), k = 20)
      graft.text.Retrieval.rrfFuse(rs, "query", "doc", "rank")
        .orderBy("query", "rank")
    }))

  def oracleSql: Map[String, String] = Map(
    // Mirrors bm25TopK exactly: distinct (query, token) terms, one
    // tf table feeding df and dl, N = distinct doc ids, avgdl over
    // that N, Lucene idf, round-6 scores BEFORE row_number ranking.
    "bm25_topk" ->
      """WITH dt AS (
        |  SELECT doc_id AS doc,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents WHERE len(trim(text)) > 0),
        |dtf AS (SELECT doc, token, COUNT(*) AS tf FROM dt GROUP BY 1, 2),
        |dl AS (SELECT doc, SUM(tf) AS dl FROM dtf GROUP BY 1),
        |nn AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n
        |       FROM documents),
        |avg_dl AS (SELECT CAST(SUM(dl) AS DOUBLE) / (SELECT n FROM nn)
        |             AS avgdl FROM dl),
        |dfx AS (SELECT token, COUNT(*) AS df FROM dtf GROUP BY 1),
        |q AS (
        |  SELECT DISTINCT query, token FROM (
        |    SELECT doc_id AS query, unnest(list_slice(
        |        string_split_regex(trim(lower(text)), '\s+'), 1, 5)) AS token
        |    FROM documents WHERE doc_id % 97 = 0 AND len(trim(text)) > 0)),
        |scored AS (
        |  SELECT q.query, dtf.doc,
        |    ROUND(SUM(
        |      LN(1.0 + ((SELECT n FROM nn) - dfx.df + 0.5) / (dfx.df + 0.5))
        |      * (CAST(dtf.tf AS DOUBLE) * 2.2)
        |      / (CAST(dtf.tf AS DOUBLE) + 1.2 * (0.25 +
        |          0.75 * CAST(dl.dl AS DOUBLE) / (SELECT avgdl FROM avg_dl)))
        |    ), 6) AS score
        |  FROM q
        |  JOIN dtf ON q.token = dtf.token
        |  JOIN dfx ON q.token = dfx.token
        |  JOIN dl ON dtf.doc = dl.doc
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT query, doc, score,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query
        |      ORDER BY score DESC, doc ASC) AS INT) AS rank
        |  FROM scored)
        |SELECT query, doc, score, rank FROM ranked WHERE rank <= 10
        |ORDER BY query, rank""".stripMargin,

    // Same shared tf/df/dl CTEs; two BM25 parameterizations ranked 20
    // deep, then RRF: sum of 1/(60+rank) over the rankings that
    // retrieved the pair, round-6 before the fused ranking.
    "rrf_fuse" ->
      """WITH dt AS (
        |  SELECT doc_id AS doc,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
        |  FROM documents WHERE len(trim(text)) > 0),
        |dtf AS (SELECT doc, token, COUNT(*) AS tf FROM dt GROUP BY 1, 2),
        |dl AS (SELECT doc, SUM(tf) AS dl FROM dtf GROUP BY 1),
        |nn AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n
        |       FROM documents),
        |avg_dl AS (SELECT CAST(SUM(dl) AS DOUBLE) / (SELECT n FROM nn)
        |             AS avgdl FROM dl),
        |dfx AS (SELECT token, COUNT(*) AS df FROM dtf GROUP BY 1),
        |q AS (
        |  SELECT DISTINCT query, token FROM (
        |    SELECT doc_id AS query, unnest(list_slice(
        |        string_split_regex(trim(lower(text)), '\s+'), 1, 5)) AS token
        |    FROM documents WHERE doc_id % 97 = 0 AND len(trim(text)) > 0)),
        |cand AS (
        |  SELECT q.query, dtf.doc, dtf.tf, dfx.df, dl.dl
        |  FROM q
        |  JOIN dtf ON q.token = dtf.token
        |  JOIN dfx ON q.token = dfx.token
        |  JOIN dl ON dtf.doc = dl.doc),
        |s1 AS (
        |  SELECT query, doc, ROUND(SUM(
        |    LN(1.0 + ((SELECT n FROM nn) - df + 0.5) / (df + 0.5))
        |    * (CAST(tf AS DOUBLE) * 2.2)
        |    / (CAST(tf AS DOUBLE) + 1.2 * (0.25 +
        |        0.75 * CAST(dl AS DOUBLE) / (SELECT avgdl FROM avg_dl)))
        |  ), 6) AS score FROM cand GROUP BY 1, 2),
        |s2 AS (
        |  SELECT query, doc, ROUND(SUM(
        |    LN(1.0 + ((SELECT n FROM nn) - df + 0.5) / (df + 0.5))
        |    * (CAST(tf AS DOUBLE) * 3.0)
        |    / (CAST(tf AS DOUBLE) + 2.0 * (0.5 +
        |        0.5 * CAST(dl AS DOUBLE) / (SELECT avgdl FROM avg_dl)))
        |  ), 6) AS score FROM cand GROUP BY 1, 2),
        |r1 AS (
        |  SELECT query, doc, ROW_NUMBER() OVER (PARTITION BY query
        |    ORDER BY score DESC, doc ASC) AS rank FROM s1
        |  QUALIFY rank <= 20),
        |r2 AS (
        |  SELECT query, doc, ROW_NUMBER() OVER (PARTITION BY query
        |    ORDER BY score DESC, doc ASC) AS rank FROM s2
        |  QUALIFY rank <= 20),
        |u AS (
        |  SELECT query, doc, rank FROM r1
        |  UNION ALL SELECT query, doc, rank FROM r2),
        |fused AS (
        |  SELECT query, doc,
        |    ROUND(SUM(1.0 / (60.0 + CAST(rank AS DOUBLE))), 6) AS score
        |  FROM u GROUP BY 1, 2),
        |ranked AS (
        |  SELECT query, doc, score,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query
        |      ORDER BY score DESC, doc ASC) AS INT) AS rank
        |  FROM fused)
        |SELECT query, doc, score, rank FROM ranked WHERE rank <= 10
        |ORDER BY query, rank""".stripMargin)
}
