package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Tables => T}

/** Round-12 batch: the trained quality classifier's deploy path
  * (fit/deploy split like bm25Index — training is ScalaTest-gated,
  * scoring replays fixed weights in SQL).
  */
object Batch27Entries {

  /** Formula-derived fixed weights (portable-oracle mode, the
    * make_classification pattern): weight(f) = ((37f + 11) mod 21 − 10)
    * / 20 ∈ [−0.5, 0.5], intercept 0.007. The 0.007 offset keeps every
    * round-6 margin strictly off the 0.05-grid zero, so the label
    * threshold and the −0.0 parquet bit pattern can never be decided
    * by a last-ulp summation difference. */
  private def fixedWeights(s: SparkSession): DataFrame =
    s.range(1024).select(col("id").as("feature"),
        ((((col("id") * 37 + 11) % 21).cast("double")) - lit(10.0))
          ./(lit(20.0)).as("weight"))
      .unionByName(s.range(1).select(lit(-1L).as("feature"),
        lit(0.007).as("weight")))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // QualityClassifier.score: hashed unigram+bigram features (md5
    // 60-bit portable hash mod 1024), broadcast weights join, one
    // groupBy per doc; margin round-6 before sigmoid, sigmoid round-6.
    "quality_clf" -> ((s, dir) => {
      graft.ml.QualityClassifier.score(T.documents(s, dir), "doc_id",
          "text", fixedWeights(s), numFeatures = 1024)
        .orderBy("doc")
    }))

  def oracleSql: Map[String, String] = Map(
    // Replays the full deploy path: tokenize, unigrams + '_'-joined
    // bigrams, md5-60-bit feature hash mod 1024, formula weights,
    // per-doc sum + 0.007 intercept round-6, sigmoid round-6, label =
    // margin > 0. Docs with no tokens stay, scored at the intercept.
    "quality_clf" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    string_split_regex(trim(lower(text)), '\s+') AS toks
        |  FROM documents WHERE len(trim(text)) > 0),
        |terms AS (
        |  SELECT doc_id, unnest(list_concat(toks,
        |    list_transform(range(1, len(toks)),
        |      i -> toks[i] || '_' || toks[i+1]))) AS term
        |  FROM t),
        |f AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(term), 1, 15)) AS BIGINT) % 1024
        |      AS feature
        |  FROM terms),
        |w AS (
        |  SELECT range AS feature,
        |    (CAST((range * 37 + 11) % 21 AS DOUBLE) - 10.0) / 20.0 AS weight
        |  FROM range(1024)),
        |m AS (
        |  SELECT f.doc_id, SUM(w.weight) AS wsum
        |  FROM f JOIN w USING (feature) GROUP BY 1),
        |s AS (
        |  SELECT d.doc_id AS doc,
        |    ROUND(0.007 + COALESCE(m.wsum, 0.0), 6) AS margin
        |  FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id)
        |SELECT doc, margin,
        |  ROUND(1.0 / (1.0 + EXP(-margin)), 6) AS score,
        |  CAST(CASE WHEN margin > 0 THEN 1 ELSE 0 END AS INT) AS label
        |FROM s ORDER BY doc""".stripMargin)
}
