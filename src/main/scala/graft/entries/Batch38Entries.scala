package graft.entries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.{Tables => T}

/** Round-12 batch: dictionary redaction — masking the members of a
  * term list (name lists, codenames) in place, the masking sibling of
  * the blocklist's page removal. */
object Batch38Entries {

  private val redactTerms = Seq("hash", "dup", "spark")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "term_redact" -> ((s, dir) => {
      graft.text.Redact.redactTerms(T.documents(s, dir), "text",
          redactTerms)
        .select("doc_id", "text_redacted", "n_redacted")
        .orderBy("doc_id")
    }),

    // Corpus-wide top bigrams (the WIMBD "most common n-grams"
    // analysis): one explode-once bigram construction off the
    // let-bound token array, one map-side-combined groupBy, exact
    // top-20 with a total order.
    "corpus_top_ngrams" -> ((s, dir) => {
      val toks = graft.text.TextFns.tokens(
        graft.text.TextFns.cleanText(col("text")))
      val bigrams = T.documents(s, dir)
        .select(explode(transform(array(toks), t =>
          when(size(t) >= 2, transform(sequence(lit(1), size(t) - 1),
            i => concat(element_at(t, i), lit(" "), element_at(t, i + 1))))
            .otherwise(array().cast("array<string>"))).getItem(0))
          .as("bigram"))
      bigrams.groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram").asc)
        .limit(20)
    })
  )

  val oracleSql: Map[String, String] = Map(

    "term_redact" -> {
      val lst = redactTerms.map(t => s"'$t'").mkString("[", ", ", "]")
      s"""WITH d AS (SELECT doc_id,
         |    trim(regexp_replace(regexp_replace(lower(text),
         |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS clean
         |  FROM documents),
         |t AS (SELECT doc_id,
         |    CASE WHEN clean = '' THEN []::VARCHAR[]
         |         ELSE string_split_regex(clean, '\\s+') END AS toks
         |  FROM d)
         |SELECT doc_id,
         |  COALESCE(array_to_string(list_transform(toks,
         |    x -> CASE WHEN list_contains($lst, x)
         |         THEN '[REDACTED]' ELSE x END), ' '), '') AS text_redacted,
         |  CAST(len(list_filter(toks,
         |    x -> list_contains($lst, x))) AS BIGINT) AS n_redacted
         |FROM t ORDER BY doc_id""".stripMargin
    },

    "corpus_top_ngrams" ->
      """WITH d AS (SELECT
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS clean
        |  FROM documents WHERE len(trim(text)) > 0),
        |t AS (SELECT string_split_regex(clean, '\s+') AS toks FROM d
        |  WHERE clean <> ''),
        |b AS (SELECT toks[i.i] || ' ' || toks[i.i + 1] AS bigram
        |  FROM t, (SELECT unnest(range(1, 400)) AS i) i
        |  WHERE i.i <= len(toks) - 1)
        |SELECT bigram, COUNT(*) AS n FROM b GROUP BY 1
        |ORDER BY n DESC, bigram ASC LIMIT 20""".stripMargin
  )
}
