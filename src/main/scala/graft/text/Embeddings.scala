package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pretrained-embedding document vectors.
  *
  * Reference: `apply_word_embeddings` (gofast/dataops/
  * preprocessing.py:3285) — load an embedding file, average the word
  * vectors of each document. Here the vocabulary is a (token → vec)
  * DataFrame, broadcast-joined against exploded tokens; the mean is
  * dimension-wise via posexplode + two groupBys. Out-of-vocabulary
  * tokens are skipped, like the reference.
  */
object Embeddings {

  /** Mean word-embedding per document.
    * @param vocab (token: string, vec: array<float|double>) — must be
    *              broadcastable (it is a vocabulary, not a corpus).
    * Output: (doc, doc_vec array<double>, n_tokens_matched). */
  def meanWordEmbedding(docs: DataFrame, idCol: String, textCol: String,
                        vocab: DataFrame): DataFrame = {
    val toks = docs.select(col(idCol).as("doc"),
      explode(TextFns.tokens(lower(col(textCol)))).as("token"))
    val joined = toks.join(broadcast(vocab), "token")
    val perDim = joined
      .select(col("doc"), posexplode(col("vec")).as(Seq("dim", "v")))
      .groupBy("doc", "dim")
      .agg(avg(col("v").cast("double")).as("mv"))
    val matched = joined.groupBy("doc")
      .agg(count(lit(1)).as("n_tokens_matched"))
    perDim.groupBy("doc")
      .agg(transform(
        array_sort(collect_list(struct(col("dim"), col("mv")))),
        s => s.getField("mv")).as("doc_vec"))
      .join(matched, "doc")
  }
}
