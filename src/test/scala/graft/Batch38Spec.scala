package graft

import graft.text.Redact
import org.apache.spark.sql.functions._

/** Round-12: dictionary term redaction. */
class Batch38Spec extends SparkSpec {
  import spark.implicits._

  test("redactTerms masks exact tokens only, counts them, normalizes") {
    val docs = Seq(
      (1L, "Spark is fast"),          // term hit under normalization
      (2L, "the hashtag economy"),    // no substring bleed from 'hash'
      (3L, "dup DUP; dup!"),          // three masks
      (4L, ""),                       // empty -> empty, zero masks
      (5L, "clean words only"))
      .toDF("doc_id", "text")
    val out = Redact.redactTerms(docs, "text", Seq("spark", "dup", "hash"))
      .select("doc_id", "text_redacted", "n_redacted")
      .orderBy("doc_id")
      .as[(Long, String, Long)].collect()
    assert(out(0) === ((1L, "[REDACTED] is fast", 1L)))
    assert(out(1) === ((2L, "the hashtag economy", 0L)))
    assert(out(2) === ((3L, "[REDACTED] [REDACTED] [REDACTED]", 3L)))
    assert(out(3) === ((4L, "", 0L)))
    assert(out(4) === ((5L, "clean words only", 0L)))
  }

  test("redactTerms custom mask and dictionary normalization") {
    val docs = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val out = Redact.redactTerms(docs, "text", Seq("  BETA!  "), mask = "*")
      .select("text_redacted", "n_redacted")
      .as[(String, Long)].head()
    assert(out === (("alpha *", 1L)))
    intercept[IllegalArgumentException] {
      Redact.redactTerms(docs, "text", Seq("two words", " "))
    }
  }
}
