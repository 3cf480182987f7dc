package graft

import org.apache.spark.sql.functions._
import graft.text.Retrieval

/** BM25 retrieval kernel (r10 ADVICE: shipped with no spec). The fixture
  * is small enough to verify every constant by hand:
  *
  *   d1 "apple banana apple"         tf(apple)=2 tf(banana)=1  dl=3
  *   d2 "banana cherry"              tf(banana)=1 tf(cherry)=1 dl=2
  *   d3 "cherry cherry cherry apple" tf(cherry)=3 tf(apple)=1  dl=4
  *
  *   N=3, avgdl=3, df(apple)=2 df(banana)=2 df(cherry)=2
  *   idf(t) = ln(1 + (3 − 2 + 0.5)/(2 + 0.5)) = ln(1.6)  for all three
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry apple")).toDF("doc_id", "text")

  private val idf = math.log(1.6)
  private def w(tf: Int, dl: Int, k1: Double = 1.2, b: Double = 0.75) =
    tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / 3.0))
  private def r6(x: Double) = BigDecimal(x)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("bm25TopK matches hand-computed scores and rank order") {
    val qs = Seq((10L, "apple cherry apple")).toDF("qid", "qtext")
    val got = Retrieval.bm25TopK(docs, qs, "doc_id", "text", "qid", "qtext")
      .orderBy("rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    // query terms = {apple, cherry} (repeated "apple" counts once)
    val s1 = r6(idf * w(2, 3))            // d1: apple only
    val s2 = r6(idf * w(1, 2))            // d2: cherry only
    val s3 = r6(idf * w(3, 4) + idf * w(1, 4)) // d3: cherry + apple
    assert(got.map(_._3) == Seq(s3, s1, s2).sorted.reverse)
    // hand order: d3 (two terms) > d1 > d2
    assert(got == Seq((10L, 3L, s3, 1), (10L, 1L, s1, 2), (10L, 2L, s2, 3)))
  }

  test("query terms dedup PER QUERY ID across rows, not per input row") {
    // same id split over two rows, sharing "apple": term set must be
    // {apple, cherry} — identical scores to the single-row query above
    val split = Seq((10L, "apple cherry"), (10L, "apple"))
      .toDF("qid", "qtext")
    val whole = Seq((10L, "apple cherry apple")).toDF("qid", "qtext")
    val a = Retrieval.bm25TopK(docs, split, "doc_id", "text", "qid", "qtext")
      .orderBy("rank").as[(Long, Long, Double, Int)].collect().toSeq
    val b = Retrieval.bm25TopK(docs, whole, "doc_id", "text", "qid", "qtext")
      .orderBy("rank").as[(Long, Long, Double, Int)].collect().toSeq
    assert(a == b)
  }

  test("k caps per query; ties break by ascending doc id") {
    val qs = Seq((1L, "banana")).toDF("qid", "qtext")
    // banana: d1 (tf=1, dl=3) and d2 (tf=1, dl=2) — d2's shorter doc
    // scores higher; with k=1 only d2 survives
    val got = Retrieval.bm25TopK(docs, qs, "doc_id", "text", "qid", "qtext",
        k = 1)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(got == Seq((1L, 2L, r6(idf * w(1, 2)), 1)))
    // two docs with IDENTICAL tf and dl tie exactly → lower doc id first
    val tied = Seq((7L, "pear plum"), (8L, "pear quince"))
      .toDF("doc_id", "text")
    val q2 = Seq((1L, "pear")).toDF("qid", "qtext")
    val r = Retrieval.bm25TopK(tied, q2, "doc_id", "text", "qid", "qtext")
      .select("doc", "rank").as[(Long, Int)].collect().toSeq
    assert(r == Seq((7L, 1), (8L, 2)))
  }

  test("rrfFuse sums reciprocal ranks; absent retrievers contribute nothing") {
    // ranking A: q1 → d1@1, d2@2 ; ranking B: q1 → d2@1, d3@2
    val a = Seq((1L, 1L, 1), (1L, 2L, 2)).toDF("query", "doc", "rank")
    val b = Seq((1L, 2L, 1), (1L, 3L, 2)).toDF("query", "doc", "rank")
    val got = graft.text.Retrieval
      .rrfFuse(Seq(a, b), "query", "doc", "rank", c = 60, k = 10)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect().toSeq
    val d2 = r6(1.0 / 62 + 1.0 / 61) // both rankings
    val d1 = r6(1.0 / 61)            // A only
    val d3 = r6(1.0 / 62)            // B only
    assert(got == Seq((1L, 2L, d2, 1), (1L, 1L, d1, 2), (1L, 3L, d3, 3)))
  }

  test("rrfFuse ties break by doc id; k caps output; c shifts scores") {
    // both docs appear at the same ranks → identical scores, id order
    val a = Seq((1L, 5L, 1), (1L, 9L, 2)).toDF("query", "doc", "rank")
    val b = Seq((1L, 9L, 1), (1L, 5L, 2)).toDF("query", "doc", "rank")
    val tied = graft.text.Retrieval
      .rrfFuse(Seq(a, b), "query", "doc", "rank", c = 0, k = 1)
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(tied == Seq((1L, 5L, r6(1.0 / 1 + 1.0 / 2), 1)))
  }

  test("fluent surface mirrors bm25TopK and rrfFuse") {
    import graft.core.GfFrame._
    val qs = Seq((10L, "apple cherry apple")).toDF("qid", "qtext")
    val direct = Retrieval.bm25TopK(docs, qs, "doc_id", "text",
      "qid", "qtext").orderBy("rank").collect().toSeq
    val fluent = docs.graft.bm25TopK(qs, "doc_id", "text", "qid", "qtext")
      .result.orderBy("rank").collect().toSeq
    assert(fluent == direct)
    val a = Seq((1L, 1L, 1)).toDF("query", "doc", "rank")
    val b = Seq((1L, 2L, 1)).toDF("query", "doc", "rank")
    val fused = a.graft.rrfFuseWith(Seq(b)).result
      .orderBy("rank").as[(Long, Long, Double, Int)].collect().toSeq
    assert(fused == Seq((1L, 1L, r6(1.0 / 61), 1), (1L, 2L, r6(1.0 / 61), 2)))
  }

  test("bm25Rankings shares one candidate table across parameterizations") {
    val qs = Seq((10L, "apple cherry")).toDF("qid", "qtext")
    val Seq(r1, r2) = Retrieval.bm25Rankings(docs, qs, "doc_id", "text",
      "qid", "qtext", Seq((1.2, 0.75), (2.0, 0.5)))
    // ranking 1 must equal the single-param call bit-for-bit
    val single = Retrieval.bm25TopK(docs, qs, "doc_id", "text",
      "qid", "qtext").orderBy("rank").collect().toSeq
    assert(r1.orderBy("rank").collect().toSeq == single)
    // ranking 2 reflects its own constants: hand-check d3's score
    val s3 = r6(idf * (3 * 3.0 / (3 + 2.0 * (0.5 + 0.5 * 4 / 3.0))) +
      idf * (1 * 3.0 / (1 + 2.0 * (0.5 + 0.5 * 4 / 3.0))))
    val got3 = r2.filter(col("doc") === 3).select("score")
      .as[Double](org.apache.spark.sql.Encoders.scalaDouble).head()
    assert(got3 == s3)
  }

  test("bm25Index round-trips through the Catalog with identical scores") {
    // the deploy contract: fit once, persist the flat postings
    // artifact, reload in another job, score identically
    val wh = java.nio.file.Files.createTempDirectory("bm25wh").toString
    val cat = new graft.io.Catalog(spark, wh)
    cat.save("bm25_index", Retrieval.bm25Index(docs, "doc_id", "text"))
    val reloaded = cat.table("bm25_index")
    val qs = Seq((10L, "apple cherry apple")).toDF("qid", "qtext")
    val live = Retrieval.bm25TopK(docs, qs, "doc_id", "text",
      "qid", "qtext").orderBy("rank").collect().toSeq
    // score from the RELOADED index via the shared contribution
    // expression — the exact path bm25StreamScores uses
    val fromIndex = qs.select(col("qid").as("query"),
        explode(array_distinct(graft.text.TextFns.tokens(
          lower(col("qtext"))))).as("token"))
      .dropDuplicates("query", "token")
      .join(reloaded, Seq("token"))
      .groupBy("query", "doc")
      .agg(round(sum(graft.text.Retrieval.bm25Contrib(1.2, 0.75)), 6)
        .as("score"))
      .orderBy(desc("score"), asc("doc"))
      .select("query", "doc", "score").collect().toSeq
    assert(fromIndex.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      == live.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))))
  }

  test("bm25_stream entry contains bm25_topk's top-k with equal scores") {
    // the streamed window emits EVERY (query, doc) score; the batch
    // top-k must be a subset with bit-equal round-6 scores
    val stream = SparkEntry.queries("bm25_stream")(spark, sf)
      .select("query", "doc", "score")
      .as[(Long, Long, Double)](org.apache.spark.sql.Encoders.product)
      .collect().toSet
    val topk = SparkEntry.queries("bm25_topk")(spark, sf)
      .select("query", "doc", "score")
      .as[(Long, Long, Double)](org.apache.spark.sql.Encoders.product)
      .collect().toSet
    assert(topk.nonEmpty)
    assert(topk.subsetOf(stream),
      s"top-k rows missing from the stream: ${topk.diff(stream).take(3)}")
  }

  test("empty corpus is rejected; tokenless queries match nothing") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val qs = Seq((1L, "apple")).toDF("qid", "qtext")
    val err = intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(empty, qs, "doc_id", "text", "qid", "qtext")
        .collect()
    }
    assert(err.getMessage.contains("empty corpus"))
    val blankQ = Seq((1L, "   ")).toDF("qid", "qtext")
    assert(Retrieval.bm25TopK(docs, blankQ, "doc_id", "text", "qid", "qtext")
      .count() == 0)
  }
}
