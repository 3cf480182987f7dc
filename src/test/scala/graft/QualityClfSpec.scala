package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.ml.QualityClassifier

case class QDoc(doc_id: Long, text: String)

/** Trained quality classifier: hashed n-gram featurization, the
  * fit/deploy split, determinism of the fit, and parity of the three
  * scoring paths (relational batch, literal-expression, streaming). */
class QualityClfSpec extends SparkSpec {
  import spark.implicits._

  private val labeled = {
    // separable synthetic corpus: "good" pages share a clean
    // vocabulary, "spam" pages share another; 12 docs is plenty for a
    // 1024-bucket hash space to keep the two vocabularies disjoint
    val good = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a clear concise well written article about science",
      "this essay explains the method with careful detail",
      "readers praised the thoughtful clear explanation",
      "a well structured report with clear conclusions",
      "careful analysis and thoughtful writing throughout")
    val spam = Seq(
      "buy cheap pills now click here free offer",
      "winner winner claim your free prize now click",
      "cheap cheap cheap discount offer click now",
      "free money fast click this link now offer",
      "claim prize now cheap offer click free pills",
      "discount pills free offer winner click here")
    (good.map((_, 1.0)) ++ spam.map((_, 0.0))).zipWithIndex
      .map { case ((t, y), i) => (i.toLong, t, y) }
      .toDF("doc_id", "text", "label")
  }

  test("termsOf emits unigrams plus adjacent bigrams; short arrays are safe") {
    val got = Seq(Tuple1(Seq("a", "b", "c")), Tuple1(Seq("x")),
        Tuple1(Seq.empty[String]))
      .toDF("t").select(QualityClassifier.termsOf(col("t")).as("terms"))
      .as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("a", "b", "c", "a_b", "b_c"))
    assert(got(1) == Seq("x"))
    assert(got(2) == Seq.empty[String])
  }

  test("fit separates the synthetic corpus and scores it correctly") {
    val w = QualityClassifier.fit(labeled, "doc_id", "text", "label",
      numFeatures = 1024, maxIter = 50)
    val scored = QualityClassifier.score(labeled, "doc_id", "text", w, 1024)
      .join(labeled.select(col("doc_id").as("doc"), col("label").as("y")),
        Seq("doc"))
    val acc = scored.filter(col("label") === col("y").cast("int")).count() /
      scored.count().toDouble
    assert(acc == 1.0, s"expected perfect separation on 12 docs, got $acc")
  }

  test("fit is deterministic: two fits produce identical artifacts") {
    def artifact() = QualityClassifier
      .fit(labeled, "doc_id", "text", "label", numFeatures = 512)
      .orderBy("feature").as[(Long, Double)].collect().toSeq
    assert(artifact() == artifact())
  }

  test("expression path matches the relational scorer on round-6 margins") {
    val w = QualityClassifier.fit(labeled, "doc_id", "text", "label",
      numFeatures = 1024)
    val batch = QualityClassifier.score(labeled, "doc_id", "text", w, 1024)
      .select("doc", "margin").as[(Long, Double)].collect().toMap
    val (wmap, b0) = QualityClassifier.weightsMap(w)
    val expr = labeled.select(col("doc_id").as("doc"),
        QualityClassifier.marginExpr(
          graft.text.TextFns.tokens(lower(col("text"))), wmap, b0, 1024)
          .as("margin"))
      .as[(Long, Double)].collect().toMap
    assert(expr == batch)
  }

  test("weights round-trip the Catalog and STREAMED scores match batch") {
    implicit val sqlCtx = spark.sqlContext
    val wh = java.nio.file.Files.createTempDirectory("qclf").toString
    val cat = new graft.io.Catalog(spark, wh)
    cat.save("quality_clf",
      QualityClassifier.fit(labeled, "doc_id", "text", "label", 1024))
    val reloaded = cat.table("quality_clf")
    val batch = QualityClassifier
      .score(labeled, "doc_id", "text", reloaded, 1024)
      .select("doc", "margin", "score", "label")
      .as[(Long, Double, Double, Int)].collect().toSet
    // real streaming run: the scorer is a stateless projection, so
    // append mode needs no watermark and every row emits exactly once
    val in = MemoryStream[QDoc]
    val q = graft.stream.Streaming
      .qualityStreamScores(in.toDF(), reloaded, "doc_id", "text", 1024)
      .writeStream.format("memory").queryName("qclf")
      .outputMode(OutputMode.Append).start()
    in.addData(labeled.select("doc_id", "text").as[(Long, String)]
      .collect().toSeq.map { case (i, t) => QDoc(i, t) }: _*)
    q.processAllAvailable()
    val streamed = spark.table("qclf")
      .as[(Long, Double, Double, Int)].collect().toSet
    q.stop()
    assert(streamed == batch)
  }

  test("fit works at a fastText-scale hash space (2^17 buckets)") {
    // sparse assembly: a dense array per doc would be 1 MB/doc here
    val w = QualityClassifier.fit(labeled, "doc_id", "text", "label",
      numFeatures = 1 << 17, maxIter = 30)
    val scored = QualityClassifier
      .score(labeled, "doc_id", "text", w, 1 << 17)
      .join(labeled.select(col("doc_id").as("doc"), col("label").as("y")),
        Seq("doc"))
    val acc = scored.filter(col("label") === col("y").cast("int")).count() /
      scored.count().toDouble
    assert(acc == 1.0, s"2^17-bucket separation accuracy $acc")
  }

  test("xxhash64 hash family fits and scores like the md5 family") {
    val w = QualityClassifier.fit(labeled, "doc_id", "text", "label",
      numFeatures = 1024, portableHash = false)
    val scored = QualityClassifier.score(labeled, "doc_id", "text", w, 1024,
        portableHash = false)
      .join(labeled.select(col("doc_id").as("doc"), col("label").as("y")),
        Seq("doc"))
    val acc = scored.filter(col("label") === col("y").cast("int")).count() /
      scored.count().toDouble
    assert(acc == 1.0, s"xxhash family separation accuracy $acc")
  }

  test("docs with no tokens stay in the output at the bare intercept") {
    val w = Seq((0L, 0.25), (-1L, 0.125)).toDF("feature", "weight")
    val docs = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val got = QualityClassifier.score(docs, "doc_id", "text", w, 16)
      .select("doc", "margin").as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 0.125, 2L -> 0.125))
  }
}
