package graft

import graft.text.CorpusStats
import org.apache.spark.sql.functions._

/** Round-12: corpus-statistics diagnostics — Zipf fit, vocabulary
  * growth / Heaps fit, type-token ratio. */
class Batch36Spec extends SparkSpec {
  import spark.implicits._

  test("zipfFit: counts, ranks and the hand-replayed OLS") {
    // freqs 8,4,2,1 at ranks 1..4
    val text = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++
      Seq.fill(2)("c") ++ Seq("d")).mkString(" ")
    val out = CorpusStats.zipfFit(Seq((1L, text)).toDF("id", "text"), "text")
      .as[(Long, Long, Double, Double)].head()
    assert(out._1 === 4L && out._2 === 15L)
    val x = (1 to 4).map(r => math.log(r.toDouble))
    val y = Seq(8.0, 4.0, 2.0, 1.0).map(math.log)
    val n = 4.0
    val (sx, sy) = (x.sum, y.sum)
    val sxy = x.zip(y).map { case (a, b) => a * b }.sum
    val sxx = x.map(a => a * a).sum
    val slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    assert(out._3 === math.rint(slope * 1e6) / 1e6)
    assert(out._3 < 0) // frequency falls with rank
  }

  test("zipfFit/heapsFit: single point yields NULL fit, not NaN") {
    // one type -> one curve point -> OLS denominator 0; the family
    // convention is NULL-on-undefined
    val z = CorpusStats.zipfFit(Seq((1L, "a a a")).toDF("id", "text"), "text")
      .as[(Long, Long, Option[Double], Option[Double])].head()
    assert(z._1 === 1L && z._3.isEmpty && z._4.isEmpty)
    val h = CorpusStats.heapsFit(
        Seq((1L, "a a a")).toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Option[Double], Option[Double])].head()
    assert(h._1 === 1L && h._2.isEmpty && h._3.isEmpty)
  }

  test("zipfFit minFreq drops the hapax tail") {
    val text = "a a a b b c"
    val out = CorpusStats.zipfFit(Seq((1L, text)).toDF("id", "text"),
        "text", minFreq = 2L)
      .as[(Long, Long, Double, Double)].head()
    assert(out._1 === 2L && out._2 === 5L) // c dropped
  }

  test("vocabGrowth: hand-computed cumulative tokens and types") {
    val docs = Seq((0L, "a b"), (1L, "b c"), (2L, "a d d"))
      .toDF("doc_id", "text")
    val g = CorpusStats.vocabGrowth(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(g.toSeq === Seq((0L, 2L, 2L), (1L, 4L, 3L), (2L, 7L, 4L)))
  }

  test("vocabGrowth bucketed prefix sum is identical to the one-window form") {
    val rnd = new scala.util.Random(9)
    val vocab = (0 until 40).map(i => s"v$i")
    val docs = (0 until 120).map { i =>
      (i.toLong, Seq.fill(5 + rnd.nextInt(10))(
        vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    // bucketSize 7 forces many buckets with uneven boundaries
    val bucketed = CorpusStats.vocabGrowth(docs, "doc_id", "text",
        bucketSize = 7L)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    val oneBucket = CorpusStats.vocabGrowth(docs, "doc_id", "text",
        bucketSize = 1000000L)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(bucketed === oneBucket)
    // both cumulative series are monotone
    assert(bucketed.sliding(2).forall(p => p(0)._2 <= p(1)._2 &&
      p(0)._3 <= p(1)._3))
  }

  test("heapsFit: beta is exactly 1 when every token is new") {
    val docs = (0 until 20).map(i => (i.toLong, s"w${i}a w${i}b w${i}c"))
      .toDF("doc_id", "text")
    val f = CorpusStats.heapsFit(docs, "doc_id", "text")
      .as[(Long, Double, Double)].head()
    assert(f._1 === 20L)
    assert(f._2 === 1.0) // V = N exactly -> slope 1
    assert(f._3 === 0.0) // ln K = 0
  }

  test("heapsFit: repeated vocabulary gives sub-linear beta") {
    val rnd = new scala.util.Random(3)
    val vocab = (0 until 30).map(i => s"t$i")
    val docs = (0 until 50).map { i =>
      (i.toLong, Seq.fill(20)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val f = CorpusStats.heapsFit(docs, "doc_id", "text")
      .as[(Long, Double, Double)].head()
    assert(f._2 > 0.0 && f._2 < 0.7, s"beta ${f._2}")
  }

  test("typeTokenRatio per group, empty-text group kept with zero counts") {
    val docs = Seq(("s1", "a b a"), ("s1", "b c"), ("s2", "x x x x"),
      ("s3", "  ")).toDF("source", "text")
    val t = CorpusStats.typeTokenRatio(docs, "source", "text")
      .orderBy("source")
      .as[(String, Long, Long, Long, Option[Double])].collect()
    assert(t(0) === (("s1", 2L, 5L, 3L, Some(0.6))))
    assert(t(1) === (("s2", 1L, 4L, 1L, Some(0.25))))
    // empty-text group kept; its ttr is undefined (null), not 0
    assert(t(2)._1 === "s3" && t(2)._3 === 0L && t(2)._4 === 0L &&
      t(2)._5.isEmpty)
  }
}
