package graft

import graft.text.EvalMetrics
import org.apache.spark.sql.functions.col

/** Round-12 continuation: chrF — hand-computed char-n-gram F-scores
  * (Popović 2015) and the whitespace/empty/short-doc conventions. */
class Batch33Spec extends SparkSpec {
  import spark.implicits._

  private def chrf(cand: Seq[(Long, String)], ref: Seq[(Long, String)],
                   maxN: Int, beta: Double = 2.0) =
    EvalMetrics.chrF(cand.toDF("id", "text"), ref.toDF("id", "text"),
        "id", "text", "text", maxN, beta)
      .orderBy("doc").as[(Long, Double, Double, Double)].collect()

  test("chrF is 1.0 on identical strings and whitespace-insensitive") {
    val out = chrf(Seq((1L, "a b c"), (2L, "spark")),
      Seq((1L, "abc"), (2L, "spark")), maxN = 3)
    assert(out(0) === ((1L, 1.0, 1.0, 1.0))) // "abc" == stripped "a b c"
    assert(out(1) === ((2L, 1.0, 1.0, 1.0)))
  }

  test("chrF matches the hand-computed clipped overlap") {
    // cand "abcd" vs ref "abce", maxN = 2:
    //  1-grams: {a,b,c,d} vs {a,b,c,e} -> m=3, ct=rt=4 -> p1=r1=0.75
    //  2-grams: {ab,bc,cd} vs {ab,bc,ce} -> m=2, ct=rt=3
    //    -> p2=r2=round(2/3)=0.666667
    //  P = R = round((0.75+0.666667)/2, 6) = 0.708334 (HALF_UP)
    //  F2 = 5PR/(4P+R) = P when P == R
    val out = chrf(Seq((1L, "abcd")), Seq((1L, "abce")), maxN = 2)
    assert(out(0) === ((1L, 0.708334, 0.708334, 0.708334)))
  }

  test("chrF asymmetry: precision and recall split when lengths differ") {
    // cand "aa" vs ref "aaaa", maxN = 1: cand 1-grams {a:2}, ref {a:4}
    //  m = min(2,4) = 2, ct = 2, rt = 4 -> p1 = 1.0, r1 = 0.5
    //  F2 = 5*1*0.5 / (4*1 + 0.5) = 2.5/4.5 = 0.555556
    val out = chrf(Seq((1L, "aa")), Seq((1L, "aaaa")), maxN = 1)
    assert(out(0)._2 === 1.0 && out(0)._3 === 0.5)
    assert(out(0)._4 === math.rint(2.5 / 4.5 * 1e6) / 1e6 ||
      out(0)._4 === 0.555556)
  }

  test("chrF conventions: empty/missing reference, orders beyond length") {
    val out = chrf(
      Seq((1L, "abc"), (2L, "abc"), (3L, "ab")),
      Seq((1L, ""), (3L, "ab")), // doc 2 has NO reference row
      maxN = 3)
    // empty and missing references score 0 everywhere
    assert(out(0) === ((1L, 0.0, 0.0, 0.0)))
    assert(out(1) === ((2L, 0.0, 0.0, 0.0)))
    // doc 3: orders 1..2 perfect, order 3 has no grams on either side
    // and contributes 0 to both means -> P = R = round(2/3) of 1.0
    assert(out(2)._2 === 0.666667 && out(2)._3 === 0.666667)
    assert(out(2)._4 === 0.666667) // F == P when P == R
  }

  test("chrF agrees with a driver-side golden on random strings") {
    val rng = new scala.util.Random(7)
    def golden(c: String, r: String, maxN: Int): (Double, Double, Double) = {
      def grams(s: String, n: Int) =
        (0 to s.length - n).map(i => s.substring(i, i + n))
          .groupBy(identity).map { case (k, v) => k -> v.size }
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      // the same exact integer micro-unit arithmetic as the operator
      def micro(m: Long, d: Long): Long =
        if (d > 0) (2L * m * 1000000L + d) / (2L * d) else 0L
      val pr = (1 to maxN).map { n =>
        val cg = grams(c.toLowerCase.replaceAll("\\s+", ""), n)
        val rg = grams(r.toLowerCase.replaceAll("\\s+", ""), n)
        val m = cg.map { case (g, cc) => math.min(cc, rg.getOrElse(g, 0)) }
          .sum.toLong
        val ct = cg.values.sum.toLong; val rt = rg.values.sum.toLong
        (micro(m, ct), micro(m, rt))
      }
      val p = ((2L * pr.map(_._1).sum + maxN) / (2L * maxN)).toDouble / 1e6
      val rr = ((2L * pr.map(_._2).sum + maxN) / (2L * maxN)).toDouble / 1e6
      val f = if (4.0 * p + rr > 0) r6(5.0 * p * rr / (4.0 * p + rr)) else 0.0
      (p, rr, f)
    }
    val docs = (0L until 40L).map { i =>
      val alpha = "abcab "
      (i, (0 until 3 + rng.nextInt(20)).map(_ =>
        alpha(rng.nextInt(alpha.length))).mkString)
    }
    val refs = docs.map { case (i, s) => (i, s.drop(rng.nextInt(3))) }
    val out = chrf(docs, refs, maxN = 6)
    val gold = docs.sortBy(_._1).zip(refs.sortBy(_._1)).map {
      case ((_, c), (_, r)) => golden(c, r, 6)
    }
    out.zip(gold).foreach { case ((id, p, r, f), (gp, gr, gf)) =>
      assert(math.abs(p - gp) < 2e-6 && math.abs(r - gr) < 2e-6 &&
        math.abs(f - gf) < 2e-6, s"doc $id: ($p,$r,$f) vs ($gp,$gr,$gf)")
    }
  }

  test("evalSuite equals rougeN + corpusBleu run separately") {
    val cand = Seq((1L, "the cat sat on the mat"), (2L, "a b c d e"),
      (3L, "x y"), (4L, "")).toDF("doc_id", "text")
    val ref = Seq((1L, "the cat sat on a mat"), (2L, "a b c d e f"),
      (3L, "y x"), (4L, "z")).toDF("doc_id", "text")
    val (rouge, bleu) = graft.text.EvalMetrics.evalSuite(cand, ref,
      "doc_id", "text", "text", bleuMaxN = 4, rougeMaxN = 2)
    val rougeSep = graft.text.EvalMetrics.rougeN(cand, ref, "doc_id",
      "text", "text", maxN = 2)
    val bleuSep = graft.text.EvalMetrics.corpusBleu(cand, ref, "doc_id",
      "text", "text", maxN = 4)
    assert(rouge.orderBy("doc").collect().toSeq ===
      rougeSep.orderBy("doc").collect().toSeq)
    assert(bleu.collect().toSeq === bleuSep.collect().toSeq)
    // non-degenerate: the shared table really served both faces
    assert(bleu.head().getDouble(0) > 0.0)
    assert(rouge.filter(col("rouge_1") > 0).count() >= 3)
  }

  test("local, shuffle and hashed-gram kernels agree on real data") {
    val cand = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
    val ref = cand.select(col("doc_id"),
      org.apache.spark.sql.functions.regexp_replace(
        col("text"), "^\\S+\\s+", "").as("text"))
    def rouge(kernel: String, hashed: Boolean) =
      graft.text.EvalMetrics.rougeN(cand, ref, "doc_id", "text", "text",
        maxN = 2, kernel = kernel, hashGrams = hashed)
        .orderBy("doc").collect().toSeq
    val rLocal = rouge("local", hashed = true)
    assert(rLocal === rouge("shuffle", hashed = true))
    assert(rLocal === rouge("shuffle", hashed = false))
    def bleu(kernel: String, hashed: Boolean) =
      graft.text.EvalMetrics.corpusBleu(cand, ref, "doc_id", "text",
        "text", maxN = 4, kernel = kernel, hashGrams = hashed)
        .collect().toSeq
    val bLocal = bleu("local", hashed = true)
    assert(bLocal === bleu("shuffle", hashed = true))
    assert(bLocal === bleu("shuffle", hashed = false))
    def chrfK(kernel: String) =
      graft.text.EvalMetrics.chrF(cand, ref, "doc_id", "text", "text",
        maxN = 4, kernel = kernel).orderBy("doc").collect().toSeq
    assert(chrfK("local") === chrfK("shuffle"))
  }

  test("Gopher repetition kernels: local equals shuffle, edges included") {
    val docs = (Seq(
      (1L, "a b c a b c a b"),  // dup 2-grams cover most positions
      (2L, "x y z w"),          // no repeated 2-gram
      (3L, "t t t t"),          // one gram repeated everywhere
      (4L, "solo"),             // fewer tokens than n
      (5L, "")                  // empty
    ) ++ (6L to 60L).map(i => (i, s"w$i q${i % 7} e${i % 3} q${i % 7} " +
      s"e${i % 3} q${i % 7} r${i % 11}"))).toDF("doc_id", "text")
    val dl = graft.text.Quality.dupNgramCharFrac(docs, "doc_id", "text",
      n = 2, minOccur = 2, kernel = "local").orderBy("doc_id").collect().toSeq
    val ds = graft.text.Quality.dupNgramCharFrac(docs, "doc_id", "text",
      n = 2, minOccur = 2, kernel = "shuffle").orderBy("doc_id").collect().toSeq
    assert(dl === ds)
    val tl = graft.text.Quality.topNgramCharFrac(docs, "doc_id", "text",
      n = 2, kernel = "local").orderBy("doc_id").collect().toSeq
    val ts = graft.text.Quality.topNgramCharFrac(docs, "doc_id", "text",
      n = 2, kernel = "shuffle").orderBy("doc_id").collect().toSeq
    assert(tl === ts)
    // and on the real corpus with the entry parameterization
    val real = spark.read.parquet(s"$sf/documents.parquet")
    val rl = graft.text.Quality.dupNgramCharFrac(real, "doc_id", "text",
      n = 2, minOccur = 2, kernel = "local").orderBy("doc_id").collect().toSeq
    val rs = graft.text.Quality.dupNgramCharFrac(real, "doc_id", "text",
      n = 2, minOccur = 2, kernel = "shuffle").orderBy("doc_id").collect().toSeq
    assert(rl === rs)
    val ql = graft.text.Quality.topNgramCharFrac(real, "doc_id", "text",
      n = 3, kernel = "local").orderBy("doc_id").collect().toSeq
    val qs = graft.text.Quality.topNgramCharFrac(real, "doc_id", "text",
      n = 3, kernel = "shuffle").orderBy("doc_id").collect().toSeq
    assert(ql === qs)
    val pl = graft.text.Quality.repetitionStats(docs, "doc_id", "text",
      kernel = "local").orderBy("doc_id").collect().toSeq
    val ps = graft.text.Quality.repetitionStats(docs, "doc_id", "text",
      kernel = "shuffle").orderBy("doc_id").collect().toSeq
    assert(pl === ps)
    val el = graft.text.Quality.repetitionStats(real, "doc_id", "text",
      kernel = "local").orderBy("doc_id").collect().toSeq
    val es = graft.text.Quality.repetitionStats(real, "doc_id", "text",
      kernel = "shuffle").orderBy("doc_id").collect().toSeq
    assert(el === es)
  }

  test("extractiveSummary: local kernel equals the relational kernel") {
    val docs = (Seq(
      (1L, "spark is fast. spark is very fast! the cat sat? done"),
      (2L, "a b. a b. a b."),        // identical sentences, tie on score
      (3L, "x"),                      // one sentence, one short token
      (4L, ""),                       // empty -> dropped by both
      (5L, "  .  !  ")                // only empty sentences -> dropped
    ) ++ (6L to 40L).map(i =>
      (i, s"w$i row${i % 5} scan. merge w$i table! row${i % 5} scan " +
        s"row${i % 5}? the end of doc $i."))).toDF("doc_id", "text")
    val l = graft.text.Keywords.extractiveSummary(docs, "doc_id", "text",
      kernel = "local").orderBy("doc").collect().toSeq
    val s = graft.text.Keywords.extractiveSummary(docs, "doc_id", "text",
      kernel = "shuffle").orderBy("doc").collect().toSeq
    assert(l === s)
    val real = spark.read.parquet(s"$sf/documents.parquet")
    val rl = graft.text.Keywords.extractiveSummary(real, "doc_id", "text",
      kernel = "local").orderBy("doc").collect().toSeq
    val rs = graft.text.Keywords.extractiveSummary(real, "doc_id", "text",
      kernel = "shuffle").orderBy("doc").collect().toSeq
    assert(rl.nonEmpty && rl === rs)
  }

  test("qaEval matches hand-computed EM and token F1") {
    val cand = Seq(
      (1L, "The CAT, sat!"),      // == ref after normalization -> em 1
      (2L, "a b c d"),            // half overlap with "c d e f"
      (3L, "x y"),                // no reference row
      (4L, ""),                   // both empty -> em 1, f1 0
      (5L, "q w")                 // empty ref, nonempty cand
    ).toDF("doc_id", "text")
    val ref = Seq((1L, "the cat sat"), (2L, "c d e f"), (4L, ""),
      (5L, "")).toDF("doc_id", "text")
    val out = graft.text.EvalMetrics.qaEval(cand, ref, "doc_id",
        "text", "text")
      .orderBy("doc").as[(Long, Int, Double)].collect()
    assert(out(0) === ((1L, 1, 1.0)))
    // doc 2: m=2, P=R=0.5 -> f1 = 2*.25/1 = 0.5
    assert(out(1) === ((2L, 0, 0.5)))
    assert(out(2) === ((3L, 0, 0.0))) // missing ref
    assert(out(3) === ((4L, 1, 0.0))) // both empty: EM by convention
    assert(out(4) === ((5L, 0, 0.0)))
  }

  test("eval metrics ride the fluent surface") {
    import graft.core.GfFrame._
    val cand = Seq((1L, "a b c d"), (2L, "x y")).toDF("doc_id", "text")
    val ref = Seq((1L, "a b c e"), (2L, "x y")).toDF("doc_id", "text")
    assert(cand.graft.rougeN(ref, "doc_id", "text", "text")
      .result.count() === 2)
    assert(cand.graft.rougeL(ref, "doc_id", "text", "text")
      .result.count() === 2)
    assert(cand.graft.corpusBleu(ref, "doc_id", "text", "text")
      .result.count() === 1)
    // maxN = 2: "xy" has no order-3+ grams, and the fixed-total
    // convention would dilute the identical doc below 1 at maxN = 6
    val f = cand.graft.chrF(ref, "doc_id", "text", "text", maxN = 2)
      .result.orderBy("doc").collect()
    assert(f(1).getDouble(3) === 1.0) // identical doc scores chrF 1
    // single-char tokens fall under minTokenLen — summarize real words
    val prose = Seq((1L, "spark is fast. joins shuffle data."),
      (2L, "one sentence only here")).toDF("doc_id", "text")
    assert(prose.graft.extractiveSummary("doc_id", "text")
      .result.count() === 2)
  }

  test("chrf_doc entry runs and scores the dropped-word twin below 1") {
    val out = SparkEntry.queries("chrf_doc")(spark, sf)
    val rows = out.as[(Long, Double, Double, Double)].collect()
    assert(rows.length === 500)
    // recall vs a strict-substring reference is 1-bounded but the
    // offset shift keeps precision < 1 on real multi-word docs
    assert(rows.forall(r => r._2 >= 0 && r._2 <= 1 && r._4 >= 0 && r._4 <= 1))
    assert(rows.count(_._4 > 0.5) > 400) // twin is mostly-identical text
    assert(rows.exists(_._4 < 1.0))
  }
}
