package graft

import org.apache.spark.sql.functions._
import graft.text.{C4, Chunk, LangModel, Snapshot}

/** Round-10 batch 6 edge cases: unigram-LM scoring (OOV slot, empty
  * docs, hand-computed smoothing), the C4 page cleaner (each line and
  * page rule in isolation), sentence-aligned chunking (boundary
  * semantics), and cross-snapshot dedup (exact + near-dup).
  */
class Batch25Spec extends SparkSpec {
  import spark.implicits._

  test("scoreByUnigram matches hand-computed add-0.5 smoothing with OOV") {
    val ref = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val docs = Seq((10L, "a b z"), (11L, "")).toDF("doc_id", "text")
    val out = LangModel.scoreByUnigram(docs, ref, "doc_id", "text", alpha = 0.5)
      .orderBy("doc").as[(Long, Long, Long, Double, Double)].collect()
    // counts: a=3 b=1 c=1; N=5, V=3, denom = 5 + 0.5*(3+1) = 7
    val m = (math.log(3.5 / 7) + math.log(1.5 / 7) + math.log(0.5 / 7)) / 3
    assert(out(0)._1 == 10L && out(0)._2 == 3L && out(0)._3 == 1L)
    assert(math.abs(out(0)._4 - m) < 1e-6)
    assert(math.abs(out(0)._5 - math.exp(-out(0)._4)) < 1e-5)
    // empty doc: the neutral empty product, not a dropped row
    assert(out(1) == ((11L, 0L, 0L, 0.0, 1.0)))
  }

  test("unigram OOV tokens score strictly below every seen token") {
    val ref = Seq((1L, "aa aa aa bb")).toDF("doc_id", "text")
    val docs = Seq((1L, "bb"), (2L, "zz")).toDF("doc_id", "text")
    val out = LangModel.scoreByUnigram(docs, ref, "doc_id", "text")
      .orderBy("doc").as[(Long, Long, Long, Double, Double)].collect()
    assert(out(0)._3 == 0L && out(1)._3 == 1L)
    assert(out(1)._4 < out(0)._4) // OOV mean log-prob below rare-seen
    assert(out(1)._5 > out(0)._5) // so its perplexity is higher
  }

  test("scoreByBigram covers all three smoothing branches by hand") {
    // ref bigrams: (a,b)x2, (b,a), (b,c) -> contexts a:2, b:2; V=|{b,a,c}|=3
    val ref = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val docs = Seq(
      (10L, "a b"),   // pair seen: ln((2+.5)/(2+.5*4))
      (11L, "a c"),   // context seen, pair unseen: ln(.5/(2+2))
      (12L, "z q"),   // context unseen: ln(.5/(0+2)) = uniform 1/(V+1)
      (13L, "solo")   // <2 tokens: neutral
    ).toDF("doc_id", "text")
    val out = graft.text.LangModel.scoreByBigram(docs, ref, "doc_id", "text")
      .orderBy("doc").as[(Long, Long, Long, Double, Double)].collect()
    assert(math.abs(out(0)._4 - math.log(2.5 / 4.0)) < 1e-6)
    assert(out(0)._3 == 0L)
    assert(math.abs(out(1)._4 - math.log(0.5 / 4.0)) < 1e-6)
    assert(out(1)._3 == 1L)
    assert(math.abs(out(2)._4 - math.log(0.5 / 2.0)) < 1e-6)
    assert(out(2)._3 == 1L)
    assert(out(3) == ((13L, 0L, 0L, 0.0, 1.0)))
    // bigram surprise orders the docs: seen pair < unseen pair
    assert(out(0)._5 < out(1)._5)
  }

  test("an empty reference corpus refuses to train, loudly") {
    val docs = Seq((1L, "some text")).toDF("doc_id", "text")
    val emptyRef = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val blankRef = Seq((1L, "   ")).toDF("doc_id", "text")
    for (ref <- Seq(emptyRef, blankRef)) {
      val e = intercept[IllegalArgumentException] {
        LangModel.scoreByUnigram(docs, ref, "doc_id", "text")
      }
      assert(e.getMessage.contains("no tokens"))
    }
  }

  test("c4Clean applies each line and page rule independently") {
    val docs = Seq(
      (1L, "Good line one here.\nshort.\nno terminal punct line\nAnother good line!"),
      (2L, "One fine line kept here.\nAnd lorem ipsum appears.\nThird good line stays."),
      (3L, "Brace poisons the page {x}.\nOther fine line here."),
      (4L, "Only one good sentence here.\nbad"),
      (5L, "Embedded javascript call here.\nFirst good line stays.\nSecond good line stays.")
    ).toDF("doc_id", "text")
    val out = C4.c4Clean(docs, "doc_id", "text").orderBy("doc_id")
      .as[(Long, String, Long, Long, Long, Boolean)].collect()
    // doc 1: short + unpunctuated lines drop; 2 sentences remain -> kept
    assert(out(0) == ((1L,
      "Good line one here.\nAnother good line!", 2L, 2L, 2L, true)))
    // doc 2: every line passes the LINE rules, but the page has
    // "lorem ipsum" -> kept=false with the cleaned text still audited
    assert(out(1)._3 == 3L && !out(1)._6)
    // doc 3: "{" page rule
    assert(!out(2)._6)
    // doc 4: only 1 sentence survives -> below minSentences
    assert(out(3) == ((4L, "Only one good sentence here.", 1L, 1L, 1L, false)))
    // doc 5: the javascript LINE drops, the doc survives on the rest
    assert(out(4) == ((5L,
      "First good line stays.\nSecond good line stays.", 2L, 1L, 2L, true)))
  }

  test("c4Clean: NULL text surfaces as an empty rejected page") {
    val docs = Seq((1L, Some("Fine line number one.\nFine line number two.")),
      (2L, None)).toDF("doc_id", "text")
    val out = C4.c4Clean(docs, "doc_id", "text").orderBy("doc_id")
      .as[(Long, String, Long, Long, Long, Boolean)].collect()
    assert(out(0)._6)
    assert(out(1) == ((2L, "", 0L, 0L, 0L, false)))
  }

  test("chunkBySentences: a sentence belongs to the chunk of its first token") {
    val docs = Seq(
      (1L, "s1 has five tokens here. s2 three tokens. s3 has four tokens.")
    ).toDF("doc_id", "text")
    val out = Chunk.chunkBySentences(docs, "doc_id", "text", budgetTokens = 6)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, String, Long, Long)].collect()
    // sentence starts at cumulative 0, 5, 8 -> chunks 0, 0, 1: the
    // second sentence CROSSES the budget but started inside chunk 0
    assert(out.toSeq == Seq(
      (1L, 0L, "s1 has five tokens here. s2 three tokens.", 2L, 8L),
      (1L, 1L, "s3 has four tokens.", 1L, 4L)))
  }

  test("chunkBySentences: oversized sentences and empty docs stay whole") {
    val docs = Seq((1L, "one two three four five six seven eight"),
      (2L, "")).toDF("doc_id", "text")
    val out = Chunk.chunkBySentences(docs, "doc_id", "text", budgetTokens = 3)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, String, Long, Long)].collect()
    // 8 tokens, no sentence boundary: ONE chunk (integrity beats budget)
    assert(out(0) == ((1L, 0L,
      "one two three four five six seven eight", 1L, 8L)))
    assert(out(1) == ((2L, 0L, "", 1L, 0L)))
  }

  test("dropSeenDocs removes exact content matches only") {
    val ref = Seq((1L, "seen text"), (2L, "other seen")).toDF("id", "text")
    val fresh = Seq((10L, "seen text"), (11L, "brand new text"))
      .toDF("id", "text")
    val out = Snapshot.dropSeenDocs(fresh, ref, "text")
      .orderBy("id").as[(Long, String)].collect()
    assert(out.toSeq == Seq((11L, "brand new text")))
  }

  test("cross-corpus near-dup pairs find perturbed twins in both hash families") {
    val mk = (i: Long, t: String) => (i, t)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val ref = Seq(mk(1L, base), mk(2L, "totally different words " +
      "about completely unrelated subject matter entirely elsewhere"))
      .toDF("doc_id", "text")
    val fresh = Seq(mk(10L, base.stripPrefix("alpha ")),
      mk(11L, "nothing here resembles any reference document at all " +
        "in any shingle window whatsoever")).toDF("doc_id", "text")
    for (portable <- Seq(false, true)) {
      val pairs = Snapshot.crossCorpusNearDupPairs(fresh, ref,
          "doc_id", "text", threshold = 0.5, portable = portable)
        .select("id_new", "id_ref").as[(Long, Long)].collect().toSet
      assert(pairs == Set((10L, 1L)), s"portable=$portable")
    }
    val kept = Snapshot.dropSeenNearDups(fresh, ref, "doc_id", "text",
        threshold = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L))
  }

  test("weightedSampleWithoutReplacement: heavy weights dominate, zero/null never sample") {
    val df = ((1L to 10L).map(i => (i, 100.0)) ++
      (11L to 60L).map(i => (i, 0.5)) ++
      Seq((61L, 0.0), (62L, -3.0))).toDF("id", "w")
      .union(Seq((63L, Option.empty[Double])).toDF("id", "w"))
    val got = graft.rel.Sampling.weightedSampleWithoutReplacement(
        df, "id", "w", n = 12, seed = 5L)
      .select("id").as[Long].collect().toSet
    assert(got.size == 12)
    // all ten heavy rows make a 12-row sample with 200:1 odds each
    assert((1L to 10L).toSet.subsetOf(got), s"heavy rows missing: $got")
    assert(!got.contains(61L) && !got.contains(62L) && !got.contains(63L))
    val again = graft.rel.Sampling.weightedSampleWithoutReplacement(
        df, "id", "w", n = 12, seed = 5L)
      .select("id").as[Long].collect().toSet
    assert(again == got)
  }

  test("selectByImportance up-samples target-like documents") {
    // target corpus speaks alpha; raw corpus is balanced. Candidates:
    // 30 alpha docs, 30 beta docs -> the likelihood ratio should pull
    // the selection overwhelmingly to alpha.
    val target = (1 to 20).map(i => (i.toLong, "alpha alpha alpha common"))
      .toDF("doc_id", "text")
    val cands = ((100 to 129).map(i => (i.toLong, "alpha alpha common word")) ++
      (200 to 229).map(i => (i.toLong, "beta beta common word")))
      .toDF("doc_id", "text")
    val raw = cands
    val sel = graft.text.LangModel.selectByImportance(cands, target, raw,
        "doc_id", "text", n = 20, alpha = 0.5, seed = 3L)
      .select("doc_id").as[Long].collect()
    val alphaShare = sel.count(_ < 200).toDouble / sel.length
    assert(sel.length == 20)
    assert(alphaShare >= 0.9, s"alpha share $alphaShare of ${sel.length}")
  }
}
