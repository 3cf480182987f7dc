package graft

import graft.text.Bpe

/** BPE trainer + tokenizer: the paper's classic fixture, merge-order
  * determinism, apply parity between the fit-time map and the
  * merge-rule fallback, and end-to-end tokenization. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // Sennrich et al. 2016 §3.2's corpus: low×5, lower×2, newest×6,
  // widest×3 — one row per occurrence so the fit counts for real
  private lazy val corpus = (
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
    Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
  ).zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "text")

  test("fit reproduces the paper's first merges on the classic corpus") {
    val model = Bpe.fit(corpus, "text", nMerges = 4)
    // pair counts round 1: (e,s)=9 from newest+widest is the unique
    // max; then (es,t)=9; then (est,</w>)=9; then (l,o)=7
    assert(model.merges.take(4) == Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o")))
  }

  test("fit is deterministic and merge count is honored") {
    val a = Bpe.fit(corpus, "text", nMerges = 8)
    val b = Bpe.fit(corpus, "text", nMerges = 8)
    assert(a.merges == b.merges)
    assert(a.merges.length == 8)
    assert(a.wordSegments == b.wordSegments)
  }

  test("segmentWord on an UNSEEN word matches greedy merge-rank order") {
    val model = Bpe.fit(corpus, "text", nMerges = 10)
    // 'lowest' never appears in the corpus: 'est</w>' and 'low' both
    // assemble from learned merges
    val segs = Bpe.segmentWord("lowest", model)
    assert(segs.last.endsWith(Bpe.Eow))
    assert(segs.contains("low") || segs.head.startsWith("lo"),
      s"unexpected segmentation $segs")
    assert(segs.mkString("") == "lowest" + Bpe.Eow)
    // every fit-time word round-trips through its own segmentation
    model.wordSegments.foreach { case (w, s) =>
      assert(s.mkString("") == w + Bpe.Eow, s"$w -> $s")
    }
  }

  test("tokenize: broadcast map + fallback, word order preserved, empty text survives") {
    val model = Bpe.fit(corpus, "text", nMerges = 10)
    val docs = Seq(
      (1L, "newest low"),
      (2L, "lowest newest"),   // first word unseen -> fallback path
      (3L, "")
    ).toDF("doc_id", "text")
    val out = Bpe.tokenize(docs, "doc_id", "text", model)
      .orderBy("doc_id").collect()
    val t1 = out(0).getSeq[String](1)
    assert(t1.mkString("") == "newest" + Bpe.Eow + "low" + Bpe.Eow)
    val t2 = out(1).getSeq[String](1)
    assert(t2.mkString("") == "lowest" + Bpe.Eow + "newest" + Bpe.Eow)
    // the unseen word's segments equal the driver-side fallback
    assert(t2.take(t2.length - model.wordSegments("newest").length) ==
      Bpe.segmentWord("lowest", model))
    assert(out(2).getSeq[String](1).isEmpty &&
      out(2).getInt(2) == 0)
  }

  test("rank-ordered GLOBAL replace application equals segmentWord's " +
      "priority application when rule components are created earlier") {
    // The bpe_encode oracle replays segmentation as per-rule global
    // string replaces in rank order. That is only equivalent to
    // segmentWord's lowest-rank-next application when every rule's
    // components come from strictly earlier rules (a real fit's
    // invariant) — this pins the equivalence on adversarial inputs:
    // repeated pairs, chain prefixes, eow merges, multi-occurrence.
    val merges = Seq(
      "a" -> "a", "t" -> "a", "ta" -> "b", "tab" -> "l",
      "b" -> "b", "aa" -> "b", "l" -> "</w>")
    val model = Bpe.BpeModel(merges, Map.empty)
    def viaReplaces(word: String): Seq[String] = {
      var s = word.map(c => s"·${c}·").mkString + "·</w>·"
      merges.foreach { case (a, b) =>
        s = s.replace(s"·${a}··${b}·", s"·${a + b}·")
      }
      s.stripPrefix("·").stripSuffix("·").split("··").toSeq
    }
    val words = Seq("aaaa", "aaaaa", "tabl", "tatab", "bb", "bbb",
      "taal", "l", "a", "ataba", "aataab")
    words.foreach { w =>
      assert(Bpe.segmentWord(w, model) == viaReplaces(w),
        s"divergence on '$w'")
    }
  }
}
