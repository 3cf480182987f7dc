package graft

import graft.text.Chunk

class ChunkSpec extends SparkSpec {
  import spark.implicits._

  test("chunkByTokens: short, exact-fit, and clipped-tail documents") {
    val df = Seq(
      (1L, "a b c"),                                  // 3 < 32 -> 1 chunk
      (2L, (1 to 32).map(i => s"t$i").mkString(" ")), // exact fit -> 1
      (3L, (1 to 33).map(i => s"t$i").mkString(" ")), // 33 -> 2 chunks
      (4L, (1 to 80).map(i => s"t$i").mkString(" "))  // 80 -> 3 chunks
    ).toDF("doc_id", "text")
    val out = Chunk.chunkByTokens(df, "doc_id", "text",
        chunkTokens = 32, overlapTokens = 8)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, String, Long)].collect()
    assert(out.count(_._1 == 1L) == 1 && out.count(_._2 == 0L) == 4)
    assert(out.count(_._1 == 2L) == 1)
    val d3 = out.filter(_._1 == 3L)
    assert(d3.length == 2)
    // stride 24: chunk 1 spans tokens 25..33 (9 tokens), sharing
    // tokens 25..32 with chunk 0's tail
    assert(d3(1)._3 == (25 to 33).map(i => s"t$i").mkString(" "))
    assert(d3(1)._4 == 9L)
    val d4 = out.filter(_._1 == 4L)
    assert(d4.map(_._4).toSeq == Seq(32L, 32L, 32L)) // 48+32 = 80 exact
    // every token appears in at least one chunk
    val covered = d4.flatMap(_._3.split(" ")).toSet
    assert(covered == (1 to 80).map(i => s"t$i").toSet)
  }

  test("blank and NULL text never produce phantom tokens or NULL counts") {
    val df = Seq((1L, Some("a b")), (2L, Some("   ")), (3L, None))
      .toDF("doc_id", "text")
    val chunks = graft.text.Chunk.chunkByTokens(df, "doc_id", "text",
        chunkTokens = 4, overlapTokens = 1)
      .orderBy("doc_id").as[(Long, Long, String, Long)].collect()
    // blank/NULL docs yield one EMPTY chunk (0 tokens), not [""]
    assert(chunks.toSeq == Seq((1L, 0L, "a b", 2L), (2L, 0L, "", 0L),
      (3L, 0L, "", 0L)))
    val spans = graft.text.Chunk.maskDuplicateSpans(df, "doc_id", "text",
        k = 2, minOccur = 2)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(spans.toSeq == Seq((1L, "a b", 2L, 0L), (2L, "", 0L, 0L),
      (3L, "", 0L, 0L)))
    // NULL text in line dedup: zero lines, zero removed — never NULL
    val ld = graft.text.Chunk.dedupLinesAcrossCorpus(df, "doc_id", "text",
        minDf = 2L).orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(ld(2) == ((3L, "", 0L, 0L)))
  }

  test("dedupLinesByDocFrac derives the threshold in-plan") {
    // 4 docs, frac 3/4 -> threshold 3: "nav bar" (3 docs) removed,
    // "rare line" (2 docs) kept
    val df = Seq((1L, "nav bar\nbody one"), (2L, "nav bar\nrare line"),
        (3L, "nav bar"), (4L, "rare line\nbody four"))
      .toDF("doc_id", "text")
    val out = graft.text.Chunk.dedupLinesByDocFrac(df, "doc_id", "text",
        num = 3, den = 4)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, "body one", 1L, 1L),
      (2L, "rare line", 1L, 1L), (3L, "", 0L, 1L),
      (4L, "rare line\nbody four", 2L, 0L)))
  }

  test("chunkByTokens rejects a degenerate overlap") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunk.chunkByTokens(df, "doc_id", "text",
        chunkTokens = 8, overlapTokens = 8)
    }
  }

  test("dedupLinesAcrossCorpus removes corpus-frequent lines, keeps order and blanks") {
    val df = Seq(
      (1L, "cookie banner\nreal content one\n\nunique tail"),
      (2L, "cookie banner\nreal content two"),
      (3L, "  cookie banner \nanother body"), // trim-normalized match
      (4L, "cookie banner")                   // fully boilerplate
    ).toDF("doc_id", "text")
    val out = Chunk.dedupLinesAcrossCorpus(df, "doc_id", "text", minDf = 3L)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    // "cookie banner" hits 4 of 4 docs -> removed everywhere; blank
    // line in doc 1 survives (blanks never count as boilerplate)
    assert(out(0) == ((1L, "real content one\n\nunique tail", 3L, 1L)))
    assert(out(1) == ((2L, "real content two", 1L, 1L)))
    assert(out(2) == ((3L, "another body", 1L, 1L)))
    // a fully-boilerplate doc stays, empty, rather than vanishing
    assert(out(3) == ((4L, "", 0L, 1L)))
  }

  test("maskDuplicateSpans cuts every occurrence of corpus-repeated k-grams") {
    val df = Seq(
      (1L, "x p q r y"),             // "p q r" repeats in doc 2
      (2L, "z p q r w"),
      (3L, "a b c d e f"),           // overlapping dups "b c d"+"c d e"
      (4L, "m b c d n c d e m2"),    //   -> one merged cut per island
      (5L, "q r"),                   // shorter than k: untouched
      (6L, "s t u v s t u")          // within-doc repeat counts too
    ).toDF("doc_id", "text")
    val out = graft.text.Chunk.maskDuplicateSpans(df, "doc_id", "text",
        k = 3, minOccur = 2)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(out(0) == ((1L, "x y", 2L, 3L)))
    assert(out(1) == ((2L, "z w", 2L, 3L)))
    // spans [2,4] and [3,5] merge to one [2,5] island
    assert(out(2) == ((3L, "a f", 2L, 4L)))
    assert(out(3) == ((4L, "m n m2", 3L, 6L)))
    assert(out(4) == ((5L, "q r", 2L, 0L)))
    assert(out(5) == ((6L, "v", 1L, 6L)))
  }

  test("dedupLinesAcrossCorpus below-threshold lines all survive") {
    val df = Seq((1L, "x\ny"), (2L, "x\nz")).toDF("doc_id", "text")
    val out = Chunk.dedupLinesAcrossCorpus(df, "doc_id", "text", minDf = 3L)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, "x\ny", 2L, 0L), (2L, "x\nz", 2L, 0L)))
  }
}
