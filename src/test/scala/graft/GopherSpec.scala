package graft

import org.apache.spark.sql.functions._
import graft.text.Quality
import graft.ml.Similarity

/** Gopher rule-table quality filter, the duplicated-n-gram repetition
  * signal, and embedding-space decontamination. */
class GopherSpec extends SparkSpec {
  import spark.implicits._

  private val good =
    ("good", Seq.fill(6)("the quick brown fox jumps over lazy dogs and cats")
      .mkString(" "))

  test("gopherRules: each rule fails in isolation") {
    val docs = Seq(
      good,                                                  // passes all
      ("short", "the dog and cat have fun"),                 // < minWords
      ("symbols", Seq.fill(60)("### word").mkString(" ")),   // symbol ratio
      ("bullets", Seq.fill(10)("- the bullet item of and that")
        .mkString("\n")),                                    // bullet frac
      ("ellipsis", Seq.fill(10)("the trailing thought of and that...")
        .mkString("\n")),                                    // ellipsis frac
      ("numeric", Seq.fill(60)("12345 67890").mkString(" ")),// alpha frac
      ("nostop", Seq.fill(60)("lorem ipsum dolor").mkString(" ")), // stops
      ("empty", "")
    ).toDF("doc_id", "text")
    val r = Quality.gopherRules(docs, "doc_id", "text",
      minWords = 30, maxWords = 1000, maxBulletFrac = 0.5,
      maxEllipsisFrac = 0.3, minStopHits = 2)
      .collect().map(x => x.getString(0) -> x.getBoolean(8)).toMap
    assert(r("good"), "the clean doc must pass every rule")
    assert(!r("short") && !r("symbols") && !r("bullets") &&
      !r("ellipsis") && !r("numeric") && !r("nostop") && !r("empty"))
  }

  test("gopherRules: signal columns are exact on a hand-computed doc") {
    val docs = Seq(("d", "the cat sat on the mat")).toDF("doc_id", "text")
    val row = Quality.gopherRules(docs, "doc_id", "text").head()
    assert(row.getInt(1) == 6)                       // n_words
    assert(row.getDouble(2) == 2.833333333)          // mean_word_len (17/6 round-9)
    assert(row.getDouble(3) == 0.0)                  // symbol_ratio
    assert(row.getDouble(6) == 1.0)                  // alpha_frac
    assert(row.getInt(7) == 1)                       // n_stop: only "the"
  }

  test("dupNgramCharFrac: positional coverage counts overlapped tokens once") {
    // "a b a b c": bigrams (a b)@1 (b a)@2 (a b)@3 (b c)@4 — "a b" is
    // duplicated, covering positions {1,2} ∪ {3,4}; chars 4 of 5.
    val docs = Seq(
      (1L, "a b a b c"),
      (2L, "all tokens unique here now"),
      (3L, "x x x"), // bigram "x x" @1 @2 → covers all 3 positions
      (4L, "")
    ).toDF("doc_id", "text")
    val r = Quality.dupNgramCharFrac(docs, "doc_id", "text", n = 2)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(1L) == ((5L, 4L, 0.8)))
    assert(r(2L) == ((22L, 0L, 0.0)))
    assert(r(3L) == ((3L, 3L, 1.0)))
    assert(r(4L) == ((0L, 0L, 0.0)))
  }

  test("topNgramCharFrac: overlapping occurrences count in full, ties " +
      "break lexicographically, short docs survive") {
    val docs = Seq(
      (1L, "a a a a"),      // top bigram "a a" occurs 3× overlapping:
                            // 3 × 2 chars / 4 chars = 1.5 — NOT clamped
      (2L, "x y x y z"),    // "x y" ×2 beats the singletons
      (3L, "p q"),          // exactly n tokens: one gram, full coverage
      (4L, "")
    ).toDF("doc_id", "text")
    val r = graft.text.Quality.topNgramCharFrac(docs, "doc_id", "text", n = 2)
      .collect().map(x => x.getLong(0) ->
        (x.getString(1), x.getLong(2), x.getDouble(3))).toMap
    assert(r(1L) == (("a a", 3L, 1.5)))
    assert(r(2L) == (("x y", 2L, 4.0 / 5.0)))
    assert(r(3L) == (("p q", 1L, 1.0)))
    assert(r(4L) == (("", 0L, 0.0)))
  }

  test("dupNgramCharFrac: n larger than the doc leaves it untouched") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val row = Quality.dupNgramCharFrac(docs, "doc_id", "text", n = 5).head()
    assert(row.getLong(1) == 3L && row.getLong(2) == 0L &&
      row.getDouble(3) == 0.0)
  }

  private def vec(deg: Double): Seq[Float] = {
    val r = math.toRadians(deg)
    Seq(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  test("semanticDecontam flags planted eval copies and near-paraphrases") {
    val train = Seq((1L, vec(0)), (2L, vec(10)), (3L, vec(90)))
      .toDF("vec_id", "embedding")
    // eval holds an exact copy of train 1; train 2 (10°) is a
    // near-paraphrase (cos ≈ 0.985); train 3 (90°) is orthogonal.
    val eval = Seq((100L, vec(0))).toDF("eval_id", "embedding")
    val r = Similarity.semanticDecontam(train, eval,
        "vec_id", "embedding", "embedding", threshold = 0.95)
      .select("vec_id", "contaminated")
      .collect().map(x => x.getLong(0) -> x.getBoolean(1)).toMap
    assert(r == Map(1L -> true, 2L -> true, 3L -> false))
    val kept = Similarity.dropContaminatedVectors(train, eval,
        "vec_id", "embedding", "embedding", threshold = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(3L))
  }

  test("semanticDecontam: empty eval set contaminates nothing") {
    val train = Seq((1L, vec(0))).toDF("vec_id", "embedding")
    val eval = Seq.empty[(Long, Seq[Float])].toDF("eval_id", "embedding")
    val r = Similarity.semanticDecontam(train, eval,
      "vec_id", "embedding", "embedding", threshold = 0.5).head()
    assert(r.isNullAt(r.fieldIndex("max_eval_cos")))
    assert(!r.getBoolean(r.fieldIndex("contaminated")))
  }

  test("semanticDecontam plan: eval side broadcasts, max is partial") {
    val e = graft.core.Tables.embeddings(spark, sf)
    val plan = Similarity.semanticDecontam(
      e.filter(col("vec_id") % 20 =!= 0), e.filter(col("vec_id") % 20 === 0),
      "vec_id", "embedding", "embedding", 0.3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"eval side must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      "the expansion must never be a shuffled cartesian")
  }

  test("semanticDecontamKernel: bit-parity with the join path, plan is " +
      "join-free") {
    val e = graft.core.Tables.embeddings(spark, sf)
    val train = e.filter(col("vec_id") % 20 =!= 0)
    val eval = e.filter(col("vec_id") % 20 === 0)
    val viaJoin = Similarity.semanticDecontam(train, eval,
        "vec_id", "embedding", "embedding", 0.3)
      .select("vec_id", "max_eval_cos", "contaminated")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2)))
      .toMap
    val kern = Similarity.semanticDecontamKernel(train, eval,
      "vec_id", "embedding", "embedding", 0.3)
    val viaKernel = kern.select("vec_id", "max_eval_cos", "contaminated")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2)))
      .toMap
    assert(viaKernel == viaJoin, "kernel must replay the join math exactly")
    val plan = kern.queryExecution.executedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"the kernel screen must be one projection pass:\n$plan")
  }

  test("semanticDecontamKernel: empty eval set contaminates nothing") {
    import spark.implicits._
    val train = Seq((1L, vec(0))).toDF("vec_id", "embedding")
    val eval = Seq.empty[(Long, Seq[Float])].toDF("eval_id", "embedding")
    val r = Similarity.semanticDecontamKernel(train, eval,
      "vec_id", "embedding", "embedding", threshold = 0.5).head()
    assert(r.isNullAt(r.fieldIndex("max_eval_cos")))
    assert(!r.getBoolean(r.fieldIndex("contaminated")))
  }
}
