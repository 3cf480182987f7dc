package graft

import org.apache.spark.sql.functions._

import graft.text.{Decontaminate, Redact}

class Batch19Spec extends SparkSpec {
  import spark.implicits._

  test("redactPii replaces all four categories, in order, repeatedly") {
    val df = Seq(
      (1L, "write a@b.io or c.d-e@sub.example.org twice a@b.io"),
      (2L, "fetch https://x.io/p?q=a@b.c then http://y.z/2"),
      (3L, "host 192.168.0.1 dials +1 555-0100 and 555 01 0042"),
      (4L, "clean text, no pii at all; 1+2=3 and v1.2 stay")).toDF("id", "text")
    val out = Redact.redactDocuments(df, "text").orderBy("id").collect()
    assert(out(0).getAs[String]("text_redacted") ==
      "write [EMAIL] or [EMAIL] twice [EMAIL]")
    assert(out(0).getAs[Long]("n_email") == 3L)
    // the URL swallows the embedded '@' — email count on raw text sees
    // it, but the redaction (URL first) must not leave an [EMAIL] crumb
    assert(out(1).getAs[String]("text_redacted") ==
      "fetch [URL] then [URL]")
    assert(out(1).getAs[Long]("n_url") == 2L)
    assert(out(2).getAs[String]("text_redacted") ==
      "host [IP] dials [PHONE] and [PHONE]")
    assert(out(2).getAs[Long]("n_ip") == 1L)
    assert(out(2).getAs[Long]("n_phone") == 2L)
    assert(out(3).getAs[String]("text_redacted") ==
      "clean text, no pii at all; 1+2=3 and v1.2 stay")
  }

  test("contaminationReport flags planted near-copies and only those") {
    val train = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (11L, "one two three four five six seven eight nine ten"),
      (12L, "red orange yellow green blue indigo violet umber ochre teal"),
      (13L, "tiny doc")).toDF("doc_id", "text")
    // eval contains a shifted copy of doc 10 and an unrelated doc
    val eval = Seq(
      (90L, "beta gamma delta epsilon zeta eta theta iota kappa lambda"),
      (91L, "completely different words entirely here now")).toDF("doc_id", "text")
    val rep = Decontaminate.contaminationReport(train, eval,
      "doc_id", "text", k = 5, threshold = 0.5).orderBy("doc_id").collect()
    assert(rep.length == 4)
    val byId = rep.map(r => r.getLong(0) -> r).toMap
    assert(byId(10L).getAs[Boolean]("contaminated"))
    assert(byId(10L).getAs[Long]("overlap") == 5L) // 5 of 6 5-grams shared
    assert(!byId(11L).getAs[Boolean]("contaminated"))
    assert(byId(11L).getAs[Long]("overlap") == 0L)
    assert(!byId(12L).getAs[Boolean]("contaminated"))
    // < k tokens: zero ngrams, reported, never contaminated
    assert(byId(13L).getAs[Long]("ngrams") == 0L)
    assert(!byId(13L).getAs[Boolean]("contaminated"))

    val kept = Decontaminate.dropContaminated(train, eval,
      "doc_id", "text", k = 5, threshold = 0.5)
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(11L, 12L, 13L))
  }

  test("pii_redact and decontam entries run at sf0.001 with rows") {
    for (name <- Seq("pii_redact", "decontam")) {
      val df = SparkEntry.queries(name)(spark, sf)
      assert(df.count() > 0, name)
    }
  }

  test("fluent redactPii / dropContaminated wrappers delegate") {
    import graft.core.GfFrame._
    val docs = Seq((1L, "mail a@b.io"), (2L, "clean")).toDF("doc_id", "text")
    val red = docs.graft.redactPii("text").result
    assert(red.filter("doc_id = 1").select("text_redacted")
      .as[String].head() == "mail [EMAIL]")
    val eval = Seq((9L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon extra"),
      (2L, "other words entirely different here")).toDF("doc_id", "text")
    val kept = train.graft.dropContaminated(eval, "doc_id", "text",
      k = 5, threshold = 0.5).result
    assert(kept.select("doc_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("contaminationReport keeps native string doc ids intact") {
    val train = Seq(
      ("doc-a", "alpha beta gamma delta epsilon zeta"),
      ("doc-b", "one two three four five six")).toDF("doc_id", "text")
    val eval = Seq(
      ("e-1", "beta gamma delta epsilon zeta eta")).toDF("doc_id", "text")
    val rep = Decontaminate.contaminationReport(train, eval,
      "doc_id", "text", k = 5, threshold = 0.5).orderBy("doc_id").collect()
    assert(rep.map(_.getString(0)).toSeq == Seq("doc-a", "doc-b"))
    assert(rep(0).getAs[Boolean]("contaminated"))
    assert(!rep(1).getAs[Boolean]("contaminated"))
  }

  test("selectByTokenBudget keeps best-scored docs, crossing doc included") {
    val d = Seq(
      ("a", 1L, 0.9, 400L), ("a", 2L, 0.8, 400L), ("a", 3L, 0.7, 400L),
      ("b", 4L, 0.5, 1000L), ("b", 5L, 0.4, 1000L),
      ("c", 6L, 0.1, 5000L)).toDF("source", "doc_id", "score", "n_tokens")
    val kept = graft.text.Quality.selectByTokenBudget(d, "doc_id",
        "source", "score", "n_tokens", budgetPerSource = 700L)
      .select("doc_id").as[Long].collect().toSet
    // a: 400 then 800>700 but doc 2 crosses the line -> kept; doc 3 out
    // b: 1000 crosses immediately -> doc 4 kept, doc 5 out
    // c: single huge doc still kept (every source contributes)
    assert(kept == Set(1L, 2L, 4L, 6L))
    // tiebreak on equal scores: lower id wins the remaining budget
    val tie = Seq(("s", 7L, 0.5, 600L), ("s", 8L, 0.5, 600L))
      .toDF("source", "doc_id", "score", "n_tokens")
    val keptTie = graft.text.Quality.selectByTokenBudget(tie, "doc_id",
        "source", "score", "n_tokens", budgetPerSource = 600L)
      .select("doc_id").as[Long].collect().toSeq
    assert(keptTie == Seq(7L))
  }

  test("selectByTokenBudgetGlobal splits the budget by weight, honors caps, drops unweighted sources") {
    val d = Seq(
      ("a", 1L, 0.9, 400L), ("a", 2L, 0.8, 400L), ("a", 3L, 0.7, 400L),
      ("b", 4L, 0.9, 300L), ("b", 5L, 0.8, 300L),
      ("c", 6L, 0.9, 100L), ("c", 7L, 0.8, 100L),
      ("zzz", 8L, 1.0, 10L)).toDF("source", "doc_id", "score", "n_tokens")
    // total 2000, weights a=.5 b=.25 c=.25 -> 1000/500/500; cap c at 150
    val kept = graft.text.Quality.selectByTokenBudgetGlobal(d, "doc_id",
        "source", "score", "n_tokens", totalBudget = 2000L,
        weights = Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25),
        caps = Map("c" -> 150L))
      .select("doc_id").as[Long].collect().toSet
    // a: 400+400 = 800 < 1000, doc 3 crosses (1200) -> all 3 kept
    // b: 300 then 600 > 500 but doc 5 crosses -> both kept
    // c: cap 150: doc 6 (100) kept, doc 7 crosses (200) -> kept too
    //    (first-over-the-line rule), nothing after
    // zzz: no weight -> dropped despite top score
    assert(kept == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L))
    // a zero-share source is dropped entirely (weight rounds to 0)
    val tiny = graft.text.Quality.selectByTokenBudgetGlobal(d, "doc_id",
        "source", "score", "n_tokens", totalBudget = 3L,
        weights = Map("a" -> 0.9, "b" -> 0.1))
      .select("doc_id", "source").collect()
    assert(tiny.forall(_.getString(1) == "a")) // b's floor(0.3)=0 share
  }

  test("selectByTokenBudgetTemperature: alpha=0 splits evenly, alpha=1 splits naturally") {
    // source sizes 4000 / 1000 tokens in 100-token docs, equal scores
    // broken by id so selection order is deterministic
    val d = ((1 to 40).map(i => ("big", i.toLong, 1.0 - i * 0.001, 100L)) ++
      (101 to 110).map(i => ("small", i.toLong, 1.0 - i * 0.001, 100L)))
      .toDF("source", "doc_id", "score", "n_tokens")
    def keptTokens(alpha: Double): Map[String, Long] =
      graft.text.Quality.selectByTokenBudgetTemperature(d, "doc_id",
          "source", "score", "n_tokens", totalBudget = 1000L, alpha = alpha)
        .groupBy("source").agg(sum("n_tokens").as("t"))
        .as[(String, Long)].collect().toMap
    // alpha=0: weights 1:1 -> 500 each; 100-token docs fill exactly
    assert(keptTokens(0.0) == Map("big" -> 500L, "small" -> 500L))
    // alpha=1: weights 4000:1000 -> 800/200
    assert(keptTokens(1.0) == Map("big" -> 800L, "small" -> 200L))
    // alpha=0.5: weights sqrt(4000):sqrt(1000) = 2:1 -> 666/333;
    // first-over-the-line keeps the crossing 100-token doc
    assert(keptTokens(0.5) == Map("big" -> 700L, "small" -> 400L))
  }

  test("temperature mixer: null-source rows neither crash nor deflate real shares") {
    // a null source can never match the selection CASE chain, so its
    // tokens must stay out of the weight normalization too — and the
    // null group must not NPE the driver-side budget sort
    val d = Seq((Some("a"), 1L, 0.9, 400L), (Some("a"), 2L, 0.8, 400L),
        (Some("b"), 3L, 0.9, 400L), (Some("b"), 4L, 0.8, 400L),
        (Option.empty[String], 5L, 1.0, 9000L))
      .toDF("source", "doc_id", "score", "n_tokens")
    val kept = graft.text.Quality.selectByTokenBudgetTemperature(d, "doc_id",
        "source", "score", "n_tokens", totalBudget = 800L, alpha = 1.0)
      .select("doc_id").as[Long].collect().toSet
    // weights a:b = 800:800 -> 400 each (the 9000 null tokens ignored);
    // each source keeps its first doc exactly at the line
    assert(kept == Set(1L, 3L))
  }

  test("unimax mixer: small source saturates its cap, the rest waterfill evenly") {
    // tokens: A=10, B=100, C=100 (5-token docs). B=60, maxEpochs=1 ->
    // caps ascending 10,100,100: A saturates (60/3=20 >= 10), leftover
    // level = (60-10)/2 = 25 for B and C. Selection keeps A whole (2
    // docs) and 5 docs each of B/C (5th doc: cum-tok = 20 < 25 keeps;
    // 6th: 25 !< 25 drops).
    val docs =
      (1 to 2).map(i => ("A", i.toLong, 1.0 - i * 0.01, 5L)) ++
      (11 to 30).map(i => ("B", i.toLong, 1.0 - i * 0.01, 5L)) ++
      (31 to 50).map(i => ("C", i.toLong, 1.0 - i * 0.01, 5L))
    val d = docs.toDF("source", "doc_id", "score", "n_tokens")
    val kept = graft.text.Quality.selectByTokenBudgetUniMax(d, "doc_id",
        "source", "score", "n_tokens", totalBudget = 60L, maxEpochs = 1.0)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept == Map("A" -> 2L, "B" -> 5L, "C" -> 5L))
  }

  test("unimax mixer: budget above every cap degrades to pure epoch caps") {
    // B=10000 >> sum of caps; maxEpochs=0.5 halves each source:
    // floor(0.5*100)=50 tokens = 10 five-token docs per source
    val docs = (1 to 40).map(i =>
      (if (i <= 20) "A" else "B", i.toLong, 1.0 - i * 0.01, 5L))
    val d = docs.toDF("source", "doc_id", "score", "n_tokens")
    val kept = graft.text.Quality.selectByTokenBudgetUniMax(d, "doc_id",
        "source", "score", "n_tokens", totalBudget = 10000L, maxEpochs = 0.5)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept == Map("A" -> 10L, "B" -> 10L))
  }

  test("unimax mixer: selection within a source is (score desc, id asc)") {
    val d = Seq(("s", 1L, 0.1, 5L), ("s", 2L, 0.9, 5L), ("s", 3L, 0.9, 5L))
      .toDF("source", "doc_id", "score", "n_tokens")
    // cap = 15, level = min(cap, 8/1=8): docs 2 then 3 selected; doc 3
    // crosses the 8-token line and is the last kept; doc 1 never starts
    val kept = graft.text.Quality.selectByTokenBudgetUniMax(d, "doc_id",
        "source", "score", "n_tokens", totalBudget = 8L, maxEpochs = 1.0)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L))
  }

  test("shortEvalContainment catches a 3-token eval string the k-gram report misses") {
    val train = Seq(
      ("doc-a", "alpha beta gamma delta epsilon zeta"),
      ("doc-b", "one two three four five six"),
      ("doc-c", "beta gamma here too but split beta gamma delta")
    ).toDF("doc_id", "text")
    val eval = Seq(("e-1", "  beta gamma  delta "), // ragged whitespace normalizes
      ("e-2", "five six")).toDF("doc_id", "text")
    // k=5: both eval rows are under 5 tokens -> k-gram report blind
    val rep = Decontaminate.contaminationReport(train, eval,
      "doc_id", "text", k = 5, threshold = 0.1).orderBy("doc_id").collect()
    assert(rep.forall(!_.getAs[Boolean]("contaminated")))
    val short = Decontaminate.shortEvalContainment(train, eval,
      "doc_id", "text", k = 5).orderBy("doc_id").collect()
    assert(short.map(r => (r.getString(0), r.getAs[Long]("short_hits"),
      r.getAs[Boolean]("contaminated_short"))).toSeq == Seq(
      ("doc-a", 1L, true),   // contains "beta gamma delta"
      ("doc-b", 1L, true),   // contains "five six"
      ("doc-c", 1L, true)))  // contains "beta gamma delta" (the split
                             // "beta gamma" alone must NOT count)
    // no short eval rows -> all clean, plan still returns every doc
    val none = Decontaminate.shortEvalContainment(train,
      eval.filter(col("doc_id") === "none"), "doc_id", "text", k = 5)
    assert(none.collect().forall(r => !r.getAs[Boolean]("contaminated_short")))
    assert(none.count() == 3)
  }

  test("dropContaminated also drops short-eval leaks by default") {
    val train = Seq(
      (1L, "the secret answer is forty two exactly here"),
      (2L, "completely unrelated content about other things"),
      (3L, "more unrelated filler words beyond any overlap")
    ).toDF("doc_id", "text")
    val eval = Seq((9L, "forty two")).toDF("doc_id", "text") // 2 < k tokens
    // pure k-gram mode leaks doc 1 (eval carries zero 5-grams)...
    val leaky = Decontaminate.dropContaminated(train, eval,
      "doc_id", "text", k = 5, threshold = 0.5, includeShort = false)
    assert(leaky.count() == 3)
    // ...the default catches it
    val tight = Decontaminate.dropContaminated(train, eval,
      "doc_id", "text", k = 5, threshold = 0.5)
    assert(tight.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 3L))
  }

  test("redactDates turns ISO dates into [DATE] before the phone pass swallows them") {
    val df = Seq((1L, "on 2024-01-31 and 1999/12/31 call +1 555-0100 x"))
      .toDF("id", "text")
    val both = df.select(
      graft.text.Redact.redactPii(
        graft.text.Redact.redactDates(col("text"))).as("dated"),
      graft.text.Redact.redactPii(col("text")).as("naive")).head()
    assert(both.getString(0) == "on [DATE] and [DATE] call [PHONE] x")
    // documented false positive: the dash date redacts as phone,
    // the slash date survives raw
    assert(both.getString(1) == "on [PHONE] and 1999/12/31 call [PHONE] x")
  }
}
