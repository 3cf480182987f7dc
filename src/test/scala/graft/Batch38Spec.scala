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

  test("readability: hand-computed Flesch-Kincaid on a two-sentence doc") {
    // "Go now. Stop it!": 2 sentence runs, 4 words, 4 syllables
    // ease = 206.835 - 1.015*2 - 84.6*1 = 120.205
    // grade = 0.39*2 + 11.8*1 - 15.59 = -3.01
    val out = graft.text.Quality.readability(
        Seq((1L, "Go now. Stop it!"), (2L, "")).toDF("id", "text"),
        "id", "text")
      .orderBy("id")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect()
    assert(out(0) === ((1L, 4L, 2L, 4L, Some(120.205), Some(-3.01))))
    assert(out(1)._2 === 0L && out(1)._5.isEmpty) // zero words -> NULL
  }

  test("maxDrawdown: hand-computed peak-to-trough; non-positive peaks stay NULL") {
    val ev = Seq(
      (1L, 1L, 10.0), (1L, 2L, 5.0), (1L, 3L, 8.0), (1L, 4L, 2.0),
      (2L, 1L, 0.0), (2L, 2L, 0.0)) // peak never positive
      .toDF("user", "t", "value")
    val out = graft.ts.Windows.maxDrawdown(ev, Seq("user"), "value", "t")
      .orderBy("user")
      .as[(Long, Long, Option[Double], Option[Double])].collect()
    assert(out(0) === ((1L, 4L, Some(10.0), Some(0.8))))
    assert(out(1)._1 === 2L && out(1)._4.isEmpty)
  }

  test("funnel: order matters, counts are monotone") {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, "view", t(1)), (1L, "click", t(2)), (1L, "purchase", t(3)),
      (2L, "click", t(1)), (2L, "view", t(2)), // click BEFORE view
      (3L, "view", t(1)), (3L, "purchase", t(2)), // skipped click
      (4L, "purchase", t(1)))
      .toDF("user", "type", "ts")
    val out = graft.ts.EventAnalytics.funnel(ev, "user", "type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy("step").as[(Int, String, Long)].collect()
    assert(out.toSeq === Seq((1, "view", 3L), (2, "click", 1L),
      (3, "purchase", 1L)))
  }

  test("funnel: same-timestamp step qualifies (at-or-after semantics)") {
    import java.sql.Timestamp
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    val ev = Seq((1L, "view", ts), (1L, "click", ts))
      .toDF("user", "type", "ts")
    val out = graft.ts.EventAnalytics.funnel(ev, "user", "type", "ts",
        Seq("view", "click"))
      .orderBy("step").as[(Int, String, Long)].collect()
    assert(out.toSeq === Seq((1, "view", 1L), (2, "click", 1L)))
  }

  test("cohortRetention: weekly cohorts and offsets") {
    import java.sql.Timestamp
    // 2024-01-01 is a Monday: W0 = Jan 1, W1 = Jan 8
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-02 10:00:00")), // A in W0
      (1L, Timestamp.valueOf("2024-01-09 10:00:00")), // A active W1
      (2L, Timestamp.valueOf("2024-01-10 10:00:00"))) // B first W1
      .toDF("user", "ts")
    val out = graft.ts.EventAnalytics.cohortRetention(ev, "user", "ts")
      .orderBy("cohort", "period_offset")
      .as[(java.sql.Date, Long, Long)].collect()
    assert(out.map(r => (r._1.toString, r._2, r._3)).toSeq === Seq(
      ("2024-01-01", 0L, 1L), ("2024-01-01", 1L, 1L),
      ("2024-01-08", 0L, 1L)))
  }

  test("eventTransitions: counts and row-normalized probabilities") {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, "view", t(1)), (1L, "click", t(2)), (1L, "view", t(3)),
      (2L, "view", t(1)), (2L, "view", t(2)))
      .toDF("user", "type", "ts")
    val out = graft.ts.EventAnalytics.eventTransitions(ev, "user",
        "type", "ts")
      .orderBy("from_type", "to_type")
      .as[(String, String, Long, Double)].collect()
    assert(out.toSeq === Seq(
      ("click", "view", 1L, 1.0),
      ("view", "click", 1L, 0.5),
      ("view", "view", 1L, 0.5)))
  }

  test("twoProportionZ: hand-computed z and Wald CI; degenerate pool is NULL") {
    val df = Seq((true, true), (true, false), (false, false), (false, false))
      .toDF("grp", "y")
    val out = graft.stats.Inferential.twoProportionZ(df, "grp", "y")
      .as[(Long, Long, Long, Long, Double, Double, Double,
        Option[Double], Double, Double)].head()
    assert((out._1, out._2, out._3, out._4) === ((2L, 1L, 2L, 0L)))
    assert(out._5 === 0.5 && out._6 === 0.0 && out._7 === 0.5)
    val z = 0.5 / math.sqrt(0.25 * 0.75 * (0.5 + 0.5))
    assert(out._8 === Some(math.rint(z * 1e9) / 1e9))
    val se = math.sqrt(0.5 * 0.5 / 2.0)
    assert(out._9 === math.rint((0.5 - 1.959964 * se) * 1e6) / 1e6)
    // everyone converts: zero pooled SE -> NULL z
    val deg = graft.stats.Inferential.twoProportionZ(
        Seq((true, true), (false, true)).toDF("grp", "y"), "grp", "y")
      .select("z_stat").as[Option[Double]].head()
    assert(deg.isEmpty)
  }

  test("pairAssociations: hand-computed support and lift; oversized basket refused") {
    val items = Seq(
      (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"), (3L, "x"), (3L, "z"),
      (4L, "z"))
      .toDF("basket", "item")
    val out = graft.rel.Market.pairAssociations(items, "basket", "item")
      .orderBy("item_a", "item_b")
      .as[(String, String, Long, Double, Double)].collect()
    // n=4 baskets; c(x)=3 c(y)=2 c(z)=2; xy=2, xz=1
    assert(out.toSeq === Seq(
      ("x", "y", 2L, 0.5, math.rint(2.0 * 4 / 6 * 1e6) / 1e6),
      ("x", "z", 1L, 0.25, math.rint(1.0 * 4 / 6 * 1e6) / 1e6)))
    intercept[IllegalArgumentException] {
      graft.rel.Market.pairAssociations(
        (1 to 20).map(i => (1L, s"i$i")).toDF("basket", "item"),
        "basket", "item", maxBasketSize = 10)
    }
  }

  test("rfm: recency/frequency/monetary and quintile orientation") {
    import java.sql.Timestamp
    val orders = Seq(
      (1L, Timestamp.valueOf("2024-01-10 00:00:00"), 100.0),
      (1L, Timestamp.valueOf("2024-01-20 00:00:00"), 100.0),
      (2L, Timestamp.valueOf("2024-01-05 00:00:00"), 10.0))
      .toDF("cust", "dt", "amt")
    val out = graft.rel.Market.rfm(orders, "cust", "dt", "amt")
      .orderBy("cust")
      .as[(Long, Int, Long, Double, Int, Int, Int)].collect()
    assert(out(0) === ((1L, 0, 2L, 200.0, 2, 2, 2)))  // most recent/active
    assert(out(1) === ((2L, 15, 1L, 10.0, 1, 1, 1)))  // stale/light
    // quintile orientation: higher codes = better on every axis
    assert(out(0)._5 > out(1)._5 && out(0)._6 > out(1)._6 &&
      out(0)._7 > out(1)._7)
  }

  test("round-12 analytics ride the fluent surface") {
    import graft.core.GfFrame._
    import java.sql.Timestamp
    val ev = Seq((1L, "view", Timestamp.valueOf("2024-01-01 00:01:00"), 5.0),
      (1L, "click", Timestamp.valueOf("2024-01-01 00:02:00"), 3.0))
      .toDF("user", "type", "ts", "value")
    assert(ev.graft.funnel("user", "type", "ts", Seq("view", "click"))
      .result.count() === 2)
    assert(ev.graft.cohortRetention("user", "ts").result.count() === 1)
    assert(ev.graft.eventTransitions("user", "type", "ts")
      .result.count() === 1)
    assert(ev.graft.maxDrawdown(Seq("user"), "value", "ts")
      .result.count() === 1)
    assert(ev.graft.cusumFlags(Seq("user"), "value", "ts")
      .result.count() === 2)
    assert(ev.graft.benford("value").result.count() === 2)
    assert(ev.graft.keySkew("type").result.count() === 1)
    val docs = Seq((1L, "alpha beta. gamma!")).toDF("id", "text")
    assert(docs.graft.readability("id", "text").result.count() === 1)
    assert(docs.graft.zipfFit("text").result.count() === 1)
  }

  test("conversionTime: quartiles of first-to-first deltas, converters only") {
    import java.sql.Timestamp
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, "view", t(0)), (1L, "purchase", t(1)),  // 60 s
      (2L, "view", t(0)), (2L, "purchase", t(3)),  // 180 s
      (3L, "purchase", t(0)), (3L, "view", t(1)),  // purchase BEFORE view
      (4L, "view", t(0)))                          // never converts
      .toDF("user", "type", "ts")
    val out = graft.ts.EventAnalytics.conversionTime(ev, "user", "type",
        "ts", "view", "purchase")
      .as[(Long, Long, Double, Double, Double, Long, Double)].head()
    assert(out._1 === 2L)        // users 1 and 2 only
    assert(out._2 === 60L && out._6 === 180L)
    assert(out._4 === 120.0)     // median of {60, 180}
    assert(out._7 === 120.0)     // mean
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
