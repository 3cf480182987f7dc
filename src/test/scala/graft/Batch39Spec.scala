package graft

import graft.stats.DataAudit
import org.apache.spark.sql.functions._

/** Round-12: data-quality audits + CUSUM drift. */
class Batch39Spec extends SparkSpec {
  import spark.implicits._

  test("benford: first-digit shares against the law") {
    val df = Seq(1.23, 19.0, 100.5, 2.0, -5.0, 0.0).toDF("v")
    val out = DataAudit.benford(df, "v").orderBy("digit")
      .as[(Int, Long, Double, Double, Double)].collect()
    // negatives/zeros excluded; digits 1,1,1,2
    assert(out.map(r => (r._1, r._2)).toSeq === Seq((1, 3L), (2, 1L)))
    assert(out(0)._3 === 0.75 && out(1)._3 === 0.25)
    assert(out(0)._4 === math.rint(math.log10(2.0) * 1e6) / 1e6)
    assert(out(1)._4 === math.rint(math.log10(1.5) * 1e6) / 1e6)
    // leading zeros skipped: 0.042 -> digit 4
    val frac = DataAudit.benford(Seq(0.04).toDF("v"), "v")
      .as[(Int, Long, Double, Double, Double)].head()
    assert(frac._1 === 4)
  }

  test("benford: scale-spanning magnitudes survive ANSI cast (>= 1e16)") {
    // DECIMAL(18,2) would CAST_OVERFLOW here under ANSI mode; the
    // widened DECIMAL(38,2) renders and extracts digit 7
    val out = DataAudit.benford(Seq(7.2e16, 12.0).toDF("v"), "v")
      .orderBy("digit").as[(Int, Long, Double, Double, Double)].collect()
    assert(out.map(r => (r._1, r._2)).toSeq === Seq((1, 1L), (7, 1L)))
    // documented tiny-value exclusion: below 0.5*10^-decimals rounds
    // to 0.00 and drops out of the digit counts
    assert(DataAudit.benford(Seq(0.004).toDF("v"), "v").count() === 0L)
    assert(DataAudit.benford(Seq(0.004).toDF("v"), "v", decimals = 3)
      .as[(Int, Long, Double, Double, Double)].head()._1 === 4)
  }

  test("psi: identical distributions score 0, shifted ones hand-compute") {
    // ref deciles of 1..100 with bins=2: one edge at the median; a
    // current sample fully in the upper half puts all mass in bin 2
    val ref = (1 to 100).map(_.toDouble).toDF("v")
    val same = DataAudit.psi(ref, ref, "v", bins = 4)
      .as[(Int, Double, Double, Double)].collect()
    assert(same.length == 4)
    assert(same.forall(r => r._4 == 0.0), s"psi != 0 on identical: ${same.toSeq}")
    val shifted = (61 to 100).map(_.toDouble).toDF("v")
    val out = DataAudit.psi(ref, shifted, "v", bins = 2)
      .orderBy("bin").as[(Int, Double, Double, Double)].collect()
    // edge = median of ref = 50.5; shifted is fully above -> q = (1e-6, 1.0)
    assert(out(0)._2 == 0.5 && out(0)._3 == 1e-6)
    assert(out(1)._2 == 0.5 && out(1)._3 == 1.0)
    val expected0 = math.rint((1e-6 - 0.5) * math.log(1e-6 / 0.5) * 1e6) / 1e6
    val expected1 = math.rint((1.0 - 0.5) * math.log(1.0 / 0.5) * 1e6) / 1e6
    assert(out(0)._4 == expected0 && out(1)._4 == expected1)
    // the PSI total crosses the textbook "shifted" threshold
    assert(out.map(_._4).sum > 0.25)
  }

  test("psi fit/deploy split lands on the batch kernel's exact doubles") {
    // the streaming deploy is psiFitEdges (once) + engine-maintained
    // binCounts + psiOfCounts; composed over static frames it must be
    // IDENTICAL to psi() — same expressions, same single libm crossing
    val ref = (1 to 100).map(_.toDouble).toDF("v")
    val cur = (31 to 90).map(_.toDouble).toDF("v")
    val direct = DataAudit.psi(ref, cur, "v", bins = 5)
      .orderBy("bin").as[(Int, Double, Double, Double)].collect()
    val edges = DataAudit.psiFitEdges(ref, "v", bins = 5)
    // the stream side only ever sees per-batch increments; two
    // arbitrary splits of cur must accumulate to the same counts
    val curCounts = DataAudit.binCounts(
      (31 to 50).map(_.toDouble).toDF("v"), "v", edges, "_cc")
      .unionAll(DataAudit.binCounts(
        (51 to 90).map(_.toDouble).toDF("v"), "v", edges, "_cc"))
      .groupBy("bin").agg(sum("_cc").as("_cc"))
    val split = DataAudit.psiOfCounts(
        DataAudit.binCounts(ref, "v", edges, "_cr"), curCounts, bins = 5)
      .orderBy("bin").as[(Int, Double, Double, Double)].collect()
    assert(split.toSeq === direct.toSeq)
  }

  test("psi stream survives a query KILL + checkpoint restart: the " +
      "engine-recovered Complete-mode counts land on the batch PSI") {
    // drift_psi_stream's durability story rests on the state store
    // restoring the per-bin counts — this kills the query between
    // micro-batches and restarts a FRESH query (new memory sink) on
    // the same checkpoint; the resumed counts must equal a batch pass
    // over everything fed across both lives.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ref = (0 until 2000).map(i => (i * 7919 % 997) * 0.5).toDF("v")
    val curAll = (0 until 1800).map(i => (i * 6271 % 997) * 0.55 + 3.0)
    val edges = DataAudit.psiFitEdges(ref, "v")
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_psi_ckpt").toString
    val in = MemoryStream[Double]
    def start(qn: String) =
      DataAudit.psiStreamCounts(in.toDF().toDF("v"), "v", edges)
        .writeStream.format("memory").queryName(qn)
        .option("checkpointLocation", ckpt)
        .outputMode("complete").start()
    val chunks = curAll.grouped(600).toSeq
    val q1 = start("psi_kill_a")
    try chunks.take(2).foreach { c =>
      in.addData(c: _*); q1.processAllAvailable()
    } finally q1.stop() // the "crash"
    val q2 = start("psi_kill_b")
    try {
      in.addData(chunks(2): _*); q2.processAllAvailable()
    } finally q2.stop()
    val refCounts = DataAudit.binCounts(ref, "v", edges, "_cr")
    val streamed = DataAudit.psiOfCounts(refCounts,
      spark.table("psi_kill_b"), bins = 10).orderBy("bin")
    val batch = DataAudit.psiOfCounts(refCounts,
      DataAudit.binCounts(curAll.toDF("v"), "v", edges, "_cc"),
      bins = 10).orderBy("bin")
    val a = streamed.collect()
    val b = batch.collect()
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  test("psiCategorical: value-group bins, one-sided categories floored, " +
      "null its own category") {
    val ref = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq(null))
      .toDF("cat")
    // identical -> every term 0 (including the (null) category)
    val same = DataAudit.psiCategorical(ref, ref, "cat")
      .as[(String, Double, Double, Double)].collect()
    assert(same.length == 3 && same.forall(_._4 == 0.0))
    assert(same.exists(_._1 == "(null)"))
    // cur drops 'b' entirely and introduces 'c': both one-sided
    // categories appear in the domain with the floored share
    val cur = (Seq.fill(5)("a") ++ Seq.fill(5)("c")).toDF("cat")
    val out = DataAudit.psiCategorical(ref, cur, "cat")
      .orderBy("category").as[(String, Double, Double, Double)].collect()
    assert(out.map(_._1).toSeq === Seq("(null)", "a", "b", "c"))
    val byCat = out.map(r => r._1 -> r).toMap
    assert(byCat("b")._2 == 0.3 && byCat("b")._3 == 1e-6)
    assert(byCat("c")._2 == 1e-6 && byCat("c")._3 == 0.5)
    def term(p: Double, q: Double) =
      math.rint((q - p) * math.log(q / p) * 1e6) / 1e6
    assert(byCat("b")._4 == term(0.3, 1e-6))
    assert(byCat("c")._4 == term(1e-6, 0.5))
    // a vanished 30% category + a new 50% one is a hard shift
    assert(out.map(_._4).sum > 0.25)
  }

  test("keySkew: shares of the heaviest and top-k keys") {
    val df = (Seq.fill(6)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    val out = DataAudit.keySkew(df, "k", k = 2)
      .as[(Long, Long, Double, Double, Double)].head()
    assert(out === ((10L, 3L, 0.6, 0.9, math.rint(10.0 / 3 * 1e6) / 1e6)))
  }

  test("paretoCurve: decile boundaries of cumulative mass share") {
    // 4 keys with masses 40, 30, 20, 10 -> cumulative 0.4/0.7/0.9/1.0
    val df = Seq(("a", 40.0), ("b", 30.0), ("c", 20.0), ("d", 10.0))
      .toDF("k", "v")
    val out = DataAudit.paretoCurve(df, "k", "v", points = 4)
      .orderBy("pct_entities").as[(Double, Double)].collect()
    assert(out.toSeq === Seq((0.25, 0.4), (0.5, 0.7), (0.75, 0.9),
      (1.0, 1.0)))
    // fewer keys than points: every entity is a boundary
    val small = DataAudit.paretoCurve(df, "k", "v", points = 10)
      .as[(Double, Double)].collect()
    assert(small.length === 4)
  }

  test("cusumFlags: exact running deviations and threshold flags") {
    val ev = Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 3.0),
      (2L, 1L, 5.0)) // singleton series: sigma undefined, never flags
      .toDF("user", "t", "value")
    val out = graft.ts.Windows.cusumFlags(ev, Seq("user"), "value", "t",
        threshold = 0.5)
      .select("user", "t", "cusum", "drift")
      .orderBy("user", "t")
      .as[(Long, Long, Double, Boolean)].collect()
    // mean 2 -> cusum -1, -1, 0; sigma 1 -> |cusum| > 0.5 flags rows 1,2
    assert(out.toSeq === Seq(
      (1L, 1L, -1.0, true), (1L, 2L, -1.0, true), (1L, 3L, 0.0, false),
      (2L, 1L, 0.0, false)))
  }
}
