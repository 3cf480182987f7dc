package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.core.{Tables => T}
import graft.rel._

class RelSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin matches <= semantics including ts ties") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "id")
    val right = Seq((1L, 10L, 1.0), (1L, 15L, 2.0), (2L, 6L, 9.0))
      .toDF("k", "t", "v")
    val out = Joins.asofJoin(left, right, "k", "t", Seq("v"))
      .select("id", "v").as[(String, Option[Double])].collect().toMap
    assert(out("a").contains(1.0))  // tie: right at t=10 matches left at t=10
    assert(out("b").contains(2.0))  // latest prior
    assert(out("c").isEmpty)        // nothing at or before t=5
  }

  test("nearestJoin keeps only the closest match within tolerance") {
    val left = Seq((1, 10.0), (2, 50.0)).toDF("lid", "x")
    val right = Seq((100, 11.0), (101, 8.5), (102, 49.0)).toDF("rid", "y")
    val out = Joins.nearestJoin(left, right, "x", "y", tolerance = 2.0, leftId = "lid")
      .select("lid", "rid").as[(Int, Int)].collect().toMap
    assert(out == Map(1 -> 100, 2 -> 102)) // |10-11|=1 beats |10-8.5|=1.5
  }

  test("toCategories clamps out-of-range values into edge bins") {
    val df = Seq(-5.0, 0.0, 9.9, 25.0, 99.0).toDF("x")
    val out = Reshape.toCategories(df, "x", 0.0, 30.0, 3,
        Seq("a", "b", "c"), "band")
      .select("band").as[String].collect().toSeq
    assert(out == Seq("a", "a", "a", "c", "c"))
  }

  test("splitByIdMod partitions are a disjoint cover") {
    val ord = T.orders(spark, sf)
    val train = Sampling.splitByIdMod(ord, "o_orderkey", 4, 5)
    val test0 = Sampling.splitByIdMod(ord, "o_orderkey", 4, 5, invert = true)
    assert(train.count() + test0.count() == ord.count())
    assert(train.join(test0, Seq("o_orderkey"), "inner").count() == 0)
  }

  test("sample fraction is deterministic under a fixed seed") {
    val ord = T.orders(spark, sf)
    val a = Sampling.sample(ord, 0.1, seed = 7).count()
    val b = Sampling.sample(ord, 0.1, seed = 7).count()
    assert(a == b && a > 0)
  }

  test("stratifiedSampleByHash: fractions honored, selection stable under repartitioning") {
    val cust = T.customer(spark, sf)
    val fr = Map("BUILDING" -> 0.5, "MACHINERY" -> 0.2)
    val picked = Sampling.stratifiedSampleByHash(cust, "c_custkey",
      "c_mktsegment", fr, seed = 7L)
    val bySeg = picked.groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // only listed strata survive; counts near fraction·stratum size
    assert(bySeg.keySet == Set("BUILDING", "MACHINERY"))
    val totals = cust.groupBy("c_mktsegment").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    fr.foreach { case (s, f) =>
      val expected = totals(s) * f
      assert(math.abs(bySeg(s) - expected) < totals(s) * 0.2,
        s"$s: got ${bySeg(s)}, expected ~$expected")
    }
    // the draw is a function of row identity — repartitioning (which
    // changes sampleBy's RNG stream) must not change the set
    val again = Sampling.stratifiedSampleByHash(cust.repartition(13),
        "c_custkey", "c_mktsegment", fr, seed = 7L)
      .select("c_custkey").as[Long].collect().toSet
    assert(again == picked.select("c_custkey").as[Long].collect().toSet)
  }

  test("symmetricDiffCount equals the exceptAll formulation on random multisets") {
    // the one-shuffle tagged-union rewrite must keep exact multiset
    // semantics: sum over values of |count_a - count_b|
    val rnd = new scala.util.Random(17)
    val a = Seq.fill(300)((rnd.nextInt(20), if (rnd.nextBoolean()) "x" else null))
      .toDF("k", "s")
    val b = Seq.fill(280)((rnd.nextInt(20), if (rnd.nextBoolean()) "x" else null))
      .toDF("k", "s")
    val viaExcept = a.exceptAll(b).count() + b.exceptAll(a).count()
    assert(SetOps.symmetricDiffCount(a, b) == viaExcept)
    assert(SetOps.symmetricDiffCount(a.limit(0), b.limit(0)) == 0L)
    assert(SetOps.symmetricDiffCount(a.limit(0), b) == 280L)
  }

  test("symmetricDiffCount is 0 iff frames are multiset-equal") {
    val ord = T.orders(spark, sf)
    assert(SetOps.symmetricDiffCount(ord, ord) == 0)
    assert(SetOps.symmetricDiffCount(ord, ord.limit(10)) > 0)
  }

  test("concatRows aligns by name and null-fills missing columns") {
    val a = Seq((1, "x")).toDF("id", "s")
    val b = Seq((2, 3.5)).toDF("id", "d")
    val out = SetOps.concatRows(Seq(a, b))
    assert(out.columns.toSet == Set("id", "s", "d"))
    assert(out.count() == 2)
    assert(out.filter(col("s").isNull).count() == 1)
  }

  test("saltedDecimalSum equals the direct aggregate on skewed keys") {
    import graft.rel.Skew
    // 90% of rows share one key - the skew case salting exists for
    val rows = Seq.fill(900)(("hot", 1.25)) ++
      (1 to 100).map(i => (s"k$i", i * 0.5))
    val df = rows.toDF("k", "v").repartition(8)
    val salted = Skew.saltedDecimalSum(df, Seq("k"), "v", salts = 8)
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val direct = df.groupBy("k")
      .agg(sum(col("v").cast("decimal(28,2)")).cast("double").as("s"),
        count(lit(1)).as("n"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(salted.toSeq == direct.toSeq)
  }

  test("keySkewReport surfaces the hot key first") {
    import graft.rel.Skew
    val rows = Seq.fill(900)(("hot", 1)) ++ (1 to 100).map(i => (s"k$i", 1))
    val rep = Skew.keySkewReport(rows.toDF("k", "x"), Seq("k"), topN = 1).head
    assert(rep.getString(0) == "hot")
    assert(rep.getAs[Double]("share") > 0.8)
  }

  test("heavyHitters count-min estimates dominate counts, never undercount") {
    import graft.rel.Sketches
    val rows = Seq.fill(500)("hot") ++ Seq.fill(20)("warm") ++ Seq("cold")
    val df = rows.toDF("k")
    val est = Sketches.heavyHitters(df, "k", Seq("hot", "warm", "cold", "absent"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("hot") >= 500 && est("hot") <= 530)  // CMS overestimates only
    assert(est("warm") >= 20)
    assert(est("absent") <= 5)
  }

  test("bloomSemiJoin equals the exact semi-join (no false negatives)") {
    import graft.rel.Sketches
    val cust = T.customer(spark, sf)
    val bigOrders = T.orders(spark, sf).filter(col("o_totalprice") > 400000.0)
    val exact = Joins.semiJoin(cust, bigOrders, "c_custkey", "o_custkey")
      .select("c_custkey").as[Long].collect().toSet
    val viaBloom = Sketches.bloomSemiJoin(cust, bigOrders, "c_custkey",
        "o_custkey", expectedKeys = 2000)
      .select("c_custkey").as[Long].collect().toSet
    assert(viaBloom == exact)
  }

  test("heavyHittersExact equals plain GROUP BY/HAVING (sketch only prunes)") {
    import graft.rel.Sketches
    val li = T.lineitem(spark, sf)
    val exact = li.groupBy("l_suppkey").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 610)
      .as[(Long, Long)].collect().toMap
    // tiny eps forces a coarse sketch with collisions: over-estimates
    // may admit extra candidates, but the exact re-count must discard
    // them — the output still equals the plain plan
    val viaSketch = Sketches.heavyHittersExact(li, "l_suppkey", 610,
        eps = 0.1)
      .as[(Long, Long)].collect().toMap
    assert(viaSketch == exact)
    assert(exact.nonEmpty)
  }

  test("heavyHittersApprox: superset of the exact twin, eps*N error bound") {
    import graft.rel.Sketches
    val li = T.lineitem(spark, sf)
    val n = li.count()
    val exact = li.groupBy("l_suppkey").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 610)
      .as[(Long, Long)].collect().toMap
    assert(exact.nonEmpty)
    // capacity >= N/minCount -> candidate set provably contains every
    // exact heavy hitter; CM only over-estimates -> none drop below
    // the threshold
    val approx = Sketches.heavyHittersApprox(li, "l_suppkey", 610,
        capacity = math.max(16, (n / 610 + 1).toInt))
      .as[(Long, Long)].collect().toMap
    assert(exact.keySet.subsetOf(approx.keySet),
      s"missing: ${exact.keySet -- approx.keySet}")
    // per-key bound: exact <= est <= exact + eps*N (eps=1e-4 default)
    val allCounts = li.groupBy("l_suppkey").agg(count(lit(1)).as("cnt"))
      .as[(Long, Long)].collect().toMap
    approx.foreach { case (k, est) =>
      val ex = allCounts(k)
      assert(est >= ex, s"undercount at $k: $est < $ex")
      assert(est <= ex + (1e-4 * n).ceil.toLong + 1,
        s"over bound at $k: $est vs $ex (n=$n)")
    }
  }

  test("candidateKeys: Misra-Gries keeps every key above the capacity threshold") {
    import graft.rel.Sketches
    // one partition, capacity 3: keys with count > n/(c+1) = 25 must
    // survive the decrement rounds regardless of arrival order
    val rows = scala.util.Random.shuffle(
      Seq.fill(40)("hot") ++ Seq.fill(30)("warm") ++
        (1 to 30).map(i => s"t$i"))
    val cands = Sketches.candidateKeys(
        rows.toDF("k").repartition(1), "k", capacity = 3)
      .as[String].collect().toSet
    assert(cands.contains("hot") && cands.contains("warm"))
    assert(cands.size <= 3)
  }

  test("heavyHittersExact keeps a heavy NULL-key group (nulls bypass the sketch)") {
    import graft.rel.Sketches
    val df = (Seq.fill(20)(Option.empty[String]) ++
      Seq.fill(15)(Option("hot")) ++ (1 to 10).map(i => Option(s"t$i")))
      .toDF("k")
    val out = Sketches.heavyHittersExact(df, "k", 15)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(out == Map(None -> 20L, Some("hot") -> 15L))
  }

  test("filterDfFn applies a custom callable predicate via UDF") {
    val df = Seq(1.0, 4.0, 9.0, 16.0).toDF("x")
    val out = Filters.filterDfFn(df, "x", v => math.sqrt(v) % 2 == 0)
    assert(out.as[Double].collect().toSet == Set(4.0, 16.0))
  }

  test("filterOutliersZ drops far outliers only") {
    val df = (Seq.fill(100)(10.0) :+ 1e6).toDF("x")
    val out = Filters.filterOutliersZ(df, "x", 3.0)
    assert(out.count() == 100)
  }

  test("compareFrames classifies only_a/only_b/same/diff") {
    val a = Seq((1L, "x", 10.0), (2L, "y", 20.0), (3L, "z", 30.0))
      .toDF("k", "s", "v")
    val b = Seq((2L, "y", 20.0), (3L, "z", 99.0), (4L, "w", 40.0))
      .toDF("k", "s", "v")
    val out = SetOps.compareFrames(a, b, Seq("k"), Seq("s", "v"))
      .select("k", "status").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "only_a", 2L -> "same", 3L -> "diff",
      4L -> "only_b"))
  }

  test("indexBasedSelector aligns frames to the reference key set") {
    val ref = Seq((1L, "x"), (2L, "y")).toDF("k", "r")
    val a = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "va")
    val b = Seq((2L, "bb"), (4L, "dd")).toDF("k", "vb")
    val Seq(aa, ba) = Joins.indexBasedSelector(Seq(a, b), ref, "k")
    assert(aa.select("k").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
    assert(ba.select("k").as[Long].collect().toSeq === Seq(2L))
    // schema untouched: a semi-join never widens
    assert(aa.columns.toSeq === Seq("k", "va"))
    // raise mode: ref key 1 is missing from b
    intercept[IllegalArgumentException] {
      Joins.indexBasedSelector(Seq(b), ref, "k", onMissing = "raise")
    }
    // raise mode passes when every ref key is present
    val Seq(ok) = Joins.indexBasedSelector(Seq(a), ref, "k", onMissing = "raise")
    assert(ok.count() === 2L)
  }
}
