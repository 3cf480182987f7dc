package graft

import org.apache.spark.sql.functions._
import graft.datasets.Make

class MakeSpec extends SparkSpec {
  import spark.implicits._

  test("makeRegression: deterministic, informative features carry the signal") {
    val df = Make.makeRegression(spark, 2000, nFeatures = 4,
      nInformative = 2, noise = 0.1, bias = 3.0, seed = 7L)
    assert(df.columns.toSeq == Seq("id", "x0", "x1", "x2", "x3", "y"))
    assert(df.count() == 2000)
    // same seed regenerates bit-identically regardless of partitioning
    val again = Make.makeRegression(spark, 2000, nFeatures = 4,
      nInformative = 2, noise = 0.1, bias = 3.0, seed = 7L).repartition(7)
    assert(df.exceptAll(again).count() == 0 && again.exceptAll(df).count() == 0)
    // informative |corr| high, noise feature ~0
    def corr2(c: String): Double =
      df.agg(corr(col(c), col("y"))).head().getDouble(0)
    assert(math.abs(corr2("x0")) > 0.1)
    assert(math.abs(corr2("x1")) > 0.5) // weight -4 dominates
    assert(math.abs(corr2("x3")) < 0.1)
    // OLS on the dominant feature recovers sign and magnitude order
    val b = df.agg((covar_samp($"x1", $"y") / var_samp($"x1")).as("b"))
      .head().getDouble(0)
    assert(b < -3.0 && b > -5.0, s"slope $b")
  }

  test("makeClassification: hypercube classes are separable, flipY injects label noise") {
    val df = Make.makeClassification(spark, 4000, nFeatures = 6,
      nClasses = 4, nInformative = 3, nRedundant = 2,
      classSep = 3.0, flipY = 0.0, seed = 11L).persist()
    assert(df.columns.toSeq ==
      Seq("id", "x0", "x1", "x2", "x3", "x4", "x5", "label"))
    assert(df.select("label").distinct().count() == 4)
    // with sep=3 and no flips, the nearest-vertex rule classifies
    // almost perfectly: sign of each informative feature = vertex bit
    val vertexRule = (0 until 3).map(j =>
      when(col(s"x$j") > 0, 1 << j).otherwise(0)).reduce(_ + _)
    val acc = df.withColumn("_pred", vertexRule % 4)
      .agg(avg(when(col("_pred") === col("label"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    df.unpersist()
    assert(acc > 0.95, s"vertex-rule accuracy $acc")
    // flipY=0.3 must visibly corrupt labels vs flipY=0
    val noisy = Make.makeClassification(spark, 4000, nFeatures = 6,
      nClasses = 4, nInformative = 3, nRedundant = 2,
      classSep = 3.0, flipY = 0.3, seed = 11L)
    val accNoisy = noisy.withColumn("_pred", vertexRule % 4)
      .agg(avg(when(col("_pred") === col("label"), 1.0).otherwise(0.0)))
      .head().getDouble(0)
    assert(accNoisy < acc - 0.15, s"flip did nothing: $accNoisy vs $acc")
  }

  test("makeData: mixed schema, nan fraction, bounded categories") {
    val df = Make.makeData(spark, 3000, nanPct = 0.2, seed = 3L).persist()
    assert(df.columns.toSeq ==
      Seq("id", "value", "maybe_value", "category", "event_date"))
    val nullFrac = df.filter(col("maybe_value").isNull).count() / 3000.0
    assert(nullFrac > 0.15 && nullFrac < 0.25, s"null fraction $nullFrac")
    assert(df.select("category").distinct().count() == 4)
    val dateRange = df.agg(min("event_date"), max("event_date")).head()
    assert(dateRange.getDate(0).toString >= "2024-01-01")
    assert(dateRange.getDate(1).toString <= "2024-12-31")
    df.unpersist()
  }

  test("makeSeries: per-series seasonality is recoverable") {
    val df = Make.makeSeries(spark, nSeries = 5, length = 240,
      period = 24, noise = 0.01, seed = 5L)
    assert(df.count() == 5 * 240)
    // seasonal self-similarity: y(t) correlates with y(t+period) far
    // more than with y(t+period/2) once the trend is removed per series
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("series_id").orderBy("t")
    val lagged = df
      .withColumn("_d", col("y") - avg("y").over(
        w.rowsBetween(-12, 12))) // crude detrend
      .withColumn("_dp", lag("_d", 24).over(w))
      .withColumn("_dh", lag("_d", 12).over(w))
      .filter(col("_dp").isNotNull && col("_dh").isNotNull)
    val r = lagged.agg(corr($"_d", $"_dp").as("same"),
      corr($"_d", $"_dh").as("anti")).head()
    assert(r.getDouble(0) > 0.8, s"period corr ${r.getDouble(0)}")
    assert(r.getDouble(1) < 0.0, s"half-period corr ${r.getDouble(1)}")
  }

  test("makeBlobs: deterministic, clusters are recoverable from geometry") {
    val df = Make.makeBlobs(spark, 3000, nCenters = 3, dim = 2,
      std = 1.0, seed = 42L).persist()
    assert(df.columns.toSeq == Seq("id", "cluster", "x0", "x1"))
    assert(df.count() == 3000)
    val again = Make.makeBlobs(spark, 3000, nCenters = 3, dim = 2,
      std = 1.0, seed = 42L).repartition(5)
    assert(df.exceptAll(again).count() == 0 && again.exceptAll(df).count() == 0)
    // empirical centers = per-cluster means; >= 95% of rows must sit
    // nearer their OWN center than any other (unit gaussians around
    // centers in a 20-wide box are near-separated for almost any seed)
    val centers = df.groupBy("cluster")
      .agg(avg("x0").as("c0"), avg("x1").as("c1"))
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    assert(centers.size == 3, "a center hashed to an empty cluster")
    val rows = df.select("cluster", "x0", "x1")
      .as[(Int, Double, Double)].collect()
    val pure = rows.count { case (c, x0, x1) =>
      val nearest = centers.minBy { case (_, (c0, c1)) =>
        (x0 - c0) * (x0 - c0) + (x1 - c1) * (x1 - c1) }._1
      nearest == c
    }
    df.unpersist()
    assert(pure.toDouble / rows.length >= 0.95,
      s"cluster purity ${pure.toDouble / rows.length}")
  }

  test("makeWalk: multiplicative walk is deterministic, step-bounded, cumsum-consistent") {
    val df = Make.makeWalk(spark, nSeries = 8, length = 300,
      vol = 0.01, basePrice = 100.0, seed = 13L).persist()
    assert(df.columns.toSeq == Seq("series_id", "t", "ret", "price"))
    assert(df.count() == 8 * 300)
    val again = Make.makeWalk(spark, nSeries = 8, length = 300,
      vol = 0.01, basePrice = 100.0, seed = 13L).repartition(7)
    assert(df.exceptAll(again).count() == 0 && again.exceptAll(df).count() == 0)
    // each step multiplies by 1 + 0.01·g with |g| < 9.2: consecutive
    // prices stay within a ±10% band and the path stays positive
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("series_id").orderBy("t")
    val steps = df.withColumn("_prev", lag("price", 1).over(w))
      .filter(col("_prev").isNotNull)
      .select((col("price") / col("_prev")).as("r"))
      .agg(min("r"), max("r")).head()
    assert(steps.getDouble(0) > 0.9 && steps.getDouble(1) < 1.1,
      s"step ratio range ${steps.getDouble(0)}..${steps.getDouble(1)}")
    assert(df.agg(min("price")).head().getDouble(0) > 0.0)
    // the walk actually wanders: end-of-path dispersion across series
    // exceeds the single-step band
    val ends = df.filter(col("t") === 299).agg(
      (max("price") - min("price")).as("spread")).head().getDouble(0)
    df.unpersist()
    assert(ends > 2.0, s"terminal spread $ends")
  }

  test("makeText: variable-length vocab-sampled corpus feeds the text pipeline") {
    val df = Make.makeText(spark, 2000, minWords = 3, maxWords = 20,
      seed = 17L).persist()
    assert(df.columns.toSeq == Seq("id", "platform", "n_words", "text"))
    val again = Make.makeText(spark, 2000, minWords = 3, maxWords = 20,
      seed = 17L).repartition(5)
    assert(df.exceptAll(again).count() == 0 && again.exceptAll(df).count() == 0)
    val nw = df.agg(min("n_words"), max("n_words")).head()
    assert(nw.getInt(0) >= 3 && nw.getInt(1) <= 20)
    // text splits back to exactly n_words tokens, all from the vocab
    val toks = df.withColumn("_tk", split(col("text"), " "))
    assert(toks.filter(size(col("_tk")) =!= col("n_words")).count() == 0)
    val vocab = Make.TextVocab.toSet
    val alien = toks.select(explode(col("_tk")).as("w"))
      .filter(!col("w").isin(vocab.toSeq: _*)).count()
    assert(alien == 0, s"$alien words outside the vocabulary")
    assert(df.select("platform").distinct().count() == 4)
    // the generated corpus runs through the quality scorer end-to-end
    val q = graft.text.Quality.qualityScores(df, "text")
    assert(q.count() == 2000)
    df.unpersist()
  }

  test("makeDynamics: closed-form invariants hold row by row") {
    val df = Make.makeDynamics(spark, 1000, seed = 19L).persist()
    assert(df.count() == 1000)
    // tanh response bounded, stability = 1 - |response - linear|,
    // power = effort^2 exactly
    assert(df.filter(abs(col("response_output")) > 1.0).count() == 0)
    val bad = df.filter(
      abs(col("power_consumption") -
        col("control_effort") * col("control_effort")) > 1e-12 ||
      abs(col("stability_metric") -
        (lit(1.0) - abs(col("response_output") - col("linear_output"))))
        > 1e-12).count()
    assert(bad == 0)
    // the sinusoidal input dominates the noise: amplitude recovered
    val amp = df.agg(max("input_signal"), min("input_signal")).head()
    assert(amp.getDouble(0) > 0.8 && amp.getDouble(1) < -0.8)
    val again = Make.makeDynamics(spark, 1000, seed = 19L).repartition(3)
    assert(df.exceptAll(again).count() == 0 && again.exceptAll(df).count() == 0)
    df.unpersist()
  }

  test("makeSeries feeds the ts family: ACF peaks at the period and " +
      "classical decomposition recovers the seasonal amplitude") {
    val df = Make.makeSeries(spark, nSeries = 4, length = 240,
      period = 24, noise = 0.1, seed = 9L)
    val order = Seq(col("t"))
    val a = graft.ts.Temporal.acf(df, "y", Seq(12, 24), Seq("series_id"), order)
    // detrended by the ACF's internal moments? no — the raw series has
    // a trend, so compare lag-24 vs lag-12 per series instead of an
    // absolute bar: seasonality must make the full-period lag beat the
    // half-period lag for every series
    val rows = a.select("series_id", "acf12", "acf24")
      .as[(Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (sid, h, f) =>
      assert(f > h, s"series $sid: acf24 $f should beat acf12 $h")
    }
    val dec = graft.ts.Temporal.decomposeClassical(df, "y", 24,
      Seq("series_id"), order)
    // the generator's seasonal term is amp·sin(2πt/24) with amp up to
    // 20; the recovered per-series seasonal range must be ≈ 2·amp.
    // The residual carries noise PLUS the 25-point-MA phase leakage of
    // a period-24 sinusoid (∝ amp, ~8% of it empirically), so the
    // bound is leakage-aware, not the bare noise level.
    val stats = dec.groupBy("series_id").agg(
        (max("seasonal") - min("seasonal")).as("srange"),
        stddev(col("y") - col("trend") - col("seasonal")).as("rsd"))
      .as[(Long, Double, Double)].collect()
    stats.foreach { case (sid, srange, rsd) =>
      assert(srange > 1.0, s"series $sid seasonal range $srange")
      assert(rsd < 0.5 + srange / 8.0,
        s"series $sid residual sd $rsd vs seasonal range $srange")
    }
  }

  test("makeDomain: entity-period grid shape, field ranges, determinism") {
    import graft.datasets.Make
    val df = Make.makeDomain(spark, Seq("a", "b", "c"), "shop", 10, "day",
      5L, Seq(Make.NumField("sales", 100.0, 200.0),
        Make.IntRangeField("visits", 10L, 50L),
        Make.CatField("tier", Seq("gold", "silver"))), seed = 9L)
    assert(df.count() == 30)
    // every (entity, period) cell present exactly once
    assert(df.select("shop", "day").distinct().count() == 30)
    assert(df.agg(min("day"), max("day")).as[(Long, Long)].head() == ((5L, 14L)))
    val bad = df.filter(col("sales") < 100.0 || col("sales") >= 200.0 ||
      col("visits") < 10 || col("visits") >= 50 ||
      !col("tier").isin("gold", "silver")).count()
    assert(bad == 0)
    val again = Make.makeDomain(spark, Seq("a", "b", "c"), "shop", 10, "day",
      5L, Seq(Make.NumField("sales", 100.0, 200.0),
        Make.IntRangeField("visits", 10L, 50L),
        Make.CatField("tier", Seq("gold", "silver"))), seed = 9L)
    assert(df.orderBy("shop", "day").collect().toSeq ==
      again.orderBy("shop", "day").collect().toSeq)
    // portable and fast hash families share the schema
    val portable = Make.makeDomain(spark, Seq("a"), "shop", 2, "day", 0L,
      Seq(Make.NumField("sales", 0.0, 1.0)), portableHash = true)
    assert(portable.schema == df.select("shop", "day", "sales").schema)
  }

  test("domain presets: demo/sales/medical shapes and plausible ranges") {
    import graft.datasets.Make
    val demo = Make.makeAfricanDemo(spark)
    assert(demo.count() == 7L * 61)
    assert(demo.filter(col("birth_rate") < 20.0 ||
      col("birth_rate") >= 50.0 || col("population") < 1000000L).count() == 0)
    val sales = Make.makeGadgetSales(spark)
    assert(sales.count() == 5L * 120)
    assert(sales.select("region").distinct().count() == 4)
    val med = Make.makeMedicalDiagnosis(spark, nPatients = 200)
    assert(med.count() == 200)
    assert(med.filter(col("age") < 18 || col("age") >= 90 ||
      col("temperature_c") < 36.0 || col("temperature_c") >= 41.5).count() == 0)
    assert(med.select("diagnosis").distinct().count() == 4)
  }

  test("makeSounding: point-layer grid with monotone depth and bounded fields") {
    val df = graft.datasets.Make.makeSounding(spark, nPoints = 40,
      nLayers = 6, seed = 7L)
    assert(df.count() == 240)
    // depth strictly increases with layer within each point (each
    // thickness is >= 1 m), and every thickness is < 10 m
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("point_id").orderBy("layer")
    val steps = df.withColumn("_prev", lag(col("depth_m"), 1, 0.0).over(w))
      .select((col("depth_m") - col("_prev")).as("thick"))
      .as[Double].collect()
    assert(steps.forall(t => t >= 1.0 && t < 10.0),
      s"thickness out of [1,10): ${steps.filterNot(t => t >= 1.0 && t < 10.0).take(3).mkString(",")}")
    // log-uniform resistivity in [10, 1000); velocity positive, rising
    // family with layer
    val bad = df.filter(col("resistivity_ohm_m") < 10.0 ||
      col("resistivity_ohm_m") >= 1000.0 ||
      col("velocity_m_s") < 500.0).count()
    assert(bad == 0)
    // deterministic for the same seed
    val again = graft.datasets.Make.makeSounding(spark, nPoints = 40,
      nLayers = 6, seed = 7L)
    assert(df.orderBy("point_id", "layer").collect().toSeq ==
      again.orderBy("point_id", "layer").collect().toSeq)
  }

  test("makeErp / makeRetailStore: derived affine coords, clipped " +
      "norm/exp draws, binary response") {
    import graft.datasets.Make
    val erp = Make.makeErp(spark, nSamples = 300L).persist()
    // easting/northing are the reference's simplified affine of the
    // rounded lon/lat; position is 1-based sequential
    val e = erp.orderBy("position").collect()
    e.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(4) == i + 1L)
      assert(r.getDouble(0) ==
        math.rint((r.getDouble(2) - (-118.5)) * 100000.0 * 1e6) / 1e6)
      assert(r.getDouble(3) >= 34.0 && r.getDouble(3) < 36.0)
      val st = r.getLong(5); assert(st >= 1 && st < 10)
    }
    val rs = Make.makeRetailStore(spark, nSamples = 500L).persist()
    val stats = rs.agg(
      min("income"), max("income"), min("last_purchase_amount"),
      max("last_purchase_amount"), countDistinct("preferred_category"),
      sum("likely_to_respond"), count(lit(1))).head()
    assert(stats.getDouble(0) >= 20000.0 && stats.getDouble(1) <= 100000.0)
    assert(stats.getDouble(2) >= 10.0 && stats.getDouble(3) <= 500.0)
    assert(stats.getLong(4) === 5L)
    // the binary target is non-degenerate: some respond, some don't
    val yes = stats.getLong(5)
    assert(yes > 0 && yes < stats.getLong(6))
    // portable and fast hash families share shape and determinism
    val p1 = Make.makeRetailStore(spark, 100L, portableHash = true)
    val p2 = Make.makeRetailStore(spark, 100L, portableHash = true)
    assert(p1.collect().toSeq == p2.collect().toSeq)
  }

  test("makeWellLogging / makeMiningOps / makeAgronomy: grid shapes and " +
      "physical ranges") {
    import graft.datasets.Make
    // np.arange semantics: [0, 200) step 0.5 -> 400 stations
    val wl = Make.makeWellLogging(spark)
    assert(wl.count() === 400L)
    assert(wl.filter($"density" < 1.95 || $"density" >= 2.95).count() === 0L)
    assert(wl.agg(min("depth"), max("depth")).as[(Double, Double)].head()
      === ((0.0, 199.5)))
    val mo = Make.makeMiningOps(spark, nSamples = 200L)
    assert(mo.select(countDistinct("ore_type")).head().getLong(0) === 8L)
    assert(mo.filter($"equipment_age" < 0 || $"equipment_age" >= 15)
      .count() === 0L)
    // agronomy: every (farm, year) cell carries each crop exactly once
    val ag = Make.makeAgronomy(spark, nFarms = 6, nYears = 3)
    assert(ag.count() === 6L * 3 * 4)
    assert(ag.groupBy("farm_id", "year").agg(
        countDistinct("crop").as("k"), count(lit(1)).as("n"))
      .filter($"k" =!= 4 || $"n" =!= 4).count() === 0L)
  }
}
