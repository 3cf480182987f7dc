package graft

import org.apache.spark.sql.functions._
import graft.core.{Tables => T}
import graft.ts.{Temporal, Windows}

class TsSpec extends SparkSpec {
  import spark.implicits._

  private def series(vals: Seq[Double]) =
    vals.zipWithIndex.map { case (v, i) => (1, i.toLong, v) }.toDF("g", "t", "v")

  test("lagFeatures shifts within partitions only") {
    val df = Seq((1, 1L, 10.0), (1, 2L, 20.0), (2, 1L, 30.0)).toDF("g", "t", "v")
    val out = Windows.lagFeatures(df, "v", Seq(1), Seq("g"), Seq(col("t")))
      .orderBy("g", "t").select("v_lag1").as[Option[Double]].collect().toSeq
    assert(out == Seq(None, Some(10.0), None)) // no leak across partitions
  }

  test("movingAverage equals arithmetic mean of trailing window") {
    val out = Windows.movingAverage(series(Seq(1, 2, 3, 4, 5).map(_.toDouble)),
        "v", 3, Seq("g"), Seq(col("t")), "ma")
      .orderBy("t").select("ma").as[Double].collect().toSeq
    assert(out == Seq(1.0, 1.5, 2.0, 3.0, 4.0))
  }

  test("difference telescopes back to cumulative sum") {
    val df = series(Seq(3.0, 7.0, 12.0, 20.0))
    val d = Windows.difference(df, "v", 1, Seq("g"), Seq(col("t")), "d1")
    val total = d.agg(sum("d1")).head.getDouble(0)
    assert(total == 20.0 - 3.0)
  }

  test("averageRank matches pandas method='average' on ties") {
    val df = Seq((1, 10.0), (1, 10.0), (1, 20.0)).toDF("g", "v")
    val out = Windows.averageRank(df, Seq("g"), "v")
      .orderBy("v").select("avg_rank").as[Double].collect().toSeq
    assert(out == Seq(1.5, 1.5, 3.0))
  }

  test("trendOls recovers an exact linear trend") {
    val df = series((1 to 50).map(i => 2.5 * i + 7.0))
    val r = Temporal.trendOls(df, "v", Seq("g"), Seq(col("t"))).head
    assert(math.abs(r.getAs[Double]("slope") - 2.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - 7.0) < 1e-9)
  }

  test("acf of a constant-increment series is ~1 at lag 1") {
    val df = series((1 to 100).map(_.toDouble))
    val r = Temporal.acf(df, "v", Seq(1), Seq("g"), Seq(col("t"))).head
    assert(r.getAs[Double]("acf1") > 0.99)
  }

  test("decomposeClassical: components sum back to the value") {
    val period = 4
    val vals = (0 until 64).map(i => 10.0 + 0.5 * i + Seq(3.0, -1.0, -2.0, 0.0)(i % period))
    val out = Temporal.decomposeClassical(series(vals), "v", period,
      Seq("g"), Seq(col("t")))
    val bad = out.filter(col("trend").isNotNull && col("seasonal").isNotNull &&
      abs(col("v") - (col("trend") + col("seasonal") + col("resid"))) > 1e-9)
    assert(bad.count() == 0)
    // seasonal should pick up the injected period-4 pattern's shape
    val seas = out.filter(col("t") >= period && col("t") < 2 * period)
      .orderBy("t").select("seasonal").as[Double].collect()
    assert(seas.max - seas.min > 2.0)
  }

  test("TsValidate.prepare parses strings and drops unparseable rows") {
    import graft.ts.TsValidate
    val df = Seq("2024-01-01 10:00:00", "garbage", "2024-01-02 11:30:00")
      .toDF("ts").withColumn("v", lit(1.0))
    val out = TsValidate.prepare(df, "ts")
    assert(out.count() == 2)
    assert(out.schema("ts").dataType.typeName == "timestamp")
  }

  test("TsValidate.regularityReport infers the modal gap") {
    import graft.ts.TsValidate
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (0 until 20).map(i =>
      (1L, new java.sql.Timestamp(base + i * 60000L))) // 1-minute grid
    val df = rows.toDF("k", "ts")
    val rep = TsValidate.regularityReport(df, "ts", Seq("k")).head
    assert(rep.getAs[Long]("n") == 20)
    assert(rep.getAs[Long]("n_distinct_ts") == 20)
    assert(rep.getAs[Long]("modal_gap_us") == 60L * 1000000)
  }

  test("detrend removes an exact linear trend") {
    val df = (1 to 60).map(i => (1, i.toLong, 3.0 * i + 5.0)).toDF("g", "t", "v")
    val out = Temporal.detrend(df, "v", Seq("g"), Seq(col("t")), "d")
    assert(out.agg(max(abs(col("d")))).head.getDouble(0) < 1e-9)
  }

  test("sessionize splits on gaps and numbers sessions per user") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def ts(min: Long) = new java.sql.Timestamp(base + min * 60000)
    val df = Seq((1L, ts(0), 1L), (1L, ts(10), 2L), (1L, ts(120), 3L),
                 (2L, ts(0), 4L)).toDF("user_id", "ts", "event_id")
    val out = Temporal.sessionize(df, "ts", Seq("user_id"), 1800,
        Seq(col("event_id")))
      .orderBy("event_id").select("session_id").as[Long].collect().toSeq
    assert(out == Seq(1, 1, 2, 1)) // 2h gap starts session 2
  }

  test("dropKeepLatest keeps the most recent row per key") {
    import graft.clean.Duplicates
    val df = Seq((1, 10L, "old"), (1, 20L, "new"), (2, 5L, "only"))
      .toDF("k", "t", "v")
    val out = Duplicates.dropKeepLatest(df, Seq("k"), "t")
      .orderBy("k").select("v").as[String].collect().toSeq
    assert(out == Seq("new", "only"))
  }

  test("elementWise adds aligned frames by key") {
    import graft.rel.SetOps
    val a = Seq((1, 10.0), (2, 20.0)).toDF("k", "x")
    val b = Seq((1, 1.0), (2, 2.0)).toDF("k", "x")
    val out = SetOps.elementWise(a, b, Seq("k"), Seq("x"), _ + _)
      .orderBy("k").select("x").as[Double].collect().toSeq
    assert(out == Seq(11.0, 22.0))
  }

  test("resample daily covers every event exactly once") {
    val ev = T.events(spark, sf)
    val out = Temporal.resample(ev, "ts", "day", Seq(count(lit(1)).as("n")))
    assert(out.agg(sum("n")).head.getLong(0) == ev.count())
  }
}
