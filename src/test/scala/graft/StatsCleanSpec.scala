package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._
import graft.core.{Tables => T}
import graft.clean.{Missing, Outliers}
import graft.stats.{Descriptive => D, WeightedMedian}

class StatsCleanSpec extends SparkSpec {
  import spark.implicits._

  test("WeightedMedian: hand-computed case and tie behavior") {
    val wm = udaf(new WeightedMedian(),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
    // values 1,2,3 weights 1,1,2 -> cum 1,2,4; total 4; first 2*cw>=4 is v=2
    val df = Seq((1.0, 1.0), (2.0, 1.0), (3.0, 2.0)).toDF("v", "w")
    assert(df.agg(wm(col("v"), col("w"))).head.getDouble(0) == 2.0)
    // equal weights on 2 values -> lower median
    val df2 = Seq((10.0, 1.0), (20.0, 1.0)).toDF("v", "w")
    assert(df2.agg(wm(col("v"), col("w"))).head.getDouble(0) == 10.0)
  }

  test("gini is 0 for equal values and positive for skewed") {
    val eq = Seq.fill(50)(7.0).toDF("x")
    val g0 = D.gini(eq, "x").head.getDouble(0)
    assert(math.abs(g0 - (1.0 - 49.0 / 50.0) + (1.0 / 50.0)) < 1e-9 || math.abs(g0) < 0.03)
    val skewed = (Seq.fill(49)(0.01) :+ 1000.0).toDF("x")
    assert(D.gini(skewed, "x").head.getDouble(0) > 0.9)
  }

  test("modeDet breaks frequency ties by smallest value") {
    val df = Seq("b", "a", "b", "a", "c").toDF("v").withColumn("g", lit(1))
    val m = D.modeDet(df, Seq("g"), "v").head.getString(1)
    assert(m == "a") // a and b both x2 -> smallest wins
  }

  test("zscores standardize to mean 0 / sd 1") {
    val out = D.zscores(T.orders(spark, sf), "o_totalprice", "z")
    val r = out.agg(avg("z"), stddev_samp("z")).head
    assert(math.abs(r.getDouble(0)) < 1e-9)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-6)
  }

  test("ffill then bfill leaves no nulls when group has any value") {
    val df = Seq((1, 1L, Some(1.0)), (1, 2L, None), (1, 3L, None),
                 (2, 1L, None), (2, 2L, Some(5.0))).toDF("g", "t", "v")
    val f = Missing.ffill(df, "v", Seq("g"), Seq(col("t")), "vf")
    val fb = Missing.bfill(f, "vf", Seq("g"), Seq(col("t")), "vb")
    assert(fb.filter(col("vb").isNull).count() == 0)
    val got = fb.orderBy("g", "t").select("vb").as[Double].collect().toSeq
    assert(got == Seq(1.0, 1.0, 1.0, 5.0, 5.0))
  }

  test("outlier clip bounds respect IQR fences") {
    val cust = T.customer(spark, sf)
    val (lo, hi) = Outliers.iqrBounds(cust, "c_acctbal", 1.5)
    val clipped = Outliers.clip(cust, "c_acctbal", lo, hi)
    val r = clipped.agg(min("c_acctbal"), max("c_acctbal")).head
    assert(r.getDouble(0) >= lo && r.getDouble(1) <= hi)
    assert(clipped.count() == cust.count())
  }

  test("fillMean fills with the column mean") {
    val df = Seq(Some(10.0), None, Some(20.0)).toDF("x")
    val filled = Missing.fillMean(df, Seq("x"))
    assert(filled.agg(sum("x")).head.getDouble(0) == 45.0)
  }

  test("dropHighCardinality prunes id-like columns") {
    val ord = T.orders(spark, sf)
    val pruned = Missing.dropHighCardinality(ord, 0.5)
    assert(!pruned.columns.contains("o_orderkey"))
    assert(pruned.columns.contains("o_orderpriority"))
  }
}
