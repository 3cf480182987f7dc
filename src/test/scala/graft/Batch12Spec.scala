package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.clean.Extras
import graft.core.{Tables => T}
import graft.io.Catalog
import graft.pipeline.Stages
import graft.stats.Regression

class Batch12Spec extends SparkSpec {
  import spark.implicits._

  test("Regression.ols recovers exact coefficients of a linear relation") {
    val df = (1 to 500).map(i => (i.toDouble, 3.0 * i + 10.0)).toDF("x", "y")
    val fit = Regression.ols(df, "y", Seq("x"))
    assert(math.abs(fit.beta(0) - 10.0) < 1e-6)
    assert(math.abs(fit.beta(1) - 3.0) < 1e-9)
    val resid = Regression.residualize(df, "y", Seq("x"), "r")
    assert(resid.agg(max(abs(col("r")))).head.getDouble(0) < 1e-6)
  }

  test("ols with two regressors separates independent effects") {
    val rnd = new scala.util.Random(4)
    val df = (1 to 2000).map { _ =>
      val a = rnd.nextGaussian(); val b = rnd.nextGaussian()
      (a, b, 2.0 * a - 5.0 * b + 1.0 + 0.01 * rnd.nextGaussian())
    }.toDF("a", "b", "y")
    val fit = Regression.ols(df, "y", Seq("a", "b"))
    assert(math.abs(fit.beta(1) - 2.0) < 0.01)
    assert(math.abs(fit.beta(2) + 5.0) < 0.01)
  }

  test("fillMode fills with most-frequent value, smallest on ties") {
    val df = Seq(Some("b"), Some("a"), Some("b"), Some("a"), None).toDF("c")
    val out = Extras.fillMode(df, "c")
    assert(out.filter(col("c").isNull).count() == 0)
    assert(out.filter(col("c") === "a").count() == 3) // tie -> 'a'
  }

  test("otsuThreshold separates a clean bimodal mixture") {
    val vals = Seq.fill(500)(10.0) ++ Seq.fill(500)(90.0)
    val t = Extras.otsuThreshold(vals.toDF("x"), "x", bins = 64)
    assert(t > 11.0 && t < 89.0)
  }

  test("augmentRows appends jittered copies deterministically") {
    val df = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v")
    val a1 = Extras.augmentRows(df, Seq("v"), sigma = 0.1, n = 2)
    val a2 = Extras.augmentRows(df, Seq("v"), sigma = 0.1, n = 2)
    assert(a1.count() == 6)
    assert(a1.exceptAll(a2).count() == 0) // same seed -> same noise
  }

  test("Typed datasets expose case-class fields") {
    import graft.core.Typed
    val li = Typed.lineitem(spark, sf)
    val total = li.filter(_.l_quantity > 45).map(_.l_extendedprice).reduce(_ + _)
    assert(total > 0)
    val docs = Typed.documents(spark, sf)
    assert(docs.filter(_.lang == "en").count() > 0)
  }

  test("Remote.requestCsv reads a file:// URL onto the driver") {
    val f = Files.createTempFile("graft_req", ".csv")
    Files.writeString(f, "a,b\n1,x\n2,y\n")
    val df = graft.io.Remote.requestCsv(spark, f.toUri.toString)
    assert(df.count() == 2 && df.columns.toSeq == Seq("a", "b"))
  }

  test("numericToCategorical casts low-cardinality numerics only") {
    val df = Seq((1, 100.5), (2, 200.5), (1, 300.5)).toDF("code", "amount")
    val out = Extras.numericToCategorical(df, maxDistinct = 2)
    assert(out.schema("code").dataType.typeName == "string")
    assert(out.schema("amount").dataType.typeName == "double")
  }

  test("gbtRegressor learns a nonlinear monotone relation") {
    val rnd = new scala.util.Random(8)
    val df = (1 to 1000).map { _ =>
      val x = rnd.nextDouble() * 10
      (x, x * x + rnd.nextGaussian())
    }.toDF("x", "y")
    val model = Stages.gbtRegressor(Seq("x"), "y", maxIter = 5).fit(df)
    val pred = model.transform(df)
    val low = pred.filter(col("x") <= 3).agg(avg("prediction")).head.getDouble(0)
    val high = pred.filter(col("x") >= 7).agg(avg("prediction")).head.getDouble(0)
    assert(high > low + 20)
  }

  test("outlierImpact reports a smaller error after trimming outliers") {
    import graft.clean.Extras
    val rnd = new scala.util.Random(2)
    val base = (1 to 500).map(i => (i.toDouble, 2.0 * i + rnd.nextGaussian()))
    val spiked = base ++ Seq((250.0, 1e6))
    val df = spiked.toDF("x", "y")
    def rmse(d: org.apache.spark.sql.DataFrame): Double = {
      val fit = graft.stats.Regression.ols(d, "y", Seq("x"))
      math.sqrt(d.withColumn("e", col("y") - fit.predictExpr)
        .agg(avg(col("e") * col("e"))).head.getDouble(0))
    }
    val (withOut, without) = Extras.outlierImpact(df, "y", rmse)
    assert(without < withOut)
  }

  test("bucketed tables join without a shuffle exchange") {
    val cat = new Catalog(spark, Files.createTempDirectory("graft_bt").toString)
    val ord = T.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = T.customer(spark, sf).select("c_custkey", "c_mktsegment")
    cat.saveBucketed("b_orders", ord, 8, Seq("o_custkey"))
    cat.saveBucketed("b_cust",
      cust.withColumnRenamed("c_custkey", "o_custkey"), 8, Seq("o_custkey"))
    val joined = spark.table("b_orders").join(spark.table("b_cust"), "o_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange"),
      s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")
  }

  test("analyze feeds row/column stats to the cost-based optimizer") {
    val cat = new Catalog(spark, Files.createTempDirectory("graft_an").toString)
    // clear any stale managed-table location from an aborted prior run
    spark.sql("DROP TABLE IF EXISTS an_orders")
    val stale = new java.io.File("spark-warehouse/an_orders")
    if (stale.exists) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles.foreach(rm); f.delete()
      }
      rm(stale)
    }
    val ord = T.orders(spark, sf).select("o_orderkey", "o_custkey")
    cat.saveBucketed("an_orders", ord, 4, Seq("o_custkey"))
    assert(cat.rowCountStat("an_orders").isEmpty) // nothing analyzed yet
    cat.analyze("an_orders", Seq("o_custkey"))
    val n = cat.rowCountStat("an_orders")
    assert(n.contains(BigInt(ord.count())))
    spark.sql("DROP TABLE IF EXISTS an_orders")
  }
}
