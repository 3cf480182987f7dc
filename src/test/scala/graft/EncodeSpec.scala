package graft

import org.apache.spark.sql.functions._
import graft.core.{Tables => T}
import graft.encode.{BoxCox, Encoders => E}

class EncodeSpec extends SparkSpec {
  import spark.implicits._

  test("BoxCox.fit picks log (λ=0) for log-normal data") {
    val rnd = new scala.util.Random(42)
    val df = Seq.fill(5000)(math.exp(rnd.nextGaussian())).toDF("x")
    val lambda = BoxCox.fit(df, "x")
    assert(lambda == 0.0)
  }

  test("BoxCox.fit picks λ≈1 for already-normal positive data") {
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(5000)(100.0 + 5 * rnd.nextGaussian()).toDF("x")
    val lambda = BoxCox.fit(df, "x")
    assert(lambda == 1.0 || lambda == 1.5) // flat around 1 for σ≪μ
  }

  test("minmaxScale maps extremes to exactly 0 and 1") {
    val out = E.minmaxScale(T.orders(spark, sf), "o_totalprice", "s")
    val r = out.agg(min("s"), max("s")).head
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 1.0)
  }

  test("labelEncode is dense, 0-based, alphabetical") {
    val out = E.labelEncode(T.orders(spark, sf), "o_orderpriority", "l")
    val pairs = out.select("o_orderpriority", "l").distinct()
      .as[(String, Int)].collect().sortBy(_._2)
    assert(pairs.map(_._1).toSeq == pairs.map(_._1).sorted.toSeq)
    assert(pairs.map(_._2).toSeq == pairs.indices.toSeq)
  }

  test("oneHot rows have exactly one indicator set") {
    val cats = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val out = E.oneHot(T.orders(spark, sf), "o_orderpriority", cats, "p")
    val sums = out.select(cats.map(c => col(s"p_$c")).reduce(_ + _).as("s"))
    assert(sums.filter(col("s") =!= 1).count() == 0)
  }

  test("frequencyEncode counts match groupBy counts") {
    val out = E.frequencyEncode(T.orders(spark, sf), "o_orderpriority", "f")
    val viaEncode = out.select("o_orderpriority", "f").distinct()
      .as[(String, Long)].collect().toMap
    val direct = T.orders(spark, sf).groupBy("o_orderpriority").count()
      .as[(String, Long)].collect().toMap
    assert(viaEncode == direct)
  }
}
