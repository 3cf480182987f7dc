package graft

import org.apache.spark.sql.functions._
import graft.core.GfFrame._
import graft.core.{Tables => T}
import graft.stats.{Correlation, Survival}
import graft.ts.Interpolate

class MoreSpec extends SparkSpec {
  import spark.implicits._

  test("linear interpolation fills interior gaps exactly, edges nearest") {
    val df = Seq((1, 1L, Some(10.0)), (1, 2L, None), (1, 3L, None),
                 (1, 4L, Some(40.0)), (1, 5L, None),
                 (2, 1L, None), (2, 2L, Some(7.0))).toDF("g", "t", "v")
    val out = Interpolate.linear(df, "v", Seq("g"), Seq(col("t")), "vi")
      .orderBy("g", "t").select("vi").as[Double].collect().toSeq
    assert(out == Seq(10.0, 20.0, 30.0, 40.0, 40.0, 7.0, 7.0))
  }

  test("correlatedToDrop prunes one of a perfectly-correlated pair") {
    val df = (1 to 200).map(i => (i.toDouble, i * 2.0, math.sin(i.toDouble) * 50))
      .toDF("a", "b", "c")
    val drops = Correlation.correlatedToDrop(df, Seq("a", "b", "c"), 0.95)
    assert(drops == Seq("b")) // greedy keeps 'a', drops its twin
    assert(Correlation.dropCorrelated(df, Seq("a", "b", "c"), 0.95)
      .columns.toSeq == Seq("a", "c"))
  }

  test("kaplanMeier survival is monotone nonincreasing from 1") {
    val df = Seq((1.0, true), (2.0, true), (2.0, false), (3.0, true),
                 (4.0, false)).toDF("dur", "ev")
    val s = Survival.kaplanMeier(df, "dur", col("ev") === true)
      .orderBy("t").select("surv").as[Double].collect().toSeq
    assert(s.head <= 1.0 + 1e-12)
    assert(s.zip(s.tail).forall { case (a, b) => b <= a + 1e-12 })
  }

  test("GfFrame fluent chain composes into one lazy plan") {
    val out = T.lineitem(spark, sf).graft
      .filterExpr("l_quantity > 10")
      .fillConst(Map.empty[String, Any])
      .smartGroup(Seq("l_returnflag"),
        Seq(count(lit(1)).as("n")), sortBy = Seq(col("l_returnflag")))
      .result
    val rows = out.as[(String, Long)].collect()
    assert(rows.nonEmpty && rows.map(_._2).forall(_ > 0))
    // one plan: filter is pushed under the aggregate by Catalyst
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("Aggregate"))
  }
}
