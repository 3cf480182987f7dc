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

  test("case conversions match reference semantics") {
    import graft.text.TextFns
    val df = Seq("Hello World-Example", "someCamelCase").toDF("t")
    val out = df.select(
      TextFns.toSnakeCase(col("t")).as("s"),
      TextFns.toCamelCase(col("t")).as("c"),
      TextFns.capitalizeFirst(lower(col("t"))).as("f")).collect()
    assert(out(0).getString(0) == "hello_world_example")
    assert(out(0).getString(1) == "helloWorldExample")
    assert(out(0).getString(2) == "Hello world-example")
    assert(out(1).getString(0) == "some_camel_case")
  }

  test("batches partition the frame disjointly and completely") {
    val ord = T.orders(spark, sf)
    val bs = graft.rel.Sampling.batches(ord, 4)
    assert(bs.map(_.count()).sum == ord.count())
    assert(bs.length == 4)
  }

  test("Reports.audit summarizes nulls and distincts in one pass") {
    import graft.core.Reports
    val df = Seq((1, Some("a")), (2, None), (3, Some("b"))).toDF("id", "s")
    val rep = Reports.audit(df)
    assert(rep.nRows == 3)
    val sCol = rep.columns.find(_.name == "s").get
    assert(sCol.nNull == 1 && math.abs(sCol.nullRatio - 1.0 / 3) < 1e-9)
    assert(rep.render.contains("AuditReport: 3 rows"))
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

  test("GfFrame alignTo and tvFilter compose fluently") {
    val ref = Seq((1L, "a"), (3L, "b")).toDF("k", "tag")
    val aligned = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
      .graft.alignTo(ref, "k").result
    assert(aligned.select("k").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
    val smoothed = Seq((1L, 0L, 1.0), (1L, 1L, 1.1), (1L, 2L, 9.0))
      .toDF("k", "t", "v")
      .graft.tvFilter("k", "t", "v").result
    assert(smoothed.columns.contains("ama"))
    assert(smoothed.count() === 3L)
  }

  test("fluent tvFilter with tieCol is deterministic on duplicate timestamps") {
    // two rows share t=1; tieCol fixes their fold order, so the result
    // must equal the driver-side recursion over (t, tie)-sorted values
    val rows = Seq((1L, 0L, 1L, 2.0), (1L, 1L, 2L, 8.0), (1L, 1L, 1L, 4.0),
      (1L, 2L, 1L, 6.0))
    val df = rows.toDF("k", "t", "seq", "v").repartition(7)
    val got = df.graft.tvFilter("k", "t", "v", tieCol = "seq").result
      .orderBy("t", "v").select("ama").as[Double].collect()
    val ordered = rows.sortBy(r => (r._2, r._3)).map(_._4)
    var ama = ordered.head; var pv = ordered.head
    val expected = ordered.head +: ordered.tail.map { v =>
      val w = math.min(0.1 * (1 + math.abs(v - pv)), 1.0)
      ama = w * v + (1 - w) * ama; pv = v; ama
    }
    // output sorted by (t, v): rows (t=0,v=2), (t=1,v=4), (t=1,v=8), (t=2,v=6)
    // map to fold positions: v=2 -> e0, v=4 -> e1, v=8 -> e2, v=6 -> e3
    val byValue = rows.sortBy(r => (r._2, r._4))
      .map(r => expected(rows.sortBy(x => (x._2, x._3)).indexWhere(_ == r)))
    assert(got.length == 4)
    got.zip(byValue).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
  }
}
