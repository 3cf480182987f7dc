package graft

import org.apache.spark.sql.functions._
import graft.core.{Exact, Tables => T}
import graft.rel.Aggregates

class AggregatesSpec extends SparkSpec {

  test("smart_group: groupBy+agg+having+sort produces Q1-shaped result") {
    val out = SparkEntry.queries("smart_group")(spark, sf).collect()
    assert(out.nonEmpty)
    val schema = SparkEntry.queries("smart_group")(spark, sf).schema
    assert(schema.fieldNames.toSeq == Seq("l_returnflag", "l_linestatus",
      "sum_qty", "sum_base_price", "sum_disc_price", "avg_qty", "avg_price",
      "count_order"))
    // having: every surviving group has > 10 rows
    assert(out.forall(_.getAs[Long]("count_order") > 10))
    // sorted by keys
    val keys = out.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys == keys.sorted)
  }

  test("smart_group totals match a direct aggregate") {
    val li = T.lineitem(spark, sf)
    val direct = li.agg(Exact.dsum(col("l_quantity"))).head.getDouble(0)
    val viaGroups = SparkEntry.queries("smart_group")(spark, sf)
      .agg(sum("sum_qty")).head.getDouble(0)
    // having>10 keeps all 6 groups at this sf, so totals must agree exactly
    assert(math.abs(direct - viaGroups) < 1e-9)
  }

  test("binningStatistic bins cover the domain and count all rows") {
    val ev = T.events(spark, sf)
    val out = Aggregates.binningStatistic(ev, "value", "value", 0.0, 10.0)
    val total = out.agg(sum("count_y")).head.getDouble(0)
    assert(total == ev.count().toDouble)
  }

  test("uniqueStats counts distincts in one pass") {
    val ev = T.events(spark, sf)
    val r = Aggregates.uniqueStats(ev, Seq("event_type", "user_id")).head()
    assert(r.getAs[Long]("event_type_distinct") == 5)
    assert(r.getAs[Long]("n_rows") == ev.count())
  }
}
