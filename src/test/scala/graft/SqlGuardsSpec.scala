package graft

import org.apache.spark.sql.functions._
import graft.core.{Tables => T}
import graft.sql.SqlGuards

class SqlGuardsSpec extends SparkSpec {
  import spark.implicits._

  private def guards = new SqlGuards(spark)
    .fit(T.orders(spark, sf), "g_orders")

  test("plan guards reject queries without the claimed intent") {
    val g = guards
    // a string literal containing 'JOIN' passes the reference's regex
    // but not a plan check
    intercept[IllegalArgumentException] {
      g.joinTables("SELECT 'JOIN me' AS s FROM g_orders")
    }
    intercept[IllegalArgumentException] {
      g.aggregate("SELECT o_orderkey FROM g_orders")
    }
    intercept[IllegalArgumentException] {
      g.windowFunctions("SELECT o_orderkey FROM g_orders")
    }
    intercept[IllegalArgumentException] {
      g.subqueries("SELECT o_orderkey FROM g_orders")
    }
  }

  test("plan guards accept genuine intents") {
    val g = guards
    assert(g.aggregate("SELECT COUNT(*) AS n FROM g_orders").head.getLong(0) > 0)
    assert(g.subqueries(
      "WITH t AS (SELECT o_custkey FROM g_orders) SELECT COUNT(*) c FROM t")
      .head.getLong(0) > 0)
    assert(g.subqueries(
      """SELECT COUNT(*) c FROM g_orders
        |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM g_orders)""".stripMargin)
      .head.getLong(0) > 0)
  }

  test("redefineView maps DML to view redefinition") {
    val g = guards
    g.redefineView("g_orders",
      "SELECT * FROM g_orders WHERE o_orderpriority != '5-LOW'")
    val left = spark.sql("SELECT COUNT(*) FROM g_orders").head.getLong(0)
    val direct = T.orders(spark, sf)
      .filter(col("o_orderpriority") =!= "5-LOW").count()
    assert(left == direct)
  }
}
