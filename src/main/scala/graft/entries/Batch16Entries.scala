package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Tables => T}
import graft.rel.Joins

/** Round-8 batch: reference-index row alignment. */
object Batch16Entries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.2 index_based_selector (gofast/core/array_manager.py:4186):
    // align the orders frame to the key set of a reference customer
    // subset — semi-join on the distinct reference keys.
    "index_align" -> ((s, dir) => {
      val ref = T.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val orders = T.orders(s, dir).withColumnRenamed("o_custkey", "c_custkey")
      val Seq(aligned) =
        Joins.indexBasedSelector(Seq(orders), ref, "c_custkey")
      aligned.select("o_orderkey", "c_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "index_align" ->
      """SELECT o_orderkey, o_custkey AS c_custkey, o_totalprice
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin
  )
}
