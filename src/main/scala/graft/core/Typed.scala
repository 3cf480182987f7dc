package graft.core

import org.apache.spark.sql.{Dataset, SparkSession}

/** Typed Dataset API at the edges (SURVEY §1.5: `Dataset[T]` where type
  * safety helps — fixtures and results; `DataFrame` where schema is
  * dynamic). Case classes mirror the driver testdata schemas.
  */
object Typed {

  case class LineItem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
                      l_linenumber: Int, l_quantity: Double,
                      l_extendedprice: Double, l_discount: Double,
                      l_tax: Double, l_returnflag: String,
                      l_linestatus: String, l_shipdate: java.sql.Timestamp)

  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                   o_totalprice: Double, o_orderdate: java.sql.Timestamp,
                   o_orderpriority: String)

  case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
                      c_acctbal: Double, c_mktsegment: String)

  case class Document(doc_id: Long, text: String, lang: String,
                      source: String, n_chars: Long)

  case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  def lineitem(s: SparkSession, dir: String): Dataset[LineItem] = {
    import s.implicits._
    Tables.lineitem(s, dir).as[LineItem]
  }

  def orders(s: SparkSession, dir: String): Dataset[Order] = {
    import s.implicits._
    Tables.orders(s, dir).as[Order]
  }

  def customers(s: SparkSession, dir: String): Dataset[Customer] = {
    import s.implicits._
    Tables.customer(s, dir).as[Customer]
  }

  def documents(s: SparkSession, dir: String): Dataset[Document] = {
    import s.implicits._
    Tables.documents(s, dir).as[Document]
  }

  def embeddings(s: SparkSession, dir: String): Dataset[Embedding] = {
    import s.implicits._
    Tables.embeddings(s, dir).as[Embedding]
  }
}
