package graft.tools

/** Dev util: print query/oracle counts and rows-only names. */
object QueryCount {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"queries=${q.size} oracle=${o.size}")
    println("rowsOnly=" + (q -- o).toSeq.sorted.mkString(","))
    println("orphanOracle=" + (o -- q).toSeq.sorted.mkString(","))
  }
}
