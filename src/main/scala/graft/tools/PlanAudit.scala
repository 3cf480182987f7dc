package graft.tools

import org.apache.spark.sql.SparkSession

/** Scans every SparkEntry query's physical plan for scale red flags:
  * cartesian products, unpartitioned window sorts, excessive exchanges.
  * Run: sbt 'runMain graft.tools.PlanAudit <sfDir>'
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val cartesian = plan.split('\n').count(_.contains("CartesianProduct"))
        val nlj = plan.split('\n').count(_.contains("BroadcastNestedLoopJoin"))
        val exchanges = plan.split('\n').count(_.contains("Exchange"))
        val globalSortWindows = plan.split('\n')
          .count(l => l.contains("Window") && l.contains("windowspecdefinition()"))
        // dedup/LSH pair queries MUST join keyed on their band/bucket
        // column — a degenerated self-join would still return correct
        // rows while scanning n², so only a plan check can catch it
        val bandJoinMissing =
          (name.contains("minhash_pairs") || name.contains("simhash_pairs") ||
            name.contains("lsh_cosine_join")) &&
          !plan.split('\n').exists(l =>
            l.matches(".*(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)" +
              ".*(_band_a|_bucket_a).*"))
        val flags = Seq(
          if (cartesian > 0) s"CARTESIAN=$cartesian" else "",
          if (nlj > 0) s"NLJ=$nlj" else "",
          if (bandJoinMissing) "NOBANDJOIN" else "",
          if (exchanges > 6) s"EXCHANGES=$exchanges" else "").filter(_.nonEmpty)
        println(f"$name%-22s exch=$exchanges%2d ${flags.mkString(" ")}")
      } catch { case e: Throwable => println(f"$name%-22s ERROR ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
