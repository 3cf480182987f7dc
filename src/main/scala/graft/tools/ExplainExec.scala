// Dev-only: print the EXECUTED (post-AQE) plan of named queries — the
// initial explain("formatted") only shows `AdaptiveSparkPlan
// isFinalPlan=false`, which hides the join strategies AQE actually
// picked. Runs each query through the noop sink first, then prints the
// final adaptive plan. Not on the bench or verify path.
// Run: sbt 'runMain graft.tools.ExplainExec <sfDir> <q1> <q2> ...'
package graft.tools

import org.apache.spark.sql.SparkSession

object ExplainExec {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n (executed) ==========")
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(df.queryExecution.executedPlan.toString.take(20000))
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
