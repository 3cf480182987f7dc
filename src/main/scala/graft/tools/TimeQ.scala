package graft.tools
import org.apache.spark.sql.SparkSession

object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warm up
    try graft.SparkEntry.queries("smart_group")(spark, sfDir)
      .write.format("noop").mode("overwrite").save() catch { case _: Throwable => }
    names.foreach { n =>
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"TIMEQ $n rep$rep ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
