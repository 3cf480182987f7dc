// Per-query stage/job profiler for the optimization rounds: runs each
// named query through the bench's noop sink and reports where the wall
// time goes — jobs, stages, task-time sums, shuffle bytes, GC — via a
// SparkListener. Run:
//   sbt 'runMain graft.tools.Profile <sfDir> <iters> <q1> <q2> ...'
package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var collecting = false
    val stageWall = mutable.LinkedHashMap[Int, (String, Long, Long, Long, Long, Int)]()
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (collecting) jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (collecting) {
          val si = sc.stageInfo
          val wall = (for {s <- si.submissionTime; c <- si.completionTime}
            yield c - s).getOrElse(0L)
          val m = si.taskMetrics
          stageWall(si.stageId) = (si.name.takeWhile(_ != '\n').take(60), wall,
            m.executorRunTime, m.shuffleReadMetrics.totalBytesRead +
              m.shuffleWriteMetrics.bytesWritten,
            m.jvmGCTime, si.numTasks)
        }
    }
    spark.sparkContext.addSparkListener(listener)

    def exec(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    for (name <- names) {
      // one untimed warmup (codegen/JIT)
      try exec(name) catch { case e: Throwable =>
        println(s"PROFILE $name FAILED: ${e.getMessage}"); }
      spark.catalog.clearCache()
      for (it <- 1 to iters) {
        stageWall.clear(); jobs = 0
        collecting = true
        val t0 = System.nanoTime()
        exec(name)
        val dt = (System.nanoTime() - t0) / 1e9
        collecting = false
        spark.catalog.clearCache()
        // give the async listener bus a beat so late stage events land
        Thread.sleep(150)
        val stages = stageWall.toSeq
        val wallSum = stages.map(_._2._2).sum / 1e3
        val runSum = stages.map(_._2._3).sum / 1e3
        val shuf = stages.map(_._2._4).sum / 1e6
        val gc = stages.map(_._2._5).sum / 1e3
        val tasks = stages.map(_._2._6).sum
        println(f"PROFILE $name it$it wall=$dt%.2fs jobs=$jobs stages=${stages.size} tasks=$tasks stageWallSum=$wallSum%.2fs taskRunSum=$runSum%.2fs shuffleMB=$shuf%.1f gc=$gc%.2fs")
        if (it == iters) {
          stages.sortBy(-_._2._2).take(12).foreach { case (id, (nm, w, r, sb, g, nt)) =>
            println(f"  stage$id%-5d wall=${w / 1e3}%.2fs run=${r / 1e3}%.2fs tasks=$nt%-4d shufMB=${sb / 1e6}%.1f gc=${g / 1e3}%.2fs  $nm")
          }
        }
      }
    }
    spark.stop()
  }
}
