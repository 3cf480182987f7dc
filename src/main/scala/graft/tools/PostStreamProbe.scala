// Dev-only: what keeps running AFTER a bounded streaming replay stops?
// Runs one streaming entry, then samples JVM thread activity (RUNNABLE
// non-idle threads) and CPU load every 250 ms for a few seconds while
// timing a follower batch query — the "suite-context inflation" probe
// for queries that land right after a stream in the bench's
// alphabetical order. Not on the bench or verify path.
// Run: sbt 'runMain graft.tools.PostStreamProbe <sfDir> <streamQ> <followerQ>'
package graft.tools

import org.apache.spark.sql.SparkSession

object PostStreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val streamQ = args(1)
    val followQ = args(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def exec(n: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def busyThreads(): Seq[String] = {
      import scala.jdk.CollectionConverters._
      Thread.getAllStackTraces.asScala.toSeq.collect {
        case (t, st) if t.getState == Thread.State.RUNNABLE &&
          st.nonEmpty && !t.getName.startsWith("main") &&
          !st.head.toString.contains("socketAccept") &&
          !st.head.toString.contains("epollWait") &&
          !st.head.toString.contains("EPoll") &&
          !st.head.toString.contains("SocketDispatcher") &&
          !st.head.toString.contains("Signal") =>
          s"${t.getName}: ${st.take(3).mkString(" <- ")}".take(220)
      }
    }

    // warm both queries (small sf assumed warm enough at real sf)
    println(f"WARM follower alone: ${exec(followQ)}%.2f s, again: ${exec(followQ)}%.2f s")
    spark.catalog.clearCache()
    println(f"STREAM ${streamQ}: ${exec(streamQ)}%.2f s")
    spark.catalog.clearCache()
    val probeEnd = System.currentTimeMillis() + 4000
    var i = 0
    while (System.currentTimeMillis() < probeEnd) {
      val bt = busyThreads()
      if (bt.nonEmpty) {
        println(s"T+${i * 250}ms busy=${bt.size}")
        bt.take(6).foreach(s => println("   " + s))
      }
      Thread.sleep(250); i += 1
    }
    println(f"FOLLOWER after stream+4s quiesce: ${exec(followQ)}%.2f s")
    spark.catalog.clearCache()
    println(f"STREAM again: ${exec(streamQ)}%.2f s")
    spark.catalog.clearCache()
    println(f"FOLLOWER immediately after stream: ${exec(followQ)}%.2f s")
    spark.stop()
  }
}
