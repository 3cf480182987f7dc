// Scratch probe for the optimization rounds: replays bm25_stream's
// deploy with knobs (shuffle partitions for the stateful stage, state
// store provider) and prints per-batch duration breakdowns from the
// StreamingQuery progress — evidence for sizing streaming state
// partitions. Run:
//   sbt 'runMain graft.tools.StreamProbe <sfDir> <parts> [rocksdb]'
package graft.tools

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.core.{Tables => T}

case class ProbeQuery(ts: java.sql.Timestamp, qid: Long, qtoks: Seq[String])

object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir: String = args(0)
    val parts: Int = args(1).toInt
    val rocks: Boolean = args.length > 2 && args(2) == "rocksdb"
    val cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val provider: String =
      if (rocks)
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
      else
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    val noCksum: Boolean = args.contains("nocksum")
    val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.streaming.stateStore.providerClass", provider)
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
        (!noCksum).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val qEnc: Encoder[ProbeQuery] = Encoders.product[ProbeQuery]

    val docs = T.documents(spark, sfDir)
    val index = graft.text.Retrieval.bm25Index(docs, "doc_id", "text")
      .localCheckpoint()
    println(s"index rows = ${index.count()}")
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val qRows: Array[ProbeQuery] = docs.filter(col("doc_id") % 97 === 0)
      .select(lit(t0).as("ts"), col("doc_id").as("qid"),
        slice(graft.text.TextFns.tokens(lower(col("text"))), 1, 5)
          .as("qtoks"))
      .as[ProbeQuery].collect()
    println(s"query rows = ${qRows.length}")

    for (it <- 1 to 3) {
      val in = MemoryStream[ProbeQuery]
      in.addData(qRows.toSeq: _*)
      in.addData(ProbeQuery(
        java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), -1L, Seq.empty))
      val w0 = System.nanoTime()
      val wr = graft.stream.Streaming.bm25StreamScores(
          in.toDF(), index,
          "qid", "qtoks", "ts", "5 minutes", "10 minutes")
        .select(col("query"), col("doc"), col("score"))
        .writeStream.format("memory").queryName(s"probe_$it")
        .outputMode("append")
      val shm = args.contains("shm")
      val q = (if (shm) wr.option("checkpointLocation",
          s"/dev/shm/graft_probe_${System.nanoTime()}") else wr).start()
      try q.processAllAvailable() finally q.stop()
      val dt = (System.nanoTime() - w0) / 1e9
      println(f"it$it wall=$dt%.2fs parts=$parts rocks=$rocks")
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        println(s"  batch=${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=$d stateOps=" +
          p.stateOperators.map(so =>
            s"(rows=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
            s"commitMs=${so.commitTimeMs} mem=${so.memoryUsedBytes})")
            .mkString(","))
      }
    }
    spark.stop()
  }
}
