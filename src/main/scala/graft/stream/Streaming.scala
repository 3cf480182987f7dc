package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming pipeline (SURVEY §2.12).
  *
  * The reference's only streaming surface is a Kafka micro-batch loop
  * (`StreamingInference`, gofast/mlops/inference.py:403): poll batch →
  * preprocess → model → postprocess → produce, with retry/backoff and a
  * claimed exactly-once. Here the same pipeline is declarative:
  * readStream → transform → writeStream with checkpointing (real
  * exactly-once to idempotent/transactional sinks), plus the event-time
  * semantics the reference lacks entirely: watermarks, tumbling/
  * sliding/session windows, and streaming dedup.
  */
object Streaming {

  /** Source option contract for the Kafka binding — pure, asserted by
    * StreamSpec without a broker. */
  def kafkaSourceOptions(bootstrap: String, topic: String): Map[String, String] =
    Map("kafka.bootstrap.servers" -> bootstrap, "subscribe" -> topic)

  /** Sink option contract for the Kafka binding. */
  def kafkaSinkOptions(bootstrap: String, resultTopic: String,
                       checkpoint: String): Map[String, String] =
    Map("kafka.bootstrap.servers" -> bootstrap, "topic" -> resultTopic,
      "checkpointLocation" -> checkpoint)

  /** Micro-batch pipeline kernel: source stream → transform → sink with
    * a processing-time trigger. Everything the engine owns (transform
    * plan, trigger cadence, sink options) lives here, exercised
    * end-to-end in StreamSpec over MemoryStream + memory sink; the
    * Kafka entry points below only bind source/sink formats. */
  def microBatch(source: DataFrame, sinkFormat: String,
                 sinkOptions: Map[String, String], batchInterval: String,
                 queryName: Option[String] = None)(
                 transform: DataFrame => DataFrame): StreamingQuery = {
    val w = transform(source)
      .writeStream.format(sinkFormat)
      .options(sinkOptions)
      .trigger(Trigger.ProcessingTime(batchInterval))
    queryName.fold(w)(w.queryName).start()
  }

  /** Kafka micro-batch pipeline — the `StreamingInference` shape.
    * (The Kafka connector itself isn't on this container's classpath;
    * the [[microBatch]] kernel and the option contracts above are the
    * tested surface, per COVERAGE.md.) */
  def kafkaPipeline(spark: SparkSession, bootstrap: String, topic: String,
                    resultTopic: String, checkpoint: String,
                    batchInterval: String = "10 seconds")(
                    transform: DataFrame => DataFrame): StreamingQuery = {
    val in = spark.readStream.format("kafka")
      .options(kafkaSourceOptions(bootstrap, topic))
      .load()
    microBatch(in, "kafka",
      kafkaSinkOptions(bootstrap, resultTopic, checkpoint),
      batchInterval)(transform)
  }

  /** Tumbling/sliding event-time counts with a watermark: late rows
    * beyond `watermark` are dropped, state is bounded. */
  def windowedCounts(events: DataFrame, tsCol: String, watermark: String,
                     window: String, slide: Option[String] = None): DataFrame = {
    val w = slide.map(s => org.apache.spark.sql.functions.window(col(tsCol), window, s))
      .getOrElse(org.apache.spark.sql.functions.window(col(tsCol), window))
    events.withWatermark(tsCol, watermark)
      .groupBy(w.as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("win_start"), col("event_type"), col("n"))
  }

  /** Session windows (gap-based) per user — new design, absent in the
    * reference (SURVEY §2.12). */
  def sessionCounts(events: DataFrame, tsCol: String, watermark: String,
                    gap: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("sess"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("sess.start").as("sess_start"), col("sess.end").as("sess_end"),
        col("user_id"), col("n"))

  /** Streaming dedup on a key within the watermark horizon. */
  def dedupWithinWatermark(events: DataFrame, tsCol: String, watermark: String,
                           keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Streaming decontamination: ids of arriving docs that share ANY
    * k-gram with a static eval corpus. Shingles come from the
    * array-HOF constructor ([[graft.text.Dedup.shingles]]) — the
    * batch kernel's lead() windows are unsupported on streams — then
    * explode → semi-join the static distinct k-gram set (broadcast by
    * AQE when small) → per-id dedup within the watermark. Append-mode
    * compatible: no aggregation state beyond the dedup horizon. */
  def contaminatedIds(docs: DataFrame, eval: DataFrame,
                      idCol: String, textCol: String, tsCol: String,
                      watermark: String, k: Int = 8): DataFrame = {
    val evalShingles = graft.text.Dedup
      .shinglesExploded(eval, idCol, textCol, k)
      .select(col("_sh")).distinct()
    docs.withWatermark(tsCol, watermark)
      .select(col(idCol), col(tsCol),
        explode(graft.text.Dedup.shingles(col(textCol), k)).as("_sh"))
      .join(evalShingles, Seq("_sh"), "left_semi")
      .select(idCol, tsCol)
      .dropDuplicatesWithinWatermark(idCol)
  }

  /** foreachBatch parquet sink: idempotent per-micro-batch overwrite
    * into a Catalog table partition keyed by batch id — with
    * checkpointing this is the standard exactly-once pattern for
    * non-transactional sinks (a replayed batch overwrites its own
    * partition instead of duplicating). */
  def toCatalogSink(df: DataFrame, warehouse: String, table: String,
                    checkpoint: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.write.mode("overwrite")
          .parquet(s"$warehouse/$table/batch_id=$batchId")
      }

  /** Custom keyed state: running count + exponential moving average per
    * user (the `preprocess_fn → model` per-batch state the reference
    * keeps in process memory, here fault-tolerant in the state store). */
  case class UserEvent(user_id: Long, value: Double,
                       seq: Long = 0L)
  case class UserStat(user_id: Long, n: Long, ema: Double)

  /** EMA is order-sensitive; mapGroupsWithState delivers a batch's
    * rows in shuffle order, so events carry a caller-assigned `seq`
    * (event time / offset) and each batch folds in `seq` order —
    * without it the same input could yield different state across
    * runs. Events within one batch sharing a seq fold by value for a
    * total, deterministic order. */
  def runningEma(events: Dataset[UserEvent], alpha: Double = 0.1)
      : Dataset[UserStat] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserStat, UserStat](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[UserEvent], state: GroupState[UserStat]) =>
          val prev = state.getOption.getOrElse(UserStat(uid, 0L, 0.0))
          val ordered = rows.toSeq.sortBy(e => (e.seq, e.value))
          val next = ordered.foldLeft(prev) { (st, e) =>
            val ema = if (st.n == 0) e.value
                      else alpha * e.value + (1 - alpha) * st.ema
            UserStat(uid, st.n + 1, ema)
          }
          state.update(next)
          next
      }
  }
}
