package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.core.{Tables => T}
import graft.stream.Streaming
import graft.stream.Streaming.TypedEvent

/** Round-13 batch: streaming deploys for the event-analytics family —
  * the batch funnel / transition matrix re-expressed as incremental
  * per-user state via mapGroupsWithState / flatMapGroupsWithState,
  * replayed end-to-end through a MemoryStream inside the correctness
  * loop (the bm25_stream pattern). Both share the BATCH operators'
  * oracles verbatim: the stream must land on the same answer.
  */
object Batch40Entries {

  private val sinkSeq = new java.util.concurrent.atomic.AtomicLong(0)

  private val funnelSteps = Seq("view", "click", "purchase")

  /** Replay order: the exactness contract is per-user non-decreasing
    * ts across micro-batches with equal-ts ties resolved earlier-step
    * first — sorting the whole replay by (ts, step index, event_id)
    * and chunking preserves exactly the in-batch fold order across
    * any chunk boundary. */
  private def orderedEvents(s: SparkSession, dir: String,
                            stepIdx: Map[String, Int]): Array[TypedEvent] = {
    import s.implicits._
    T.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .as[TypedEvent].collect()
      .sortBy(e => (Streaming.epochMicros(e.ts),
        stepIdx.getOrElse(e.event_type, Int.MaxValue), e.event_id))
  }

  private def replay[A](in: MemoryStream[A],
                        evs: Array[A],
                        q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    // three chunks: state must chain across micro-batch boundaries,
    // not just within one batch
    try evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { chunk =>
      in.addData(chunk.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Streaming.funnelStream replayed END-TO-END: the events table
    // arrives in event-time order on a MemoryStream in three
    // micro-batches; per-user step-state (k longs) advances via
    // mapGroupsWithState, the update-mode sink keeps the monotone
    // max_step trail, and funnelStreamCounts collapses it to the
    // batch funnel's (step, step_name, n_users). FULL oracle — the
    // batch funnel's SQL verbatim. StreamSpec asserts batch parity
    // on hand-built multi-batch sequences (including the equal-ts
    // tie rule and cross-batch chaining).
    "funnel_stream" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val stepIdx = funnelSteps.zipWithIndex.toMap
      val evs = orderedEvents(s, dir, stepIdx)
        .filter(e => stepIdx.contains(e.event_type))
      val in = MemoryStream[TypedEvent]
      val qn = s"funnel_stream_sink_${sinkSeq.incrementAndGet()}"
      val q = Streaming.funnelStream(in.toDS(), funnelSteps).toDF()
        .writeStream.format("memory").queryName(qn).outputMode("update")
        .start()
      replay(in, evs, q)
      Streaming.funnelStreamCounts(s.table(qn), funnelSteps)
        .orderBy("step")
    }),

    // Streaming.transitionsStream replayed END-TO-END: one
    // (from, to) pair appended per consecutive per-user event, the
    // stored last event chaining across the three micro-batches; the
    // sink side owns the count + row-normalize (pairs append exactly
    // once). FULL oracle — event_transitions' SQL verbatim.
    "transitions_stream" -> ((s, dir) => {
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val evs = orderedEvents(s, dir, Map.empty)
      val in = MemoryStream[TypedEvent]
      val qn = s"transitions_stream_sink_${sinkSeq.incrementAndGet()}"
      val q = Streaming.transitionsStream(in.toDS()).toDF()
        .writeStream.format("memory").queryName(qn).outputMode("append")
        .start()
      replay(in, evs, q)
      // snapshot the memory sink: a MemoryPlan View can't dedup its
      // references across the counts-vs-totals self-join
      val pairs = s.table(qn).localCheckpoint()
      val counts = pairs
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      val totals = counts.groupBy("from_type").agg(sum("n").as("_tot"))
      counts.join(totals, Seq("from_type"))
        .select(col("from_type"), col("to_type"), col("n"),
          round(col("n").cast("double") / col("_tot").cast("double"), 6)
            .as("p"))
        .orderBy("from_type", "to_type")
    })
  )

  val oracleSql: Map[String, String] = Map(

    // The batch funnel's oracle, verbatim — the streaming deploy must
    // reach the identical counts.
    "funnel_stream" ->
      """WITH s1 AS (SELECT user_id AS u, MIN(ts) AS t
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id AS u, MIN(e.ts) AS t
        |  FROM events e JOIN s1 ON e.user_id = s1.u
        |  WHERE e.event_type = 'click' AND e.ts >= s1.t GROUP BY 1),
        |s3 AS (SELECT e.user_id AS u, MIN(e.ts) AS t
        |  FROM events e JOIN s2 ON e.user_id = s2.u
        |  WHERE e.event_type = 'purchase' AND e.ts >= s2.t GROUP BY 1)
        |SELECT 1 AS step, 'view' AS step_name, COUNT(*) AS n_users FROM s1
        |UNION ALL
        |SELECT 2, 'click', COUNT(*) FROM s2
        |UNION ALL
        |SELECT 3, 'purchase', COUNT(*) FROM s3
        |ORDER BY step""".stripMargin,

    // event_transitions' oracle, verbatim.
    "transitions_stream" ->
      """WITH p AS (SELECT event_type AS from_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, COUNT(*) AS n FROM p
        |  WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, SUM(n) AS tot FROM c GROUP BY 1)
        |SELECT c.from_type, c.to_type, c.n,
        |  round(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS p
        |FROM c JOIN t USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin
  )
}
