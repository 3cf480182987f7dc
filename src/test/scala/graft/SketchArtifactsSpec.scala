package graft

import org.apache.spark.sql.functions._
import graft.rel.{SketchArtifacts => SA, Sketches}

/** Fit/merge/deploy sketch artifacts: merge laws, deploy parity with
  * the one-shot sketches, error bounds against exact answers, and the
  * loud refusal of incompatible merges. */
class SketchArtifactsSpec extends SparkSpec {
  import spark.implicits._

  // skewed key stream: key k appears k times, k = 1..60 (1830 rows),
  // split into thirds by row id — every artifact law is checkable
  // against closed-form exact counts
  private lazy val rows = (1 to 60).flatMap(k => Seq.fill(k)(k))
    .zipWithIndex.map { case (k, i) => (i.toLong, k.toLong) }
    .toDF("row_id", "key").persist()
  private def third(p: Int) = rows.filter($"row_id" % 3 === p)

  test("cms artifacts: shard merge is bit-identical to the whole-corpus fit") {
    val merged = SA.cmsMerge(
      (0 until 3).map(p => SA.cmsFit(third(p), "key")).reduce(_ unionByName _))
    val whole = SA.cmsFit(rows, "key")
    val m = merged.select("n_rows", "sketch").head()
    val w = whole.select("n_rows", "sketch").head()
    assert(m.getLong(0) === 1830L)
    assert(m.getLong(0) === w.getLong(0))
    assert(java.util.Arrays.equals(m.getAs[Array[Byte]](1),
      w.getAs[Array[Byte]](1)))
  }

  test("cms deploy from merged artifact: superset of exact heavy keys, " +
      "estimates within exact <= est <= exact + eps*N") {
    val minCount = 40L
    val merged = SA.cmsMerge(
      (0 until 3).map(p => SA.cmsFit(third(p), "key", eps = 1e-3))
        .reduce(_ unionByName _))
    val cands = Sketches.candidateKeys(rows, "key", capacity = 64)
      .select($"_k".cast("long").as("key"))
    val got = SA.cmsHeavyHitters(merged, cands, "key", minCount)
      .as[(Long, Long)].collect().toMap
    val exact = rows.groupBy("key").agg(count(lit(1)).as("c"))
      .filter($"c" >= minCount).as[(Long, Long)].collect().toMap
    // superset: every exact heavy key reported (CMS only over-counts,
    // MG capacity 64 >= N/minCount = 46)
    exact.keySet.foreach(k => assert(got.contains(k), s"missed heavy key $k"))
    val n = 1830L
    got.foreach { case (k, est) =>
      val ex = (1 to 60).find(_.toLong == k).map(_.toLong).getOrElse(0L)
      assert(est >= ex && est <= ex + (1e-3 * n).ceil.toLong,
        s"key $k: est $est outside [$ex, $ex + eps*N]")
    }
  }

  test("hll artifacts: union merge tracks the whole-corpus fit within " +
      "the HLL error bound (and is exact in sparse mode)") {
    val merged = SA.hllMerge(
      (0 until 3).map(p => SA.hllFit(third(p), "key")).reduce(_ unionByName _))
    val whole = SA.hllFit(rows, "key")
    val me = SA.hllEstimate(merged).select("n_unique_est").head().getLong(0)
    val we = SA.hllEstimate(whole).select("n_unique_est").head().getLong(0)
    // the general law (entry-asserted at sf too): merged within the
    // standard HLL relative error of the whole-corpus fit — union may
    // leave sparse mode earlier than a single-pass fit, so equality is
    // NOT guaranteed at large cardinality
    val rse = 3.0 * 1.04 / math.sqrt(1 << 12)
    assert(math.abs(me - we) <= rse * math.max(me, we).toDouble)
    // at 60 distinct keys both sides stay sparse -> exact
    assert(me === 60L && we === 60L)
    assert(SA.hllEstimate(merged).select("n_rows").head().getLong(0) === 1830L)
  }

  test("gk artifacts: merged quantiles hold the rank guarantee and the " +
      "deploy runs with zero corpus touches") {
    val eps = 0.01
    val merged = SA.gkMerge(
      (0 until 3).map(p => SA.gkFit(third(p), "key", eps))
        .reduce(_ unionByName _))
    val qs = Seq(0.25, 0.5, 0.9)
    val est = SA.gkQuantiles(merged, qs).head()
    val sorted = rows.select($"key").as[Long].collect().sorted
    qs.zipWithIndex.foreach { case (q, i) =>
      val v = est.getDouble(i)
      val rank = sorted.count(_ <= v)
      assert(math.abs(rank - q * sorted.length) <= 2 * eps * sorted.length + 1,
        s"q=$q: value $v rank $rank vs target ${q * sorted.length}")
    }
    // empty input still yields a (null-quantile) artifact, not a crash
    val empty = SA.gkFit(rows.filter(lit(false)), "key", eps)
    assert(SA.gkQuantiles(empty, Seq(0.5)).head().isNullAt(0))
  }

  test("streaming cms fit: the running artifact is bit-identical to a " +
      "batch fit over everything ingested") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val state = new SA.RunningCms(1e-4, 0.99, 42)
    val in = MemoryStream[(Long, Long)]
    val q = SA.cmsFitStream(in.toDF().toDF("row_id", "key"), "key", state)
      .start()
    try {
      val all = rows.as[(Long, Long)].collect()
      all.grouped(all.length / 3 + 1).foreach { chunk =>
        in.addData(chunk.toSeq: _*); q.processAllAvailable()
      }
    } finally q.stop()
    val streamed = state.artifact(spark, "key")
    val whole = SA.cmsFit(rows, "key")
    val sRow = streamed.select("n_rows", "sketch").head()
    val wRow = whole.select("n_rows", "sketch").head()
    assert(sRow.getLong(0) === wRow.getLong(0))
    assert(java.util.Arrays.equals(sRow.getAs[Array[Byte]](1),
      wRow.getAs[Array[Byte]](1)))
    // the mid-stream artifact composes with the batch deploy path
    val hh = SA.cmsHeavyHitters(streamed,
      rows.select($"key"), "key", minCount = 40L)
    assert(hh.count() === 21L) // keys 40..60
    // a replayed batchId is a no-op (restart idempotency)
    val before = sRow.getLong(0)
    val fakeFit = rows.limit(5).stat.countMinSketch($"key".cast("string"),
      1e-4, 0.99, 42)
    state.applyBatch(0L, fakeFit)
    assert(state.artifact(spark, "key").select("n_rows").head().getLong(0)
      === before)
  }

  test("gk artifact codec: portable (value,g,delta) frames rebuild the " +
      "identical summary; the old java-serialized path is refused loudly") {
    val eps = 0.01
    val art = SA.gkFit(rows, "key", eps)
    val bytes = art.select("sketch").head().getAs[Array[Byte]](0)
    val qs = SA.deserialize(bytes)
    val re = SA.deserialize(SA.serialize(qs))
    (1 to 9).map(_ / 10.0).foreach { p =>
      assert(qs.query(p) === re.query(p), s"decile $p differs after round-trip")
    }
    assert(re.count === qs.count)
    assert(java.util.Arrays.equals(SA.serialize(qs), bytes)) // byte-stable
    // a java-serialized summary (the pre-r15 artifact encoding) must be
    // refused at the magic check, never misread as frames
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(qs); oos.close()
    intercept[IllegalArgumentException] { SA.deserialize(bos.toByteArray) }
  }

  test("streaming cms fit survives a DRIVER restart: a fresh RunningCms " +
      "recovered from the persisted per-batch artifact resumes on the same " +
      "checkpoint and lands bit-identical to an uninterrupted run") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.nio.file.Files
      .createTempDirectory("graft_cms_restart").toString
    val ckpt = s"$base/ckpt"
    val persist = s"$base/artifact"
    val in = MemoryStream[(Long, Long)]
    val all = rows.as[(Long, Long)].collect()
    val chunks = all.grouped(all.length / 3 + 1).toSeq
    def startQuery(state: SA.RunningCms) =
      SA.cmsFitStream(in.toDF().toDF("row_id", "key"), "key", state,
          persistPath = Some(persist))
        .option("checkpointLocation", ckpt).start()

    // run 1: two micro-batches, then the "driver dies"
    val state1 = new SA.RunningCms(1e-4, 0.99, 42)
    val q1 = startQuery(state1)
    try chunks.take(2).foreach { c =>
      in.addData(c.toSeq: _*); q1.processAllAvailable()
    } finally q1.stop()

    // restart: a FRESH state seeded only from the persisted artifact
    val state2 = SA.RunningCms.recover(spark, persist, 1e-4, 0.99, 42)
    assert(state2.lastBatchId === state1.lastBatchId)
    val recovered = state2.artifact(spark, "key").select("n_rows", "sketch").head()
    val inMem = state1.artifact(spark, "key").select("n_rows", "sketch").head()
    assert(recovered.getLong(0) === inMem.getLong(0))
    assert(java.util.Arrays.equals(recovered.getAs[Array[Byte]](1),
      inMem.getAs[Array[Byte]](1)))
    val q2 = startQuery(state2)
    try {
      in.addData(chunks(2).toSeq: _*); q2.processAllAvailable()
    } finally q2.stop()

    // the recovered-and-resumed artifact == one batch fit over everything
    val got = state2.artifact(spark, "key").select("n_rows", "sketch").head()
    val whole = SA.cmsFit(rows, "key").select("n_rows", "sketch").head()
    assert(got.getLong(0) === whole.getLong(0))
    assert(java.util.Arrays.equals(got.getAs[Array[Byte]](1),
      whole.getAs[Array[Byte]](1)))
    // recovery refuses a mismatched fit configuration loudly
    intercept[IllegalArgumentException] {
      SA.RunningCms.recover(spark, persist, eps = 1e-3)
    }
  }

  test("streaming hll fit survives a DRIVER restart bit-identically; " +
      "estimate tracks the batch fit within the HLL bound") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val base = java.nio.file.Files
      .createTempDirectory("graft_hll_restart").toString
    val all = rows.as[(Long, Long)].collect()
    val chunks = all.grouped(all.length / 3 + 1).toSeq

    def run(tag: String, killAfter: Int): SA.RunningHll = {
      val ckpt = s"$base/$tag/ckpt"
      val persist = s"$base/$tag/artifact"
      val in = MemoryStream[(Long, Long)]
      def startQuery(state: SA.RunningHll) =
        SA.hllFitStream(in.toDF().toDF("row_id", "key"), "key", state,
            persistPath = Some(persist))
          .option("checkpointLocation", ckpt).start()
      val state1 = new SA.RunningHll(12)
      val q1 = startQuery(state1)
      try chunks.take(killAfter).foreach { c =>
        in.addData(c.toSeq: _*); q1.processAllAvailable()
      } finally q1.stop()
      val state2 =
        if (killAfter == chunks.length) state1 // uninterrupted
        else {
          val st = SA.RunningHll.recover(spark, persist, 12)
          assert(st.lastBatchId === state1.lastBatchId, tag)
          val q2 = startQuery(st)
          try chunks.drop(killAfter).foreach { c =>
            in.addData(c.toSeq: _*); q2.processAllAvailable()
          } finally q2.stop()
          st
        }
      state2
    }

    val interrupted = run("killed", 2)
    val uninterrupted = run("clean", chunks.length)
    val a = interrupted.artifact(spark, "key").select("n_rows", "sketch").head()
    val b = uninterrupted.artifact(spark, "key").select("n_rows", "sketch").head()
    assert(a.getLong(0) === b.getLong(0))
    assert(java.util.Arrays.equals(a.getAs[Array[Byte]](1),
      b.getAs[Array[Byte]](1)))
    // the recovered estimate tracks the whole-corpus batch fit within
    // the standard HLL relative error (union may leave sparse mode
    // earlier than one pass — bound, not bit-equality, vs the batch)
    val est = SA.hllEstimate(interrupted.artifact(spark, "key"))
      .select("n_unique_est").head().getLong(0)
    val exact = rows.select("key").distinct().count()
    assert(math.abs(est - exact).toDouble / exact < 3 * 1.04 /
      math.sqrt(1 << 12), s"est $est vs exact $exact")
    // mismatched lgConfigK refuses loudly
    intercept[IllegalArgumentException] {
      SA.RunningHll.recover(spark, s"$base/killed/artifact", lgConfigK = 13)
    }
  }

  test("streaming gk fit survives a DRIVER restart bit-identically; " +
      "quantiles stay within the eps rank bound") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val eps = 0.01
    val base = java.nio.file.Files
      .createTempDirectory("graft_gk_restart").toString
    val all = rows.as[(Long, Long)].collect()
    val chunks = all.grouped(all.length / 3 + 1).toSeq

    def run(tag: String, killAfter: Int): SA.RunningGk = {
      val ckpt = s"$base/$tag/ckpt"
      val persist = s"$base/$tag/artifact"
      val in = MemoryStream[(Long, Long)]
      def startQuery(state: SA.RunningGk) =
        SA.gkFitStream(in.toDF().toDF("row_id", "key"), "key", state,
            persistPath = Some(persist))
          .option("checkpointLocation", ckpt).start()
      val state1 = new SA.RunningGk(eps)
      val q1 = startQuery(state1)
      try chunks.take(killAfter).foreach { c =>
        in.addData(c.toSeq: _*); q1.processAllAvailable()
      } finally q1.stop()
      if (killAfter == chunks.length) state1
      else {
        val st = SA.RunningGk.recover(spark, persist, eps)
        assert(st.lastBatchId === state1.lastBatchId, tag)
        val q2 = startQuery(st)
        try chunks.drop(killAfter).foreach { c =>
          in.addData(c.toSeq: _*); q2.processAllAvailable()
        } finally q2.stop()
        st
      }
    }

    val interrupted = run("killed", 2)
    val uninterrupted = run("clean", chunks.length)
    val a = interrupted.artifact(spark, "key").select("n_rows", "sketch").head()
    val b = uninterrupted.artifact(spark, "key").select("n_rows", "sketch").head()
    assert(a.getLong(0) === b.getLong(0))
    assert(java.util.Arrays.equals(a.getAs[Array[Byte]](1),
      b.getAs[Array[Byte]](1)))
    // rank-bound check against the exact sorted data
    val sorted = all.map(_._2.toDouble).sorted
    val qdf = SA.gkQuantiles(interrupted.artifact(spark, "key"),
      Seq(0.25, 0.5, 0.75))
    Seq(0.25, 0.5, 0.75).zipWithIndex.foreach { case (q, i) =>
      val v = qdf.head().getDouble(i)
      val rank = sorted.count(_ <= v)
      assert(math.abs(rank - q * sorted.length) <= 2 * eps * sorted.length + 1,
        s"q=$q: value $v rank $rank")
    }
    intercept[IllegalArgumentException] {
      SA.RunningGk.recover(spark, s"$base/killed/artifact",
        relativeError = 0.5)
    }
  }

  test("incompatible artifact merges are refused loudly") {
    val a = SA.cmsFit(third(0), "key", eps = 1e-3)
    val b = SA.cmsFit(third(1), "key", eps = 1e-4)
    intercept[IllegalArgumentException] {
      SA.cmsMerge(a.unionByName(b))
    }
    val h = SA.hllFit(third(0), "key")
    intercept[IllegalArgumentException] {
      SA.hllMerge(a.unionByName(h)) // cms bytes are not an hll artifact
    }
    intercept[IllegalArgumentException] {
      SA.cmsHeavyHitters(h, rows, "key", 1L) // wrong kind at deploy
    }
  }
}
