package graft

import org.apache.spark.sql.functions._
import graft.ml.Similarity

/** Nearest-centroid assignment + cluster-balanced selection: argmax
  * correctness vs a local brute force, deterministic tie-break, and
  * the α-temperature budget arithmetic. */
class ClusterSelectSpec extends SparkSpec {
  import spark.implicits._

  private def vec(deg: Double): Seq[Float] = {
    val r = math.toRadians(deg)
    Seq(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  test("assignToCentroids matches a local brute force on the sf0.001 corpus") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val cents = emb.filter(col("vec_id") < 8)
    val got = Similarity.assignToCentroids(emb, "vec_id", "embedding",
        cents, "vec_id", "embedding")
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    val cvecs = cents.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      d / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
    }
    val rows = emb.select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
    assert(rows.nonEmpty && got.size == rows.length)
    rows.foreach { case (id, v) =>
      val best = cvecs.map { case (cid, cv) => (cid, cos(v, cv)) }
        .maxBy { case (cid, c) => (c, -cid) }._1
      assert(got(id) == best, s"vec $id: got ${got(id)}, brute $best")
    }
  }

  test("exact cosine ties break to the lowest centroid id") {
    // two identical centroids: every vector ties on cosine; the
    // deterministic rule keeps the lower id
    val cents = Seq((5L, vec(0)), (9L, vec(0))).toDF("cid", "cvec")
    val df = Seq((1L, vec(10)), (2L, vec(350))).toDF("vec_id", "embedding")
    val got = Similarity.assignToCentroids(df, "vec_id", "embedding",
        cents, "cid", "cvec")
      .select("vec_id", "cluster").as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 5, 2L -> 5))
  }

  test("clusterBalancedSample spends the α-budget per cluster, " +
      "most-prototypical rows first") {
    // two clusters: 0° with 12 near members, 90° with 3 — α=0.5 gives
    // weights √12 and √3, so a 10-row budget splits floor(10·w/Σw) =
    // 6 and 3
    val cents = Seq((0L, vec(0)), (1L, vec(90))).toDF("cid", "cvec")
    val big = (0 until 12).map(i => (100L + i, vec(i * 2.0)))
    val small = (0 until 3).map(i => (200L + i, vec(90 - i * 2.0)))
    val df = (big ++ small).toDF("vec_id", "embedding")
    val sel = Similarity.clusterBalancedSample(df, "vec_id", "embedding",
        cents, "cid", "cvec", totalRows = 10L, alpha = 0.5)
      .select("vec_id", "cluster").as[(Long, Int)].collect()
    val byCluster = sel.groupBy(_._2).map { case (c, xs) => c -> xs.map(_._1).toSet }
    assert(byCluster(0).size == 6 && byCluster(1).size == 3,
      s"budgets off: ${byCluster.view.mapValues(_.size).toMap}")
    // cluster 0 keeps its 6 most-prototypical (smallest angle) members
    assert(byCluster(0) == (0 until 6).map(100L + _).toSet,
      s"cluster 0 kept ${byCluster(0)}")
    assert(byCluster(1) == Set(200L, 201L, 202L))
  }

  test("assignToCentroidsExpr: bit-equal to the relational argmax, " +
      "and the same code runs statelessly on a stream") {
    val emb = graft.core.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding")
    val cents = emb.filter(col("vec_id") < 8)
    val cseq = cents.as[(Long, Seq[Float])].collect().sortBy(_._1)
      .map { case (i, v) => i -> v.map(_.toDouble).toSeq }.toSeq
    val rel = Similarity.assignToCentroids(emb, "vec_id", "embedding",
      cents, "vec_id", "embedding")
    val ex = Similarity.assignToCentroidsExpr(emb, "embedding", cseq)
      .select("vec_id", "cluster", "cos")
    assert(rel.exceptAll(ex).count() == 0 && ex.exceptAll(rel).count() == 0)
    // streaming deploy: the SAME call on a MemoryStream, append mode,
    // no state — output bit-equal to the batch assignment
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    in.addData(emb.as[(Long, Seq[Float])].collect().toSeq: _*)
    val q = Similarity.assignToCentroidsExpr(
        in.toDF().toDF("vec_id", "embedding"), "embedding", cseq)
      .writeStream.format("memory").queryName("ca_sink")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val st = spark.table("ca_sink").select("vec_id", "cluster", "cos")
    assert(st.exceptAll(rel).count() == 0 && rel.exceptAll(st).count() == 0)
  }

  test("assignToCentroids plan: broadcast expansion collapses in a " +
      "partial aggregate, no window") {
    val emb = graft.core.Tables.embeddings(spark, sf)
    val plan = Similarity.assignToCentroids(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 8), "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), "centroids must broadcast")
    assert(!plan.contains("Window"), "argmax must be an aggregate, not a window")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"),
      "expected an aggregate argmax")
  }
}
