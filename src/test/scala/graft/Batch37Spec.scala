package graft

import graft.rel.Graph
import org.apache.spark.sql.functions._

/** Round-12: PageRank + degrees on edge frames. */
class Batch37Spec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replica of the exact iteration arithmetic (round-9
    * per step, round-6 out) — the spec's golden model. */
  private def goldenPr(edges: Seq[(Long, Long)], iters: Int,
                       d: Double = 0.85): Map[Long, Double] = {
    def r(x: Double, s: Int) = BigDecimal(x)
      .setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size
    val outdeg = e.groupBy(_._1).map { case (k, v) => k -> v.size }
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dm = r(nodes.filterNot(outdeg.contains).map(pr).sum, 9)
      val in = e.groupBy(_._2).map { case (dst, es) =>
        dst -> r(es.map(ed => pr(ed._1) / outdeg(ed._1)).sum, 9)
      }
      pr = nodes.map(v => v ->
        r((1.0 - d) / n + d * (in.getOrElse(v, 0.0) + dm / n), 9)).toMap
    }
    pr.map { case (k, v) => k -> r(v, 6) }
  }

  test("pageRank matches the golden replica on a graph with a dangling node") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)) // 3 is dangling
    val out = Graph.pageRank(edges.toDF("s", "d"), "s", "d",
        iterations = 3)
      .as[(Long, Double)].collect().toMap
    assert(out === goldenPr(edges, 3))
    // mass conservation within rounding
    assert(math.abs(out.values.sum - 1.0) < 1e-5)
    // the sink with two in-edges outranks everything
    assert(out(3L) > out(2L) && out(2L) > out(1L))
  }

  test("pageRank: star graph center dominates; duplicate edges collapse") {
    val star = (2L to 9L).flatMap(i => Seq((i, 1L), (i, 1L)))
    val out = Graph.pageRank(star.toDF("s", "d"), "s", "d", iterations = 2)
      .as[(Long, Double)].collect().toMap
    assert(out(1L) > out.filterKeys(_ != 1L).values.max * 3)
    assert(out === goldenPr(star, 2))
  }

  test("pageRank tol>0 stops early once the L1 delta is small, and " +
      "the early-stopped trajectory equals the fixed-budget one") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
    // a huge tol stops after ONE iteration: result == iterations=1
    val early = Graph.pageRank(edges.toDF("s", "d"), "s", "d",
        iterations = 50, tol = 10.0)
      .as[(Long, Double)].collect().toMap
    assert(early === goldenPr(edges, 1))
    // a tiny tol runs the full budget: result == the plain call
    val full = Graph.pageRank(edges.toDF("s", "d"), "s", "d",
        iterations = 3, tol = 1e-15)
      .as[(Long, Double)].collect().toMap
    assert(full === goldenPr(edges, 3))
    // a realistic tol on a converging cycle stops before 50 and lands
    // within tol-scale distance of the 50-iteration fixed point
    val conv = Graph.pageRank(edges.toDF("s", "d"), "s", "d",
        iterations = 50, tol = 1e-6)
      .as[(Long, Double)].collect().toMap
    val fixp = goldenPr(edges, 50)
    conv.foreach { case (k, v) => assert(math.abs(v - fixp(k)) < 1e-4, k) }
  }

  test("pageRank reliable-checkpoint path lands on the identical " +
      "trajectory (flag-gated cluster-safety, same arithmetic)") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pr_ckpt_").toString
    val out = Graph.pageRank(edges.toDF("s", "d"), "s", "d",
        iterations = 3, reliableCheckpointDir = Some(dir),
        checkpointEveryK = 2)
      .as[(Long, Double)].collect().toMap
    assert(out === goldenPr(edges, 3))
    // the rank vector actually hit reliable storage
    val wrote = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(p => java.nio.file.Files.isRegularFile(p)).count()
    assert(wrote > 0, "no checkpoint files written")
  }

  test("degrees: out/in counts over distinct edges") {
    val d = Graph.degrees(
        Seq((1L, 2L), (1L, 2L), (1L, 3L), (3L, 1L)).toDF("s", "d"),
        "s", "d")
      .orderBy("id").as[(Long, Long, Long)].collect()
    assert(d.toSeq === Seq((1L, 2L, 1L), (2L, 0L, 1L), (3L, 1L, 1L)))
  }
}
