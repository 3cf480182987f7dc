package graft.rel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics on edge DataFrames. The data-curation
  * use is host/URL ranking: Common-Crawl-style pipelines feed a
  * centrality score of the host graph into page quality priors, the
  * same slot the quality classifier's score occupies. Connected
  * components (the dedup-cluster primitive) live in
  * [[graft.text.Dedup]]; this adds PageRank (Brin & Page 1998).
  *
  * Scale shape per iteration: one equi-join of edges against the
  * current rank vector (keyed by src), one map-side-combined groupBy
  * on dst, and the dangling mass as a 1-row scalar broadcast (the
  * fitted-scalar pattern). Nothing driver-sized; iteration count is
  * fixed, so the plan is a finite chain of keyed shuffles that AQE
  * re-plans per stage.
  *
  * Determinism: in-mass sums round to 9 dp each iteration (the LM
  * ladder's convention — aggregation-order ulps are absorbed before
  * they can compound), the final rank rounds to 6; every other step
  * is exact or a fixed IEEE expression, so any engine replays the
  * identical trajectory.
  */
object Graph {

  /** PageRank over directed edges (srcCol, dstCol), duplicate edges
    * collapsed. Dangling nodes (no out-edges) redistribute their mass
    * uniformly. Output: (id, pr) with Σ pr ≈ 1.
    *
    * `iterations` is fixed (default 3) rather than
    * convergence-tested: a deterministic, replayable trajectory beats
    * a data-dependent stopping rule for pipeline use — rank ORDER
    * stabilizes long before the values do. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1,
      s"damping must be in (0, 1), got $damping")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint() // reused every iteration: cut the lineage once
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "empty graph: PageRank undefined")
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("_deg"))
    val base = lit((1.0 - damping) / n)
    // iteration-INVARIANT joins hoisted out of the loop: the node
    // list carries its dangling flag (so the per-iteration dangling
    // mass is a filter + 1-row agg, not a join), and every edge
    // carries its src out-degree (so contributions are ONE join per
    // iteration, not two)
    val nodesF = nodes.join(outdeg, nodes("id") === outdeg("src"), "left")
      .select(nodes("id"), col("_deg").isNull.as("_dang"))
      .localCheckpoint()
    val eDeg = e.join(outdeg, "src")
      .select(col("src"), col("dst"), col("_deg"))
      .localCheckpoint()
    var pr = nodesF.withColumn("pr", lit(1.0 / n))
    var it = 0
    while (it < iterations) {
      // dangling mass: total rank sitting on nodes with no out-edges,
      // rounded like every other per-iteration aggregate
      val dangling = pr.filter(col("_dang"))
        .agg(coalesce(round(sum("pr"), 9), lit(0.0)).as("_dm"))
      val contribs = eDeg.join(pr, eDeg("src") === pr("id"))
        .select(eDeg("dst").as("id"), (col("pr") / col("_deg")).as("_c"))
      val inMass = contribs.groupBy("id").agg(round(sum("_c"), 9).as("_m"))
      pr = nodesF.join(inMass, Seq("id"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"), col("_dang"),
          round(base + lit(damping) *
            (coalesce(col("_m"), lit(0.0)) + col("_dm") / n), 9).as("pr"))
        .localCheckpoint(eager = false)
      it += 1
    }
    pr.select(col("id"), round(col("pr"), 6).as("pr"))
  }

  /** Degree table: (id, out_deg, in_deg) over distinct edges. */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val outd = e.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("out_deg"))
    val ind = e.groupBy(col("dst").as("id"))
      .agg(count(lit(1)).as("in_deg"))
    outd.join(ind, Seq("id"), "full_outer")
      .select(col("id"), coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }
}
