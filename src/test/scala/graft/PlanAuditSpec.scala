package graft

import graft.tools.PlanAudit

/** The oracle gate can NEVER catch a plan degeneration — a band join
  * that loses its equi-key still returns correct rows while scanning
  * n² — so the plan-shape audit runs as a failing test, not an
  * optional tool: zero CartesianProducts, zero NOBANDJOIN dedup/LSH
  * degenerations, and no BroadcastNestedLoopJoin outside the
  * adjudicated allowlist (1-row scalar broadcasts + capped pair
  * kernels) across EVERY declared query at sf0.001.
  *
  * stream_dedup is excluded: its entry runs a MemoryStream to
  * completion as a throughput probe (~10 s) and contains no batch
  * join to audit — StreamSpec covers its semantics.
  */
class PlanAuditSpec extends SparkSpec {

  test("no query plan degenerates: cartesian/band-join/NLJ audit over all entries") {
    val skip = Set("stream_dedup")
    val names = SparkEntry.queries.keySet.diff(skip)
    val audits = PlanAudit.audit(spark, sf, Some(names))
    val errors = audits.filter(_.error.isDefined)
    assert(errors.isEmpty,
      s"plan construction failed: ${errors.map(a => s"${a.name}: ${a.error.get.take(80)}").mkString("; ")}")
    val flagged = audits.filter(_.flags.nonEmpty)
    assert(flagged.isEmpty,
      s"plan red flags: ${flagged.map(a => s"${a.name} ${a.flags.mkString(",")}").mkString("; ")}")
    // exchange-count ceiling: the heaviest adjudicated plans (wilcoxon
    // 19, spearman/quantiles_exact 18 — aggregate-sized rank-kernel
    // exchanges, round-9 verdict) sit just under this; a refactor that
    // suddenly shuffles more than 24 times per query is a regression
    // even when every shuffle is keyed. llm_pipeline is the ONE
    // composed entry (four chained stages, each individually under
    // the gate) — its ceiling is the sum-of-stages 40, adjudicated at
    // 33 on entry; every shuffle keyed by doc/hash/token/bucket.
    // media_pipeline is the composed media twin (ingest → drop-set
    // dedup → pixel gate → shards): the r18 nearDupDrops kernel's
    // exact-drop join + rep band join + verify + union land it at 29,
    // every shuffle keyed by band/fingerprint/media_id/bucket —
    // adjudicated ceiling 32.
    val ceiling = Map("llm_pipeline" -> 40, "media_pipeline" -> 32)
      .withDefaultValue(24)
    val heavy = audits.filter(a => a.exchanges > ceiling(a.name))
    assert(heavy.isEmpty,
      s"exchange explosion: ${heavy.map(a => s"${a.name}=${a.exchanges}").mkString("; ")}")
  }
}
