package graft

import org.apache.spark.sql.functions._
import graft.ml.Similarity

/** SemDeDup-style embedding dedup: greedy upper-triangle semantics,
  * exact-screen correctness on the planted corpus, and the bucketed
  * variant's drop recall against the exact screen. */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private def vec(deg: Double): Seq[Float] = {
    val r = math.toRadians(deg)
    Seq(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  test("greedy policy: a vector can be dropped for resembling an " +
      "already-dropped one") {
    // cos(0°,18°) ≈ 0.951 and cos(18°,36°) ≈ 0.951 are above the 0.9
    // threshold; cos(0°,36°) ≈ 0.809 is below. The paper's greedy
    // upper-triangle screen drops BOTH 2 and 3: id 2 for resembling 1,
    // id 3 for resembling 2 — even though 2 itself was dropped.
    val df = Seq((1L, vec(0)), (2L, vec(18)), (3L, vec(36)))
      .toDF("vec_id", "embedding")
    val kept = Similarity.semanticDedupExact(df, "vec_id", "embedding", 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("exact screen on the planted corpus keeps exactly the base ids") {
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val planted = graft.entries.Batch14Entries.withPlantedDups(emb)
    val kept = Similarity
      .semanticDedupExact(planted, "vec_id", "embedding", 0.9)
      .select("vec_id").as[Long].collect().toSet
    val baseIds = emb.select("vec_id").as[Long].collect().toSet
    assert(kept == baseIds,
      s"planted duplicates (+100000 ids) must all drop; kept ${kept.size}")
  }

  test("bucketed screen reaches >= 0.9 drop recall vs the exact screen") {
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val planted = graft.entries.Batch14Entries.withPlantedDups(emb)
    val allIds = planted.select("vec_id").as[Long].collect().toSet
    val exactKept = Similarity
      .semanticDedupExact(planted, "vec_id", "embedding", 0.9)
      .select("vec_id").as[Long].collect().toSet
    val exactDropped = allIds -- exactKept
    val idx = Similarity.ivfIndex(planted, "vec_id", "embedding", nlist = 16)
    try {
      val ivfKept = idx.semanticDedup(0.9)
        .select("vec_id").as[Long].collect().toSet
      val ivfDropped = allIds -- ivfKept
      // bucketed can only MISS pairs (drop set shrinks), never invent
      assert(ivfDropped.subsetOf(exactDropped))
      val recall = ivfDropped.size.toDouble / exactDropped.size.max(1)
      assert(recall >= 0.9, s"drop recall $recall below 0.9 " +
        s"(${ivfDropped.size}/${exactDropped.size})")
    } finally idx.unpersist()
  }
}
