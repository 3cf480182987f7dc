package graft

import org.apache.spark.sql.functions._
import graft.ml.Similarity
import graft.text.{Dedup, TextFns}

/** Quantified recall/precision for the three engine-hash dedup ops that
  * have no DuckDB oracle (minhash_pairs, simhash_pairs, lsh_cosine_join),
  * measured against EXACT ground truths the repo already computes:
  * n-gram Jaccard for the text sketches, the brute-force n² cosine join
  * for LSH. Runs on the sf0.001 corpus with the same perturbation the
  * entries plant, so the assertions certify the exact configurations the
  * driver runs (32 hashes × 8 bands; 16-bit simhash bands at Hamming ≤ 6;
  * 4 planes × 8 tables at cosine ≥ 0.9).
  */
class DedupRecallSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  // the corpus minhash_pairs/simhash_pairs run on: originals + copies
  // with the first word dropped
  private lazy val corpus = {
    val d = graft.core.Tables.documents(spark, sfDir).select("doc_id", "text")
    val perturbed = d.withColumn("doc_id", col("doc_id") + 10000)
      .withColumn("text", regexp_replace(col("text"), "^\\S+\\s+", ""))
    d.unionByName(perturbed).persist()
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .as[(Long, Long)].collect().toSet

  test("minhash banding: recall >= 0.9 on exact Jaccard >= 0.8 pairs, " +
      "precision >= 0.9 vs Jaccard >= 0.3") {
    val truth = pairSet(
      Dedup.ngramJaccardPairs(corpus, "doc_id", "text", k = 3, threshold = 0.8))
    val got = pairSet(Dedup.minhashPairs(corpus, "doc_id", "text",
      numHashes = 32, bands = 8, threshold = 0.5))
    assert(truth.nonEmpty && got.nonEmpty)
    val recall = truth.intersect(got).size.toDouble / truth.size
    info(s"truth(J>=0.8)=${truth.size} got=${got.size} recall=$recall")
    assert(recall >= 0.9, s"recall=$recall")
    // 32-hash similarity estimate has sigma ~ 0.09, so reported pairs
    // (sig_sim >= 0.5) must nearly all clear a relaxed exact bar
    val loose = pairSet(
      Dedup.ngramJaccardPairs(corpus, "doc_id", "text", k = 3, threshold = 0.3))
    val precision = got.count(loose.contains).toDouble / got.size
    info(s"precision(vs J>=0.3)=$precision")
    assert(precision >= 0.9, s"precision=$precision")
  }

  test("simhash bands at Hamming <= 6: recall >= 0.9 on planted near-dups") {
    // ground truth: the planted (id, id+10000) pairs for docs long
    // enough that dropping one word cannot flip many sketch bits
    val eligible = corpus.filter(col("doc_id") < 10000)
      .filter(size(TextFns.tokens(col("text"))) >= 10)
      .select("doc_id").as[Long].collect().toSet
    val truth = eligible.map(i => (i, i + 10000L))
    val got = pairSet(Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 6))
    assert(truth.nonEmpty)
    val recall = truth.intersect(got).size.toDouble / truth.size
    info(s"planted=${truth.size} got=${got.size} recall=$recall")
    assert(recall >= 0.9, s"recall=$recall")
  }

  test("wide simhash kernels: identical pairs to the 16-bit bands in the " +
      "guaranteed-complete regime (Hamming <= 3)") {
    // both kernels are pigeonhole-complete at Hamming <= 3, so on the
    // same sketches they must return EXACTLY the same pair set — the
    // wide kernel only changes the candidate key space (2^32 vs 2^16),
    // i.e. the scale knee, never the answer
    def full(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id_a").cast("long"), col("id_b").cast("long"),
        col("hamming").cast("int")).as[(Long, Long, Int)].collect().toSet
    val narrow = full(Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3))
    val wide = full(Dedup.simhashPairsWide(corpus, "doc_id", "text", maxHamming = 3))
    assert(narrow.nonEmpty)
    assert(wide == narrow)
    val narrowP = full(
      Dedup.simhashPairsPortable(corpus, "doc_id", "text", maxHamming = 3))
    val wideP = full(
      Dedup.simhashPairsPortableWide(corpus, "doc_id", "text", maxHamming = 3))
    assert(narrowP.nonEmpty)
    assert(wideP == narrowP)
  }

  test("256-bit simhash kernels: pairs equal brute force over the four " +
      "words; exact duplicates land at hamming 0") {
    // exact twins guarantee hamming-0 pairs whatever the corpus text;
    // the banded join must equal brute force over the collected words
    val d = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text").filter(col("doc_id") < 40)
    val twins = d.withColumn("doc_id", col("doc_id") + 10000)
    val c = d.unionByName(twins).persist()
    def brute(sigs: org.apache.spark.sql.DataFrame, h: Int) = {
      val m = sigs.collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong)).toMap
      (for {
        a <- m.keys; b <- m.keys if a < b
        dh = m(a).zip(m(b))
          .map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
        if dh <= h
      } yield (a, b, dh)).toSet
    }
    def got(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id_a").cast("long"), col("id_b").cast("long"),
        col("hamming").cast("int")).as[(Long, Long, Int)].collect().toSet
    val xx = got(Dedup.simhashPairs256(c, "doc_id", "text", maxHamming = 3))
    assert(xx == brute(Dedup.simhashes256(c, "doc_id", "text"), 3))
    // every exact twin found at hamming 0
    (0L until 40L).foreach { i =>
      assert(xx.contains((i, i + 10000L, 0)), s"exact twin $i missed")
    }
    val md = got(Dedup.simhashPairs256Portable(c, "doc_id", "text", maxHamming = 3))
    assert(md == brute(Dedup.simhashes256Portable(c, "doc_id", "text"), 3))
    (0L until 40L).foreach { i =>
      assert(md.contains((i, i + 10000L, 0)), s"portable exact twin $i missed")
    }
  }

  test("LSH cosine join (4 planes x 8 tables): recall >= 0.9 vs the " +
      "exact n^2 join at cosine >= 0.9; candidates exactly verified") {
    val emb = graft.core.Tables.embeddings(spark, sfDir)
    val pert = emb.select(
      (col("vec_id") + 100000L).as("vec_id"),
      concat(slice(col("embedding"), 1, 56),
        transform(slice(col("embedding"), 57, 8), v => v * lit(1.5f)))
        .as("embedding"))
    val all = emb.select("vec_id", "embedding").unionByName(pert).persist()
    val a = all.select(col("vec_id").as("id_a"), col("embedding").as("_ea"))
    val b = all.select(col("vec_id").as("id_b"), col("embedding").as("_eb"))
    val pairs = a.join(b, col("id_a") < col("id_b"))
    val exact = pairSet(pairs
      .select(col("id_a"), col("id_b"),
        Similarity.cosineNative(pairs, col("_ea"), col("_eb")).as("cos"))
      .filter(col("cos") >= 0.9))
    val got = pairSet(Similarity.lshCosineJoin(all, "vec_id", "embedding",
      dim = 64, nPlanes = 4, nTables = 8, threshold = 0.9))
    assert(exact.nonEmpty)
    // every reported pair is exact-cosine verified: no false positives
    assert(got.subsetOf(exact))
    val recall = exact.intersect(got).size.toDouble / exact.size
    info(s"exact=${exact.size} got=${got.size} recall=$recall")
    assert(recall >= 0.9, s"recall=$recall")
    all.unpersist()
  }
}
