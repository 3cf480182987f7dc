package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (cross-snapshot) corpus deduplication — dedup a NEW
  * crawl/snapshot against an already-curated REFERENCE corpus without
  * ever re-deduplicating the reference against itself (north-star
  * addition: the standard "dump N vs dump N−1" hygiene step of a
  * continuously-refreshed 100 TB training set).
  *
  * Two strengths:
  *  - [[dropSeenDocs]] — EXACT content identity: one md5 fingerprint
  *    per side, distinct on the reference, one keyed LEFT ANTI join.
  *    The reference collapses to its distinct fingerprints (16 bytes
  *    a row), so the build side is bounded by unique content, and the
  *    new side streams through unchanged.
  *  - [[crossCorpusNearDupPairs]] / [[dropSeenNearDups]] — MinHash/LSH
  *    near-duplicate identity, reusing [[Dedup]]'s signature kernels.
  *    Both corpora sign independently (one explode + one groupBy
  *    each); candidates come from a band-hash EQUI-join of new × ref
  *    — never n²_cross — and verify by exact signature similarity.
  *
  * Unlike self-join dedup there is no `id_a < id_b` tiebreak: the
  * sides are distinct corpora, and every (new, ref) band collision is
  * a legitimate candidate.
  */
object Snapshot {

  /** Rows of `newDf` whose exact `textCol` content (the library's
    * canonical [[TextFns.fingerprint]]) already appears anywhere in
    * `refCorpus`, removed. */
  def dropSeenDocs(newDf: DataFrame, refCorpus: DataFrame,
                   textCol: String): DataFrame = {
    val fpRef = refCorpus
      .select(TextFns.fingerprint(col(textCol)).as("_fp_ref")).distinct()
    newDf.join(fpRef,
      TextFns.fingerprint(col(textCol)) === col("_fp_ref"), "left_anti")
  }

  /** Near-duplicate (new, ref) pairs: MinHash signatures per side,
    * LSH band-hash equi-join across the corpora, exact signature
    * similarity ≥ `threshold` as verification. Returns
    * (id_new, id_ref, sig_sim). `portable = true` switches to the
    * md5 hash family every SQL engine can replay ([[Dedup.md5Hash64]])
    * — the oracle-checked variant; xxhash64 stays the scale default. */
  def crossCorpusNearDupPairs(newDf: DataFrame, refCorpus: DataFrame,
                              idCol: String, textCol: String,
                              numHashes: Int = 32, bands: Int = 8,
                              threshold: Double = 0.6, shingleK: Int = 3,
                              portable: Boolean = false): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPer = numHashes / bands
    def sigs(df: DataFrame): DataFrame =
      if (portable)
        Dedup.minhashSignaturesPortable(df, idCol, textCol, numHashes, shingleK)
      else Dedup.minhashSignatures(df, idCol, textCol, numHashes, shingleK)
    // the banding and verification kernels are Dedup's single
    // definitions; renaming per side keeps the cross-join keys on
    // provably distinct attributes (the self-join degeneration hazard
    // Dedup.minhashPairsFromSigs documents)
    def banded(df: DataFrame, side: String): DataFrame =
      sigs(df).select(col("_id").as(s"id_$side"),
        col("_sig").as(s"_sig_$side"),
        explode(Dedup.bandStructs(col("_sig"), bands, rowsPer))
          .as(s"_band_$side"))
    banded(newDf, "new")
      .join(banded(refCorpus, "ref"),
        col("_band_new") === col("_band_ref"))
      .select(col("id_new"), col("id_ref"),
        Dedup.sigSimilarity(col("_sig_new"), col("_sig_ref"), numHashes)
          .as("sig_sim"))
      .distinct()
      .filter(col("sig_sim") >= threshold)
  }

  /** [[crossCorpusNearDupPairs]] folded into the dedup itself: rows
    * of `newDf` near-duplicating ANY reference row are removed (the
    * anti-join keys on the pair table's new-side ids, which the
    * banding already bounded). */
  def dropSeenNearDups(newDf: DataFrame, refCorpus: DataFrame,
                       idCol: String, textCol: String,
                       numHashes: Int = 32, bands: Int = 8,
                       threshold: Double = 0.6, shingleK: Int = 3,
                       portable: Boolean = false): DataFrame = {
    val hits = crossCorpusNearDupPairs(newDf, refCorpus, idCol, textCol,
      numHashes, bands, threshold, shingleK, portable)
      .select(col("id_new").as("_hit_id")).distinct()
    newDf.join(hits, col(idCol) === col("_hit_id"), "left_anti")
  }
}
