package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication — exact, MinHash/LSH, SimHash, n-gram
  * Jaccard (north-star training-data-pipeline operators).
  *
  * Scale design: every variant is bounded-shuffle —
  *  - exact: one groupBy on a 128-bit hash;
  *  - MinHash: signatures are per-row expressions (no shuffle), banding
  *    turns the O(n²) pair search into groupBys on band keys;
  *  - SimHash: per-row 64-bit sketch + prefix-band self-join;
  *  - verification joins only touch candidate pairs.
  */
object Dedup {

  /** Exact duplicate groups by content hash: one row per distinct text
    * with multiplicity and canonical (min) id.
    * Reference: `handle_duplicates` (quality.py:4677) on text. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("canonical_id"))

  /** Drop exact duplicates, keeping the min-id row per text. */
  def dropExact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol).cast("binary")))
      .orderBy(col(idCol).asc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }

  /** k-word shingles of a text column → array<string>. */
  def shingles(c: Column, k: Int = 3): Column = {
    val toks = TextFns.tokens(c)
    filter(
      transform(sequence(lit(0), greatest(size(toks) - k, lit(0))),
        i => when(size(toks) >= k,
          concat_ws(" ", slice(toks, i + 1, lit(k))))),
      s => s.isNotNull)
  }

  /** MinHash signature expression: for each of `numHashes` seeded hash
    * functions, the minimum xxhash64 over the shingle set. NOTE:
    * higher-order functions are interpreted (not codegen'd) — use
    * [[minhashSignatures]] for corpus-scale signature computation. */
  def minhashSignature(shingleCol: Column, numHashes: Int = 32): Column =
    array((0 until numHashes).map { seed =>
      array_min(transform(shingleCol, s => xxhash64(lit(seed), s)))
    }: _*)

  /** Corpus-scale MinHash signatures: explode shingles once, hash in
    * codegen'd projections, take `numHashes` min-aggregates in ONE
    * groupBy on the id. Output: (_id, _sig array<long>). */
  /** Distinct k-word shingles, one row per (id, shingle), built with
    * codegen'd operators: posexplode tokens, then concat with lead()
    * windows — the array-HOF shingle constructor is interpreted and
    * dominates corpus-scale runs. One shuffle on the id. */
  def shinglesExploded(df: DataFrame, idCol: String, textCol: String,
                       k: Int): DataFrame = {
    val toks = df.select(col(idCol).as("_id"),
      posexplode(TextFns.tokens(col(textCol))).as(Seq("_p", "_t")))
    val w = Window.partitionBy("_id").orderBy("_p")
    val parts = (0 until k).map(i =>
      if (i == 0) col("_t") else lead(col("_t"), i).over(w))
    toks.withColumn("_sh", concat_ws(" ", parts: _*))
      .withColumn("_last", parts.last)
      .filter(col("_last").isNotNull)
      .select("_id", "_sh").distinct()
  }

  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int, shingleK: Int): DataFrame = {
    // hash the shingle STRING once; the k-hash family then re-hashes the
    // 64-bit value (integer-input xxhash is ~10x cheaper than string).
    val exploded = shinglesExploded(df, idCol, textCol, shingleK)
      .withColumn("_h", xxhash64(col("_sh")))
    val mins = (0 until numHashes).map(seed =>
      min(xxhash64(lit(seed), col("_h"))).as(s"_h$seed"))
    exploded.groupBy("_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("_id"),
        array((0 until numHashes).map(i => col(s"_h$i")): _*).as("_sig"))
  }

  /** Engine-portable 60-bit hash: the first 15 hex digits of md5,
    * parsed base-16 — reproducible in ANY engine with an md5 built-in
    * (DuckDB: `CAST('0x'||substr(md5(s),1,15) AS BIGINT)`), unlike
    * xxhash64 which is Spark-internal. ~an order of magnitude slower
    * than integer xxhash, so it backs the ORACLE-CHECKED minhash
    * variant while xxhash64 stays the corpus-scale default. */
  def md5Hash64(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  /** MinHash signatures with the portable md5 hash family: same plan
    * shape as [[minhashSignatures]] (one explode, numHashes min-aggs
    * in one groupBy) with every hash replayable in SQL. */
  def minhashSignaturesPortable(df: DataFrame, idCol: String, textCol: String,
                                numHashes: Int, shingleK: Int): DataFrame = {
    val exploded = shinglesExploded(df, idCol, textCol, shingleK)
      .withColumn("_h", md5Hash64(col("_sh")))
    val mins = (0 until numHashes).map(seed =>
      min(md5Hash64(concat(lit(s"${seed}_"), col("_h").cast("string"))))
        .as(s"_h$seed"))
    exploded.groupBy("_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("_id"),
        array((0 until numHashes).map(i => col(s"_h$i")): _*).as("_sig"))
  }

  /** Candidate near-duplicate pairs via LSH banding: rows sharing any
    * band (contiguous signature slice) hash are candidates; candidates
    * are verified with exact signature similarity >= `threshold`.
    *
    * bands*rowsPerBand must equal numHashes. Returns (id_a, id_b,
    * sig_similarity) with id_a < id_b. The heavy O(n²) compare never
    * happens: the join key is the band hash.
    */
  def minhashPairs(df: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 32, bands: Int = 8,
                   threshold: Double = 0.6, shingleK: Int = 3): DataFrame =
    minhashPairsFromSigs(
      minhashSignatures(df, idCol, textCol, numHashes, shingleK),
      numHashes, bands, threshold)

  /** [[minhashPairs]] over the portable md5 hash family — the
    * oracle-checked variant (band-hash collisions could in principle
    * admit an extra candidate the oracle's true-band-equality test
    * would not, at ~2⁻⁶⁴ per pair; candidates are exact-verified by
    * sig_sim either way). */
  def minhashPairsPortable(df: DataFrame, idCol: String, textCol: String,
                           numHashes: Int = 32, bands: Int = 8,
                           threshold: Double = 0.6, shingleK: Int = 3): DataFrame =
    minhashPairsFromSigs(
      minhashSignaturesPortable(df, idCol, textCol, numHashes, shingleK),
      numHashes, bands, threshold)

  /** The LSH band membership of a signature array: one
    * (band-index, band-hash) struct per contiguous slice. The single
    * definition both the self-join ([[minhashPairsFromSigs]]) and the
    * cross-corpus join ([[Snapshot.crossCorpusNearDupPairs]]) key on —
    * a banding fix must reach every consumer at once. */
  private[text] def bandStructs(sig: Column, bands: Int,
                                rowsPer: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(sig, b * rowsPer + 1, rowsPer)).as("bh"))
    }: _*)

  /** Exact signature similarity of two equal-length signature arrays
    * — the verification stage shared by every banding consumer. */
  private[text] def sigSimilarity(a: Column, b: Column,
                                  numHashes: Int): Column =
    size(filter(zip_with(a, b,
      (x, y) => when(x === y, 1).otherwise(0)), v => v === 1))
      .cast("double") / lit(numHashes)

  /** Banding + exact-verification stage shared by the hash families. */
  def minhashPairsFromSigs(sigDf: DataFrame, numHashes: Int, bands: Int,
                           threshold: Double): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPer = numHashes / bands
    // localCheckpoint: both sides of the self-join reuse the computed
    // signatures instead of re-hashing the corpus; unlike persist()
    // nothing stays pinned in the CacheManager after the caller drops
    // the returned plan (ContextCleaner frees checkpoint blocks)
    val sig = sigDf.localCheckpoint(eager = false)
    val banded = sig.select(col("_id"), col("_sig"),
      explode(bandStructs(col("_sig"), bands, rowsPer)).as("_band"))
    // distinct attribute names per leg: the join key must never rely on
    // Spark's self-join disambiguation heuristic — if both sides ever
    // resolved to the same attribute the band equi-join would silently
    // degenerate to an n² scan (correct rows, catastrophic plan)
    val a = banded.select(col("_id").as("id_a"), col("_sig").as("_sig_a"),
      col("_band").as("_band_a"))
    val b = banded.select(col("_id").as("id_b"), col("_sig").as("_sig_b"),
      col("_band").as("_band_b"))
    a.join(b, col("_band_a") === col("_band_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        sigSimilarity(col("_sig_a"), col("_sig_b"), numHashes)
          .as("sig_sim"))
      .distinct()
      .filter(col("sig_sim") >= threshold)
  }

  /** 64-bit SimHash per row as a pure expression (small inputs only —
    * higher-order folds are interpreted; use [[simhashes]] at corpus
    * scale). */
  def simhash(c: Column): Column = {
    val toks = TextFns.tokens(c)
    val hashes = transform(toks, t => xxhash64(t))
    (0 until 64).map { i =>
      val bitSum = aggregate(hashes, lit(0L), (acc, h) =>
        acc + when(shiftright(h, i).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(bitSum > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** Corpus-scale SimHash: explode tokens, hash once per token in a
    * codegen'd projection, then count set bits per position with
    * LANE-PACKED aggregates — three 21-bit counters per long, so 22
    * sums instead of 64 (valid for docs up to 65k tokens; 21-bit
    * fields keep the packed SUM inside int64 under ANSI). The sign
    * rule bitSum_i > 0 becomes 2·setCount_i > n. Output: (_id, _sh). */
  def simhashes(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = df.select(col(idCol).as("_id"),
        explode(TextFns.tokens(col(textCol))).as("_t"))
      .withColumn("_h", xxhash64(col("_t")))
    // THREE 21-bit counter lanes per long (bits b+22·lane, field shift
    // 21·lane): a 16-bit 4-lane pack overflowed int64 in the SUM under
    // ANSI once a doc repeated a lane-3 bit >32767 times — 21-bit
    // fields keep the worst-case sum (65535·(2^42+2^21+1) ≈ 2.9e17)
    // far inside int64 for every guard-valid document
    val packSums = (0 until 22).map { b =>
      val lanes = (0 until 3).filter(l => b + 22 * l < 64)
      val packed = lanes.map { lane =>
        shiftleft(shiftright(col("_h"), b + 22 * lane).bitwiseAND(1L), 21 * lane)
      }.reduce(_ + _)
      sum(packed).as(s"_p$b")
    }
    val aggsAll = packSums :+ count(lit(1)).as("_n")
    val withCounts = exploded.groupBy("_id")
      .agg(aggsAll.head, aggsAll.tail: _*)
    val sh = (0 until 64).map { i =>
      val b = i % 22; val lane = i / 22
      val setCount = shiftright(col(s"_p$b"), 21 * lane).bitwiseAND(0x1FFFFFL)
      when(setCount * 2 > col("_n"), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    withCounts.select(col("_id"), laneGuard(sh).as("_sh"))
  }

  /** The packed-lane counters hold 21 bits each but the sign rule is
    * only meaningful for n ≤ 65535 (and a >65k-token "document" is
    * itself a quality signal) — raise instead of sketching it (split
    * such outliers upstream). */
  private def laneGuard(sh: Column): Column =
    when(col("_n") > lit(65535L),
      raise_error(concat(lit("simhash: document "), col("_id").cast("string"),
        lit(" has more than 65535 tokens; above this cap the majority " +
          "sign rule is unreliable — split the document upstream")))).otherwise(sh)

  /** 60-bit SimHash on the portable md5 hash family (same lane-packed
    * plan as [[simhashes]]: 20 packed sums carrying 3 21-bit counters
    * each, bit i = b + 20·lane). Every step is replayable in SQL, so
    * the paired query gets a full oracle. */
  def simhashesPortable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val exploded = df.select(col(idCol).as("_id"),
        explode(TextFns.tokens(col(textCol))).as("_t"))
      .withColumn("_h", md5Hash64(col("_t")))
    val packSums = (0 until 20).map { b =>
      val packed = (0 until 3).map { lane =>
        shiftleft(shiftright(col("_h"), b + 20 * lane).bitwiseAND(1L), 21 * lane)
      }.reduce(_ + _)
      sum(packed).as(s"_p$b")
    }
    val aggsAll = packSums :+ count(lit(1)).as("_n")
    val withCounts = exploded.groupBy("_id")
      .agg(aggsAll.head, aggsAll.tail: _*)
    val sh = (0 until 60).map { i =>
      val b = i % 20; val lane = i / 20
      val setCount = shiftright(col(s"_p$b"), 21 * lane).bitwiseAND(0x1FFFFFL)
      when(setCount * 2 > col("_n"), lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    withCounts.select(col("_id"), laneGuard(sh).as("_sh"))
  }

  /** [[simhashPairs]] over the portable 60-bit md5 sketch: four
    * 15-bit bands, Hamming-verified candidates — the oracle-checked
    * variant. Recall guarantee as in [[simhashPairs]]: complete for
    * Hamming < 4 (pigeonhole over the 4 bands); candidates at larger
    * distances are best-effort, so a `maxHamming` above 3 widens the
    * VERIFIED band but not the guaranteed candidate recall. */
  def simhashPairsPortable(df: DataFrame, idCol: String, textCol: String,
                           maxHamming: Int = 8): DataFrame = {
    val sk = simhashesPortable(df, idCol, textCol).localCheckpoint(eager = false)
    val banded = sk.select(col("_id"), col("_sh"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("_sh"), b * 15).bitwiseAND(0x7FFFL).as("bh"))
      }: _*)).as("_band"))
    // per-leg attribute names — see minhashPairsFromSigs
    val a = banded.select(col("_id").as("id_a"), col("_sh").as("_sha"),
      col("_band").as("_band_a"))
    val b = banded.select(col("_id").as("id_b"), col("_sh").as("_shb"),
      col("_band").as("_band_b"))
    val hamming = bit_count(col("_sha").bitwiseXOR(col("_shb")))
    a.join(b, col("_band_a") === col("_band_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming.as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Wide-band SimHash pair kernel shared by [[simhashPairsWide]] and
    * [[simhashPairsPortableWide]]: multi-index hashing over TWO
    * (bits/2)-wide sketch halves, enumerating the radius-1 Hamming
    * ball of the lower-id side's half-key (Norouzi, Punjani & Fleet,
    * "Fast Search in Hamming Space with Multi-Index Hashing", CVPR
    * 2012). A pair within Hamming ≤ 3 has ≤ 1 differing bit in at
    * least one half (pigeonhole over 2 substrings), so the exact
    * equi-join on (band, variant) finds every such pair — the same
    * ≤ 3 completeness the 16-bit bands give, while the 2^(bits/2) key
    * space pushes the band-bucket birthday knee from ~2^16 items out
    * to ~2^(bits/2) (SCALE.md records the 16-bit knee at ~65k items).
    * Candidates at larger distances remain best-effort, exactly the
    * [[simhashPairs]] contract. Cost: a (1 + bits/2)× linear
    * probe-side explode; no all-pairs step. */
  private def wideBandPairs(sk: DataFrame, bits: Int,
                            maxHamming: Int): DataFrame = {
    require(bits % 2 == 0 && bits <= 64, s"bits must be even <= 64, got $bits")
    val half = bits / 2
    val mask = (1L << half) - 1L
    val keyed = sk.select(col("_id"), col("_sh"),
      col("_sh").bitwiseAND(mask).as("_k0"),
      shiftright(col("_sh"), half).bitwiseAND(mask).as("_k1"))
    val build = (0 until 2).map { k =>
      keyed.select(col("_id"), col("_sh"), lit(k).as("_band"),
        col(s"_k$k").as("_key"))
    }.reduce(_ unionByName _)
    val probe = build.select(col("_id"), col("_sh"), col("_band"),
      explode(array((col("_key") +:
        (0 until half).map(i => col("_key").bitwiseXOR(lit(1L << i)))): _*))
        .as("_key"))
    // per-leg attribute names — see minhashPairsFromSigs
    val a = probe.select(col("_id").as("id_a"), col("_sh").as("_sha"),
      col("_band").as("_band_a"), col("_key").as("_key_a"))
    val b = build.select(col("_id").as("id_b"), col("_sh").as("_shb"),
      col("_band").as("_band_b"), col("_key").as("_key_b"))
    val hamming = bit_count(col("_sha").bitwiseXOR(col("_shb")))
    a.join(b, col("_band_a") === col("_band_b") &&
        col("_key_a") === col("_key_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming.as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** [[simhashPairsPortable]]'s scale path past the 15-bit band
    * birthday knee: the same portable 60-bit md5 sketch through
    * [[wideBandPairs]] (2×30-bit halves, radius-1 balls). Complete
    * for Hamming ≤ 3; fully oracle-replayable — the candidate rule is
    * "either 30-bit half within Hamming 1", a closed form any SQL
    * engine can brute-force. */
  def simhashPairsPortableWide(df: DataFrame, idCol: String, textCol: String,
                               maxHamming: Int = 8): DataFrame =
    wideBandPairs(simhashesPortable(df, idCol, textCol).localCheckpoint(eager = false),
      60, maxHamming)

  /** [[simhashPairs]]'s scale path past the 16-bit band birthday
    * knee: the xxhash64 64-bit sketch through [[wideBandPairs]]
    * (2×32-bit halves, radius-1 balls). Complete for Hamming ≤ 3. */
  def simhashPairsWide(df: DataFrame, idCol: String, textCol: String,
                       maxHamming: Int = 8): DataFrame =
    wideBandPairs(simhashes(df, idCol, textCol).localCheckpoint(eager = false),
      64, maxHamming)

  /** 256-bit SimHash — the text sibling of
    * [[graft.mm.Multimodal.imageDHash256]], retiring even the WIDE
    * kernels' ~2^25 knee: FOUR independent 64-bit xxhash words per
    * token (word w hashes (w, token)), each majority-folded with the
    * lane-packed plan of [[simhashes]], emitted as four 64-bit
    * signature words. Near-dup joins key on whole words, so random
    * band collisions fall to ~4n²/2^64 — no birthday term at any
    * feasible corpus size and no ball enumeration. The match
    * criterion tightens with the bits (hamming 3/256 vs 3/64): right
    * for dedup-before-training; raise maxHamming consciously for
    * heavier edits. Output: (_id, _s0.._s3). */
  def simhashes256(df: DataFrame, idCol: String, textCol: String): DataFrame =
    simhashes256Impl(df, idCol, textCol,
      (w, t) => xxhash64(lit(w), t), bitsPerWord = 64)

  /** [[simhashes256]] on the portable md5 family — four salted 60-bit
    * words (word w hashes "sh256_w_" ++ token), every step replayable
    * in SQL so the paired query gets a full oracle. 240 signature
    * bits; same no-knee join geometry (collisions ~4n²/2^60). */
  def simhashes256Portable(df: DataFrame, idCol: String,
                           textCol: String): DataFrame =
    simhashes256Impl(df, idCol, textCol,
      (w, t) => md5Hash64(concat(lit(s"sh256_${w}_"), t)), bitsPerWord = 60)

  private def simhashes256Impl(df: DataFrame, idCol: String, textCol: String,
                               hashW: (Int, Column) => Column,
                               bitsPerWord: Int): DataFrame = {
    val lanes = 3
    val fieldBits = 21 // packed-SUM overflow headroom, see simhashes
    val perSum = (bitsPerWord + lanes - 1) / lanes // bit positions per packed sum
    val exploded = df.select(col(idCol).as("_id"),
      explode(TextFns.tokens(col(textCol))).as("_t"))
    val withH = (0 until 4).foldLeft(exploded)((d, w) =>
      d.withColumn(s"_h$w", hashW(w, col("_t"))))
    val packSums = for (w <- 0 until 4; b <- 0 until perSum) yield {
      val live = (0 until lanes).filter(l => b + perSum * l < bitsPerWord)
      val packed = live.map { lane =>
        shiftleft(shiftright(col(s"_h$w"), b + perSum * lane)
          .bitwiseAND(1L), fieldBits * lane)
      }.reduce(_ + _)
      sum(packed).as(s"_p${w}_$b")
    }
    val aggsAll = packSums :+ count(lit(1)).as("_n")
    val withCounts = withH.groupBy("_id").agg(aggsAll.head, aggsAll.tail: _*)
    val words = (0 until 4).map { w =>
      (0 until bitsPerWord).map { i =>
        val b = i % perSum; val lane = i / perSum
        val setCount = shiftright(col(s"_p${w}_$b"), fieldBits * lane)
          .bitwiseAND((1L << fieldBits) - 1)
        when(setCount * 2 > col("_n"), lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ bitwiseOR _)
    }
    // the token-count guard raises once per row (word 0 carries it)
    withCounts.select(col("_id"), laneGuard(words.head).as("_s0"),
      words(1).as("_s1"), words(2).as("_s2"), words(3).as("_s3"))
  }

  /** Near-dup pairs over the 240-bit portable signature through the
    * SAME width-agnostic 4-band kernel as the media path
    * ([[graft.mm.Multimodal.bandedNearDups]]): complete for
    * hamming < 4 by pigeonhole; past 3 the candidate rule stays
    * "some whole word matches" (the [[simhashPairsPortable]]
    * best-effort convention — the paired oracle replays exactly that
    * rule, so correctness is exact even where recall is best-effort).
    * Output: (id_a, id_b, hamming). */
  def simhashPairs256Portable(df: DataFrame, idCol: String, textCol: String,
                              maxHamming: Int = 3): DataFrame =
    pairs256(simhashes256Portable(df, idCol, textCol), maxHamming)

  /** [[simhashPairs256Portable]]'s corpus-scale xxhash twin (256
    * bits). */
  def simhashPairs256(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3): DataFrame =
    pairs256(simhashes256(df, idCol, textCol), maxHamming)

  private def pairs256(sigs: DataFrame, maxHamming: Int): DataFrame =
    graft.mm.Multimodal.bandedNearDups(
      sigs.localCheckpoint(eager = false).select(col("_id").as("media_id"),
        lit(true).as("ok"), col("_s0").as("b0"), col("_s1").as("b1"),
        col("_s2").as("b2"), col("_s3").as("b3")),
      maxHamming, allowWeak = maxHamming > 3)

  /** Near-duplicate candidates by SimHash: rows sharing any of four
    * 16-bit bands of the 64-bit sketch, verified by Hamming distance
    * <= maxHamming. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 8): DataFrame = {
    val sk = simhashes(df, idCol, textCol).localCheckpoint(eager = false)
    val banded = sk.select(col("_id"), col("_sh"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("_sh"), b * 16).bitwiseAND(0xFFFFL).as("bh"))
      }: _*)).as("_band"))
    // per-leg attribute names — see minhashPairsFromSigs
    val a = banded.select(col("_id").as("id_a"), col("_sh").as("_sha"),
      col("_band").as("_band_a"))
    val b = banded.select(col("_id").as("id_b"), col("_sh").as("_shb"),
      col("_band").as("_band_b"))
    val hamming = bit_count(col("_sha").bitwiseXOR(col("_shb")))
    a.join(b, col("_band_a") === col("_band_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming.as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Resolve near-duplicate PAIRS into duplicate CLUSTERS: connected
    * components by iterative min-label propagation. The missing last
    * stage of the dedup pipeline — `minhashPairs`/`simhashPairs`/
    * `ngramJaccardPairs` emit edges; keeping one document per
    * component is what actually deduplicates a corpus
    * (handle_duplicates 'drop' semantics, quality.py:4677, lifted to
    * the transitive-closure case).
    *
    * Each iteration: every node takes the min of its own label and its
    * neighbors' labels — two shuffles (join + groupBy), both keyed, no
    * cartesian. Converges in O(component diameter) rounds; dedup
    * graphs are near-cliques (diameter ≤ ~3), so the loop is short
    * regardless of corpus size. `localCheckpoint` cuts lineage so plan
    * depth stays constant across iterations; the convergence probe is
    * a count aggregate (O(1) to the driver). At 1000-executor scale
    * the same loop holds — state is one (id, comp) row per node,
    * edges are reused from cache, and per-round cost is bounded by
    * |edges|. (The alternating large-star/small-star variant halves
    * rounds on pathological chains; not needed for near-dup graphs.)
    *
    * Input: pairs with two id columns. Output: (id, component) for
    * every id appearing in any pair, component = min id reachable.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
                          bCol: String = "id_b", maxIter: Int = 25): DataFrame = {
    // ids are cast to long for the min-label order; a non-numeric
    // string id would cast to NULL and silently drop its edges (and
    // dropNearDuplicates would then dedup NOTHING) — fail loudly
    // per-row instead
    def checkedId(c: Column): Column = {
      val l = c.cast("long")
      when(c.isNotNull && l.isNull,
        raise_error(concat(
          lit("connectedComponents: id not castable to long: "),
          c.cast("string")))).otherwise(l)
    }
    val e0 = pairs.select(checkedId(col(aCol)).as("src"),
      checkedId(col(bCol)).as("dst"))
    val edges = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(eager = false)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(eager = false)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // min label over in-neighbors, then fold into the node's own label
      val prop = edges.join(labels, edges("src") === labels("id"))
        .groupBy(col("dst").as("_nid")).agg(min("comp").as("_ncomp"))
      // labels only DECREASE (least), so "changed" is decidable per
      // ROW during propagation — carry it as a flag and aggregate
      // linearly over the materialized blocks instead of re-joining
      // next against labels (the r18 check paid a full two-sided
      // shuffle join per iteration just to detect the fixed point)
      val next0 = labels.join(prop, labels("id") === prop("_nid"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("_ncomp"), col("comp"))).as("comp"),
          (col("_ncomp").isNotNull && col("_ncomp") < col("comp"))
            .as("_chg"))
        .localCheckpoint(eager = false)
      val changed = next0
        .agg(coalesce(max(col("_chg")), lit(false))).head().getBoolean(0)
      labels = next0.select(col("id"), col("comp"))
      converged = !changed
      iter += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: not converged after $maxIter iterations — " +
          "component diameter exceeds maxIter (labels would be partially " +
          "propagated, i.e. silently wrong); raise maxIter for graphs " +
          "with long chains")
    labels
  }

  /** Connected components by the ALTERNATING large-star/small-star
    * algorithm (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii:
    * "Connected Components in MapReduce and Beyond", SoCC 2014) — the
    * scale path of [[connectedComponents]]. Min-label propagation's
    * round count is the component DIAMETER: fine for near-clique dedup
    * graphs, quadratic-wall on chain-shaped ones (snapshot lineages
    * A≈B≈C≈…, URL redirect chains), where a 10⁵-long chain means 10⁵
    * shuffles. The star rounds contract every component to a star in
    * O(log²) rounds regardless of diameter; each round is two keyed
    * groupBy+join passes over the edge set — same per-round cost
    * shape, exponentially fewer rounds on the pathological inputs.
    *
    * large-star: every node connects its LARGER neighbors to the
    * minimum of its neighborhood (incl. itself) — breaks long paths.
    * small-star: every node connects its smaller-or-equal neighbors
    * and itself to that minimum — flattens into stars. Both preserve
    * connectivity and never create new components (paper §3, Lemma 1);
    * the fixed point is a star forest rooted at component minima.
    *
    * Edges are kept canonical (u > v) and distinct between rounds;
    * `localCheckpoint` cuts lineage per round, and convergence is an
    * O(1)-to-driver check (edge count equal AND symmetric difference
    * empty). Output matches [[connectedComponents]] exactly:
    * (id, comp) for every id in any pair, comp = min reachable id —
    * the two algorithms are interchangeable, verified by test.
    */
  def connectedComponentsStar(pairs: DataFrame, aCol: String = "id_a",
                              bCol: String = "id_b",
                              maxIter: Int = 50): DataFrame = {
    def checkedId(c: Column): Column = {
      val l = c.cast("long")
      when(c.isNotNull && l.isNull,
        raise_error(concat(
          lit("connectedComponentsStar: id not castable to long: "),
          c.cast("string")))).otherwise(l)
    }
    val ids = pairs
      .select(explode(array(checkedId(col(aCol)), checkedId(col(bCol))))
        .as("id"))
      .distinct().localCheckpoint(eager = false)
    // canonical edge invariant maintained by both stars: u > v
    var edges = pairs
      .select(checkedId(col(aCol)).as("_a"), checkedId(col(bCol)).as("_b"))
      .filter(col("_a") =!= col("_b"))
      .select(greatest(col("_a"), col("_b")).as("u"),
        least(col("_a"), col("_b")).as("v"))
      .distinct().localCheckpoint(eager = false)

    // large-star over the undirected view: m(u) = min(Γ(u) ∪ {u});
    // emit (v, m(u)) for every STRICTLY LARGER neighbor v. m ≤ u < v
    // keeps the canonical invariant.
    def largeStar(e: DataFrame): DataFrame = {
      val bidir = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val m = bidir.groupBy("u").agg(min("v").as("_mn"))
        .select(col("u"), least(col("_mn"), col("u")).as("_m"))
      bidir.join(m, "u")
        .filter(col("v") > col("u") && col("v") =!= col("_m"))
        .select(col("v").as("u"), col("_m").as("v"))
        .distinct()
    }
    // small-star over the canonical (u > v) view: m(u) = min of the
    // smaller neighbors; re-point them and u itself at m. v > m keeps
    // the invariant; (m, m) self-loops are dropped.
    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy("u").agg(min("v").as("_m"))
      val rePointed = e.join(m, "u")
        .filter(col("v") =!= col("_m"))
        .select(col("v").as("u"), col("_m").as("v"))
      val self = m.select(col("u"), col("_m").as("v"))
      rePointed.union(self).distinct()
    }

    var converged = edges.isEmpty
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint(eager = false)
      val nextCount = next.count()
      converged = nextCount == edges.count() &&
        next.except(edges).limit(1).isEmpty
      edges.unpersist()
      edges = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar: not converged after $maxIter rounds — " +
          "this should not happen (the alternating algorithm converges " +
          "in O(log^2 n) rounds); raise maxIter only after checking the " +
          "input for pathological id distributions")
    // fixed point is a star forest: every edge points a node at its
    // component root. Roots and isolated input ids label themselves.
    val labels = edges.select(col("u").as("id"), col("v").as("comp"))
    ids.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }

  /** One-call near-duplicate removal: MinHash/LSH pairs → connected
    * components → keep the min-id document per duplicate cluster
    * (`handle_duplicates` drop semantics, quality.py:4677, extended
    * transitively). Non-candidates pass through untouched; only ids
    * appearing in a near-dup pair join against the cluster table,
    * which is pair-bounded and therefore far smaller than the corpus
    * (left as a plain keyed join — AQE broadcasts it when it is small;
    * on a heavily-duplicated corpus it may not be).
    */
  def dropNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                         numHashes: Int = 32, bands: Int = 8,
                         threshold: Double = 0.6, shingleK: Int = 3,
                         portableHash: Boolean = false,
                         collapseClones: Boolean = true): DataFrame = {
    def sigs: DataFrame =
      if (portableHash)
        minhashSignaturesPortable(df, idCol, textCol, numHashes, shingleK)
      else minhashSignatures(df, idCol, textCol, numHashes, shingleK)
    if (collapseClones && threshold <= 1.0) {
      // Clone collapse (the nearDupDrops argument on MinHash): exact-
      // duplicate texts produce IDENTICAL signatures, and the banded
      // self-join pays C(k,2) sig_sim pairs per k-clone set. Identical
      // signatures score sig_sim = 1.0 EXACTLY (numHashes/numHashes),
      // so at any threshold <= 1 every non-min clone is in the drop
      // set and its group's min id stands in for it in every pair the
      // kernel would have found (rep = group min <= any witness from
      // that group) — one rep per distinct signature enters the
      // banding + CC, and the cluster min over reps IS the cluster
      // min over members. Drop set identical to the uncollapsed path
      // (asserted in ActivationsSpec); the collapse costs one linear
      // window shuffle keyed by the signature.
      val w = Window.partitionBy(col("_sig"))
      val withRep = sigs.withColumn("_rep", min(col("_id")).over(w))
        .localCheckpoint(eager = false)
      val repSigs = withRep.filter(col("_id") === col("_rep"))
        .select(col("_id"), col("_sig"))
      val pairs = minhashPairsFromSigs(repSigs, numHashes, bands, threshold)
      val clusters = connectedComponents(pairs)
      val drops = withRep.filter(col("_id") =!= col("_rep"))
        .select(col("_id").as(idCol))
        .unionByName(clusters.filter(col("comp") =!= col("id"))
          .select(col("id").as(idCol)))
      df.join(drops.distinct(), Seq(idCol), "left_anti")
    } else {
      val pairs = minhashPairsFromSigs(sigs, numHashes, bands, threshold)
      val clusters = connectedComponents(pairs)
      df.join(clusters.withColumnRenamed("id", idCol), Seq(idCol), "left")
        .filter(col("comp").isNull || col("comp") === col(idCol))
        .drop("comp")
    }
  }

  /** Exact n-gram Jaccard similarity for candidate pairs produced by a
    * cheap blocker (here: shared rare shingle). explode+groupBy —
    * shuffle is proportional to shingle postings, not n². */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = shinglesExploded(df, idCol, textCol, k).localCheckpoint(eager = false)
    val a = sh.select(col("_id").as("id_a"), col("_sh"))
    val b = sh.select(col("_id").as("id_b"), col("_sh"))
    val inter = a.join(b, Seq("_sh")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("_inter"))
    // per-doc shingle counts: one row per document — broadcast both
    // lookup joins instead of shuffling the candidate pairs twice.
    val sizes = sh.groupBy("_id").agg(count(lit(1)).as("_n"))
    // NO broadcast hint on sizes: it is one row per DOCUMENT, i.e.
    // O(corpus) — at 1e8 docs a forced broadcast is the OOM the
    // bootstrapMeanCi size-gate exists for; AQE still broadcasts it
    // automatically whenever it is actually small
    inter
      .join(sizes.withColumnRenamed("_id", "id_a")
        .withColumnRenamed("_n", "_na"), "id_a")
      .join(sizes.withColumnRenamed("_id", "id_b")
        .withColumnRenamed("_n", "_nb"), "id_b")
      .withColumn("jaccard",
        col("_inter").cast("double") / (col("_na") + col("_nb") - col("_inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
