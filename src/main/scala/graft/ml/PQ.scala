package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the memory-bound scale path
  * past int8: a dim-D float vector becomes M sub-space code indices.
  * With M=8 sub-spaces and K=16 centroids each, the whole code packs
  * into the low 32 bits of ONE BIGINT (4 bits per sub-space) — a 32×
  * smaller scan than the 256-byte f32 vector, and scoring is M table
  * lookups instead of D multiplies.
  *
  * Reference adjacency: the ANN/similarity family this engine already
  * carries (`gofast` quantile/distance utilities; see
  * ml/Similarity.scala) — PQ is the standard third rung of the
  * brute → int8 → coded ladder for a 100 TB embedding store.
  *
  * Replayability: instead of a k-means codebook (not SQL-replayable),
  * [[fit]] uses deterministic ANCHOR SAMPLING — the K rows with the
  * smallest `md5(cast(id as string))` donate their sub-vectors as
  * centroids. Random-sample codebooks are the standard PQ
  * initialization (Jégou §V.A trains k-means FROM such a sample; we
  * stop at the sample), and hash-order selection means an external
  * SQL engine derives the identical codebook, codes, and ADC scores
  * from the same parquet — the `pq_topk` entry is a full hash-checked
  * oracle, not a recall bound.
  *
  * Scale design: the codebook is K·M·dsub doubles (bounded driver
  * collect of K rows, broadcast as literals); encode and score are
  * pure row-independent codegen expressions — no shuffle anywhere
  * except the final top-k, which uses orderBy().limit() (Spark's
  * TakeOrderedAndProject: per-partition heaps, never a global sort).
  */
object PQ {

  /** cents(m)(k)(d): centroid d-th component of code k in sub-space m.
    * Codes pack at 4 bits per sub-space when k ≤ 16, else 8 bits
    * (k ≤ 256 — the classic PQ "m×8-bit" config of Jégou §V). */
  final case class PQCodebook(m: Int, k: Int, dsub: Int,
                              cents: Array[Array[Array[Double]]]) {
    require(cents.length == m && cents.forall(_.length == k) &&
      cents.forall(_.forall(_.length == dsub)), "codebook shape mismatch")
    /** Bits per packed code: nibbles for k ≤ 16, bytes for k ≤ 256. */
    val bits: Int = if (k <= 16) 4 else 8
    require(k <= 256 && m * bits <= 64,
      s"codes must fit one long: k=$k (bits=$bits), m=$m")
  }

  /** Sub-space squared-L2 distance to a centroid, as a left-fold in
    * element order — the same fold DuckDB's `list_sum(list_transform)`
    * performs, so intermediate doubles agree bit-for-bit. */
  private def subDist2(vecCol: Column, start: Int, cent: Array[Double]): Column = {
    val sub = transform(slice(vecCol, start + 1, cent.length),
      x => x.cast("double"))
    val centLit = array(cent.map(lit): _*)
    aggregate(zip_with(sub, centLit, (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, v) => acc + v)
  }

  /** Driver-side mirror of [[subDist2]] (same element-order fold). */
  private def subDist2Local(q: Seq[Double], start: Int, cent: Array[Double]): Double = {
    var s = 0.0
    var d = 0
    while (d < cent.length) { val t = q(start + d) - cent(d); s += t * t; d += 1 }
    s
  }

  /** Anchor-sampled codebook: the `k` rows with the smallest
    * `md5(cast(idCol as string))` (id tiebreak), in hash order, donate
    * their sub-vectors. Bounded collect: k rows. */
  def fit(df: DataFrame, idCol: String, vecCol: String,
          m: Int, k: Int): PQCodebook = {
    val dim = df.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim=$dim not divisible by m=$m")
    val dsub = dim / m
    val anchors = df
      .select(md5(col(idCol).cast("string").cast("binary")).as("_h"),
        col(idCol).cast("string").as("_id"), col(vecCol).as("_v"))
      .orderBy(col("_h"), col("_id"))
      .limit(k)
      .collect()
      .sortBy(r => (r.getString(0), r.getString(1)))
      .map(_.getSeq[Float](2).map(_.toDouble).toArray)
    require(anchors.length == k, s"need >= $k rows to fit, got ${anchors.length}")
    val cents = Array.tabulate(m, k) { (mm, kk) =>
      java.util.Arrays.copyOfRange(anchors(kk), mm * dsub, (mm + 1) * dsub)
    }
    PQCodebook(m, k, dsub, cents)
  }

  /** Per-row codes: code(m) = argmin over k of sub-space distance,
    * first-minimum tiebreak (= smallest k). Adds `codes`
    * (array<int>, length M). Pure codegen, row-independent. */
  def encode(df: DataFrame, vecCol: String, cb: PQCodebook,
             outCol: String = "codes"): DataFrame = {
    val codeCols = (0 until cb.m).map { mm =>
      val dists = array((0 until cb.k).map(kk =>
        subDist2(col(vecCol), mm * cb.dsub, cb.cents(mm)(kk))): _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    df.withColumn(outCol, array(codeCols: _*))
  }

  /** Codes packed little-field-first into one BIGINT:
    * Σ code(m)·2^(bits·m), `bits` = 4 (k ≤ 16) or 8 (k ≤ 256). This is
    * the scan column a 100 TB store persists — 8 bytes per vector vs
    * 256 for the f32 array, a 32× smaller scan, fixed-width so parquet
    * encodes it tightly. (A signed 32-bit pack would overflow ANSI
    * arithmetic on the top field, so the long is the honest
    * container.) */
  def pack(df: DataFrame, codesCol: String, cb: PQCodebook,
           outCol: String = "pq64"): DataFrame = {
    // code fields are disjoint, so the pack is a plain sum of shifts
    df.withColumn(outCol,
      (0 until cb.m).map(mm =>
        element_at(col(codesCol), mm + 1).cast("long") *
          lit(1L << (cb.bits * mm)))
        .reduce(_ + _))
  }

  /** Lloyd-trained codebook — the published PQ fit (Jégou §V.A: k-means
    * per sub-space from a sampled init). Starts from the [[fit]]
    * anchors, then iterates: assign every (sampled) vector's sub-codes
    * with the NATIVE encode kernel (one codegen pass), recompute each
    * (sub-space, code) centroid as the mean of its assigned
    * sub-vectors (ONE groupBy over m·n exploded rows → ≤ m·k groups,
    * bounded collect), empty cells keep their old centroid. NOT
    * SQL-replayable (float mean over an unordered group — the same
    * reason `ivfIndex`'s KMeans fit is rows-only); the oracle entries
    * keep the anchor codebook, this is the QUALITY path a real
    * deployment trains. Centroids round to 6 dp per iteration so
    * repeated fits land on the same grid. */
  def fitLloyd(df: DataFrame, idCol: String, vecCol: String,
               m: Int, k: Int, iters: Int = 3,
               sampleFraction: Double = 1.0): PQCodebook = {
    require(iters >= 0 && sampleFraction > 0.0 && sampleFraction <= 1.0,
      "need iters >= 0 and sampleFraction in (0, 1]")
    var cb = fit(df, idCol, vecCol, m, k)
    val sample = (if (sampleFraction < 1.0)
      df.sample(withReplacement = false, sampleFraction, seed = 42L)
    else df).select(col(vecCol).as("_v")).persist()
    try {
      for (_ <- 1 to iters) {
        val mask = (1L << cb.bits) - 1L
        val codeArr = array((0 until m).map(mm =>
          struct(lit(mm).as("_mm"),
            shiftright(col("_pq"), mm * cb.bits).bitwiseAND(lit(mask))
              .cast("int").as("_code"))): _*)
        val coded = encodePacked(sample, "_v", cb, "_pq")
          .select(col("_v"), explode(codeArr).as("_mc"))
          .select(col("_v"), col("_mc._mm").as("_mm"),
            col("_mc._code").as("_code"))
        val dims = (0 until cb.dsub).map(d =>
          avg(element_at(col("_v"), col("_mm") * cb.dsub + d + 1)
            .cast("double")).as(s"_c$d"))
        val updated = coded.groupBy("_mm", "_code").agg(dims.head, dims.tail: _*)
          .collect()
        val cents = cb.cents.map(_.map(_.clone()))
        updated.foreach { r =>
          val mm = r.getInt(0); val kk = r.getInt(1)
          (0 until cb.dsub).foreach { d =>
            val v = r.getDouble(2 + d)
            cents(mm)(kk)(d) =
              BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
                .toDouble
          }
        }
        cb = PQCodebook(m, k, cb.dsub, cents)
      }
      cb
    } finally sample.unpersist()
  }

  /** Encode + pack in ONE native codegen pass
    * ([[graft.functions.PQEncodeI64]]): the ingest-time kernel a 100 TB
    * store runs once per vector. Bit-equal to
    * `pack(encode(df, ...), ...)` — same left-fold distances, same
    * first-minimum argmin — but the codebook rides as a reference
    * double[] inside whole-stage codegen instead of a 128-way
    * interpreted HOF tree (~40× faster at 1M vectors). */
  def encodePacked(df: DataFrame, vecCol: String, cb: PQCodebook,
                   outCol: String = "pq64"): DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val expr = graft.functions.PQEncodeI64(
      GraftColumnBridge.toExpr(df.sparkSession, col(vecCol)),
      cb.m, cb.k, cb.cents.flatten.flatten.toIndexedSeq)
    df.withColumn(outCol, GraftColumnBridge.toColumn(expr))
  }

  /** The ADC distance column over a packed code column: the query's
    * per-(m,k) sub-distances become an M·K literal lookup table; each
    * row's approximate squared-L2 distance is M nibble-extract +
    * lookups, summed in sub-space order (left-to-right — the fold an
    * external engine's ordered list_sum replays). */
  /** Flat per-(m,k) LUT of sub-space distances query↔centroid —
    * `lut((mm·k + kk))` — shared by the single-codebook and the
    * per-bucket IVFADC paths. */
  private[graft] def lutFor(cb: PQCodebook, query: Seq[Double]): Array[Double] = {
    require(query.length == cb.m * cb.dsub, "query dim mismatch")
    Array.tabulate(cb.m, cb.k)((mm, kk) =>
      subDist2Local(query, mm * cb.dsub, cb.cents(mm)(kk))).flatten
  }

  /** ADC distance from a caller-supplied LUT (IVFADC computes one per
    * probed bucket from the residual query). */
  private[graft] def adcDistFromLut(packedCol: Column, cb: PQCodebook,
                                    flatLut: Seq[Double]): Column = {
    // ONE Literal node, not an m·k-child array(lit…) tree: the
    // constructed form makes every optimizer pass walk thousands of
    // nodes per call, and with per-bucket LUTs (IVFADC) the plan-time
    // cost exceeded the scan itself
    val lutLit = typedlit(flatLut.toIndexedSeq)
    val mask = (1L << cb.bits) - 1L
    (0 until cb.m).map { mm =>
      element_at(lutLit, (shiftright(packedCol, mm * cb.bits)
        .bitwiseAND(lit(mask)) + lit(mm.toLong * cb.k + 1)).cast("int"))
    }.reduce(_ + _)
  }

  private def adcDist(packedCol: Column, cb: PQCodebook,
                      query: Seq[Double]): Column =
    adcDistFromLut(packedCol, cb, lutFor(cb, query).toIndexedSeq)

  /** Residual encode + pack ([[graft.functions.PQEncodeResidualI64]]):
    * codes quantize `vec − cent` without ever materializing the
    * residual array — the IVFADC ingest path. `centCol` must be
    * array<double> (e.g. the coarse centroid looked up per row). */
  def encodeResidualPacked(df: DataFrame, vecCol: String, centCol: Column,
                           cb: PQCodebook, outCol: String = "pq64")
      : DataFrame = {
    import org.apache.spark.sql.GraftColumnBridge
    val expr = graft.functions.PQEncodeResidualI64(
      GraftColumnBridge.toExpr(df.sparkSession, col(vecCol)),
      GraftColumnBridge.toExpr(df.sparkSession, centCol),
      cb.m, cb.k, cb.cents.flatten.flatten.toIndexedSeq)
    df.withColumn(outCol, GraftColumnBridge.toColumn(expr))
  }

  /** ADC top-k over the packed code column. Ascending distance, id
    * tiebreak, `ad2` rounded to 9 so an external engine's replay
    * hash-matches. */
  def adcTopK(df: DataFrame, idCol: String, packedCol: String,
              cb: PQCodebook, query: Seq[Double], k: Int): DataFrame =
    df.select(col(idCol), round(adcDist(col(packedCol), cb, query), 9).as("ad2"))
      .orderBy(col("ad2").asc, col(idCol).asc)
      .limit(k)

  /** Two-stage search — the production PQ pattern (Jégou §VII): the
    * 8-byte code scan shortlists `c` candidates by ADC distance, then
    * only those `c` full vectors are re-ranked by EXACT squared-L2.
    * Recall is the shortlist-containment probability and `c` is the
    * dial; the refine step reads c ≪ n full vectors via a broadcast
    * semi-join (at 100 TB: the code scan touches 8 bytes/vector, the
    * f32 fetch only the shortlist). Shortlist ordering uses the
    * UNROUNDED ADC distance — both engines compute it bit-identically,
    * so the candidate set replays exactly. */
  def refineTopK(packedDf: DataFrame, embDf: DataFrame, idCol: String,
                 vecCol: String, packedCol: String, cb: PQCodebook,
                 query: Seq[Double], c: Int, k: Int): DataFrame = {
    require(c >= k, "shortlist must be at least k")
    val shortlist = packedDf
      .select(col(idCol), adcDist(col(packedCol), cb, query).as("_ad2"))
      .orderBy(col("_ad2").asc, col(idCol).asc)
      .limit(c)
      .select(col(idCol))
    val qLit = array(query.map(lit): _*)
    val d2 = aggregate(
      zip_with(transform(col(vecCol), x => x.cast("double")), qLit,
        (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, v) => acc + v)
    embDf.join(broadcast(shortlist), Seq(idCol), "left_semi")
      .select(col(idCol), round(d2, 9).as("d2"))
      .orderBy(col("d2").asc, col(idCol).asc)
      .limit(k)
  }

  /** Dedup-on-ingest by quantized identity — the PQ companion of
    * `IvfIndex.dropSeenVectors`: an arriving vector is dropped when
    * some corpus vector has the SAME 8-byte code AND exact cosine ≥
    * `threshold`. The blocking key is the packed code, so the plan is
    * a stream-static EQUI-join (stream-legal, append mode, no state);
    * at 100 TB the corpus side is its 8-byte code column + vector,
    * hash-partitioned on the code, and each arrival meets only its
    * quantized-identical candidates. Coarser recall than the
    * IVF-bucket screen (a near-dup that crosses a cell boundary
    * escapes) — this is the cheap first rung; compose with
    * `dropSeenVectors` when recall matters more than cost. The plan is
    * stateless, so the same call also runs in batch. */
  def dropSeenByCode(stream: DataFrame, streamIdCol: String,
                     streamVecCol: String, corpus: DataFrame,
                     corpusVecCol: String, cb: PQCodebook,
                     threshold: Double): DataFrame = {
    val sPacked = encodePacked(stream, streamVecCol, cb, "_pq_in")
    val staticSide = encodePacked(corpus, corpusVecCol, cb, "_pq_s")
      .select(col("_pq_s"), col(corpusVecCol).as("_v_s"))
    sPacked.join(staticSide,
        col("_pq_in") === col("_pq_s") &&
          Similarity.cosineNative(sPacked, col(streamVecCol),
            col("_v_s")) >= threshold,
        "left_anti")
      .drop("_pq_in")
  }

  /** Unpacked-scoring twin of [[adcTopK]] (reads the codes array) —
    * used by the spec to assert pack/score bit-parity. */
  def adcTopKCodes(df: DataFrame, idCol: String, codesCol: String,
                   cb: PQCodebook, query: Seq[Double], k: Int): DataFrame = {
    val lut = Array.tabulate(cb.m, cb.k)((mm, kk) =>
      subDist2Local(query, mm * cb.dsub, cb.cents(mm)(kk)))
    val lutLit = array(lut.flatten.map(lit): _*)
    val ad2 = aggregate(
      zip_with(col(codesCol), sequence(lit(0), lit(cb.m - 1)),
        (c, mm) => element_at(lutLit, mm * cb.k + c + 1)),
      lit(0.0), (acc, v) => acc + v)
    df.select(col(idCol), round(ad2, 9).as("ad2"))
      .orderBy(col("ad2").asc, col(idCol).asc)
      .limit(k)
  }
}
