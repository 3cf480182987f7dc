package graft

import org.apache.spark.sql.functions._
import graft.ml.PQ

/** Product quantization: codebook shape, code range, pack/score
  * bit-parity, two-stage refine recall, and determinism. */
class PQSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
  private lazy val query = emb.filter(col("vec_id") === 1)
    .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
  private lazy val cb = PQ.fit(emb, "vec_id", "embedding", m = 8, k = 16)

  test("fit: anchor codebook has m x k sub-centroids of dsub dims") {
    assert(cb.m == 8 && cb.k == 16 && cb.dsub == 8)
    assert(cb.cents.length == 8 && cb.cents.forall(_.length == 16))
  }

  test("fit rejects a dim not divisible by m") {
    val e = intercept[IllegalArgumentException] {
      PQ.fit(emb, "vec_id", "embedding", m = 7, k = 16)
    }
    assert(e.getMessage.contains("not divisible"))
  }

  test("encode: every code is in [0, k) and encoding is deterministic") {
    val codes = PQ.encode(emb, "embedding", cb)
      .select(col("vec_id"), col("codes"))
    val bad = codes.filter(
      exists(col("codes"), c => c < 0 || c >= cb.k)).count()
    assert(bad == 0)
    val a = codes.orderBy("vec_id").collect().toSeq
    val b = PQ.encode(emb, "embedding", cb)
      .select(col("vec_id"), col("codes")).orderBy("vec_id").collect().toSeq
    assert(a == b)
  }

  test("pack: nibbles round-trip the codes array") {
    val packed = PQ.pack(PQ.encode(emb, "embedding", cb), "codes", cb)
    val unpacked = packed.select(col("vec_id"), col("codes"),
      array((0 until cb.m).map(mm =>
        shiftright(col("pq64"), mm * 4).bitwiseAND(lit(15L)).cast("int")): _*)
        .as("roundtrip"))
    assert(unpacked.filter(col("codes") =!= col("roundtrip")).count() == 0)
  }

  test("native pq_encode is bit-identical to the composable encode+pack") {
    val viaHof = PQ.pack(PQ.encode(emb, "embedding", cb), "codes", cb)
      .select("vec_id", "pq64").orderBy("vec_id").collect().toSeq
    val viaNative = PQ.encodePacked(emb, "embedding", cb)
      .select("vec_id", "pq64").orderBy("vec_id").collect().toSeq
    assert(viaHof == viaNative)
  }

  test("pq_encode null policy: short array and null element yield NULL") {
    val df = Seq(
      (1L, Some(Seq.fill(64)(Some(0.5f)))),
      (2L, Some(Seq.fill(10)(Some(0.5f)))),            // too short
      (3L, Some(Some(0.5f) :: List.fill(63)(Option.empty[Float]))),
      (4L, Option.empty[Seq[Option[Float]]])           // null array
    ).toDF("id", "embedding")
    val out = PQ.encodePacked(df, "embedding", cb)
      .orderBy("id").select("pq64").collect()
    assert(!out(0).isNullAt(0))
    assert(out(1).isNullAt(0) && out(2).isNullAt(0) && out(3).isNullAt(0))
  }

  test("pq_encode short GenericArrayData input yields NULL, not a crash") {
    // HOF outputs are GenericArrayData, where isNullAt past the end
    // THROWS (UnsafeArrayData just reads garbage bits) — so the
    // codegen null-element scan must be gated on the length check
    // having passed, like the interpreted path. The no-otherwise
    // when() keeps containsNull=true so the scan is actually emitted.
    val df = spark.range(3).select(col("id"),
      transform(sequence(lit(0), lit(9)),
        i => when(i >= 0, lit(0.5f))).as("embedding"))
    val out = PQ.encodePacked(df, "embedding", cb).select("pq64").collect()
    assert(out.length == 3 && out.forall(_.isNullAt(0)))
  }

  test("packed ADC scoring is bit-identical to codes-array scoring") {
    val enc = PQ.encode(emb, "embedding", cb)
    val packed = PQ.pack(enc, "codes", cb)
    val viaPacked = PQ.adcTopK(packed, "vec_id", "pq64", cb, query, 50)
      .collect().toSeq
    val viaCodes = PQ.adcTopKCodes(enc, "vec_id", "codes", cb, query, 50)
      .collect().toSeq
    assert(viaPacked == viaCodes)
  }

  test("refine: shortlist+exact re-rank recalls most of the true top-15") {
    val packed = PQ.pack(PQ.encode(emb, "embedding", cb), "codes", cb)
    val refined = PQ.refineTopK(packed, emb, "vec_id", "embedding",
        "pq64", cb, query, c = 150, k = 15)
      .select("vec_id").as[Long].collect().toSet
    // exact squared-L2 top-15 (same fold)
    val qLit = array(query.map(lit): _*)
    val d2 = aggregate(
      zip_with(transform(col("embedding"), x => x.cast("double")), qLit,
        (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, v) => acc + v)
    val exact = emb.select(col("vec_id"), d2.as("d2"))
      .orderBy(col("d2"), col("vec_id")).limit(15)
      .select("vec_id").as[Long].collect().toSet
    val recall = refined.intersect(exact).size.toDouble / exact.size
    // 0.87 measured on this table; synthetic near-uniform embeddings
    // are PQ's worst case and c is the dial — the floor is a tripwire
    assert(recall >= 0.6, s"refine recall@15 = $recall")
    // the self-match must survive refinement
    assert(refined.contains(1L))
  }

  test("fitLloyd reduces total quantization distortion vs the anchor init") {
    val vecs = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    def distortion(c: PQ.PQCodebook): Double = vecs.map { v =>
      (0 until c.m).map { mm =>
        (0 until c.k).map { kk =>
          var s = 0.0
          (0 until c.dsub).foreach { d =>
            val t = v(mm * c.dsub + d) - c.cents(mm)(kk)(d); s += t * t
          }
          s
        }.min
      }.sum
    }.sum
    val anchors = PQ.fit(emb, "vec_id", "embedding", m = 8, k = 16)
    val trained = PQ.fitLloyd(emb, "vec_id", "embedding", m = 8, k = 16,
      iters = 3)
    val (da, dt) = (distortion(anchors), distortion(trained))
    // k-means iterations never increase distortion (6-dp centroid
    // rounding can wiggle the last decimals — allow 0.1%)
    assert(dt <= da * 1.001, s"trained distortion $dt vs anchors $da")
    assert(dt < da * 0.9, s"training should actually help: $dt vs $da")
  }

  test("byte-code config (k=256) packs and scores through the same long") {
    // 256 distinct 4-dim float vectors; m=2, k=256 -> 8-bit fields
    val df = (0 until 300).map { i =>
      (i.toLong, Seq(i.toFloat, (i % 7).toFloat, -i.toFloat, 0.5f * i))
    }.toDF("vec_id", "embedding")
    val cb = PQ.fit(df, "vec_id", "embedding", m = 2, k = 256)
    assert(cb.bits == 8)
    val enc = PQ.encode(df, "embedding", cb)
    val viaHof = PQ.pack(enc, "codes", cb).select("vec_id", "pq64")
      .orderBy("vec_id").collect().toSeq
    val viaNative = PQ.encodePacked(df, "embedding", cb)
      .select("vec_id", "pq64").orderBy("vec_id").collect().toSeq
    assert(viaHof == viaNative)
    val q = Seq(10.0, 3.0, -10.0, 5.0)
    val a = PQ.adcTopK(PQ.encodePacked(df, "embedding", cb), "vec_id",
      "pq64", cb, q, 20).collect().toSeq
    val b = PQ.adcTopKCodes(enc, "vec_id", "codes", cb, q, 20)
      .collect().toSeq
    assert(a == b)
  }

  test("dropSeenByCode filters a stream by quantized identity + cosine") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq(
      (1L, Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (2L, Seq(0f, 1f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (3L, Seq(0f, 0f, 0f, 0f, 1f, 1f, 0f, 0f)),
      (4L, Seq(5f, 5f, 5f, 5f, -5f, -5f, -5f, -5f))
    ).toDF("vec_id", "embedding")
    val cb = PQ.fit(corpus, "vec_id", "embedding", m = 2, k = 4)
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val q = PQ.dropSeenByCode(in.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding", corpus, "embedding", cb, threshold = 0.999)
      .writeStream.format("memory").queryName("pqdsv")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    // 100 = exact re-arrival of corpus 1 (same code, cos 1 -> drop);
    // 101 = tiny perturbation of corpus 4 (same cell, cos ~1 -> drop);
    // 102 = far from everything (novel -> keep)
    in.addData(
      (100L, Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (101L, Seq(5.001f, 5f, 5f, 5f, -5f, -5f, -5f, -5f)),
      (102L, Seq(-9f, 3f, 7f, -2f, 8f, -6f, 1f, 4f)))
    q.processAllAvailable()
    val kept = spark.table("pqdsv").select("vec_id").as[Long].collect().toSet
    q.stop()
    assert(kept == Set(102L), s"stream survivors $kept")
    // stateless plan: identical result in batch mode
    val batchKept = PQ.dropSeenByCode(
        Seq((100L, Seq(1f, 0f, 0f, 0f, 0f, 0f, 0f, 0f)),
            (101L, Seq(5.001f, 5f, 5f, 5f, -5f, -5f, -5f, -5f)),
            (102L, Seq(-9f, 3f, 7f, -2f, 8f, -6f, 1f, 4f)))
          .toDF("vec_id", "embedding"),
        "vec_id", "embedding", corpus, "embedding", cb, threshold = 0.999)
      .select("vec_id").as[Long].collect().toSet
    assert(batchKept == kept)
  }

  test("IVFADC: residual codes + per-bucket LUT recover the cosine top-15") {
    val idx = graft.ml.Similarity.ivfIndex(emb, "vec_id", "embedding",
      nlist = 4)
    val pqIdx = idx.withPQ(m = 8, k = 16, iters = 2)
    try {
      val exact = graft.ml.Similarity
        .cosineTopK(emb, "embedding", "vec_id", query, 15)
        .select("vec_id").as[Long].collect().toSet
      // all buckets probed + a generous shortlist: the only loss left
      // is the L2-residual ADC shortlist ordering
      val got = pqIdx.searchPQ(query, k = 15, nprobe = 4, refineC = 200)
        .select("vec_id").as[Long].collect().toSet
      val recall = exact.intersect(got).size.toDouble / exact.size
      assert(recall >= 0.8, s"IVFADC recall@15 = $recall")
      assert(got.contains(1L), "self-match must survive")
      // searchPQ without withPQ must refuse loudly
      val e = intercept[IllegalArgumentException] {
        idx.searchPQ(query, k = 5)
      }
      assert(e.getMessage.contains("withPQ"))
      // batched path returns the same per-query sets as the single path
      val q2 = emb.filter(col("vec_id") === 5)
        .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
      val batch = pqIdx.searchManyPQ(
          Seq(1L -> query, 5L -> q2), k = 15, nprobe = 4, refineC = 200)
        .collect().groupBy(_.getLong(0))
        .map { case (qid, rs) => qid -> rs.map(_.getLong(1)).toSet }
      val single1 = pqIdx.searchPQ(query, 15, nprobe = 4, refineC = 200)
        .select("vec_id").as[Long].collect().toSet
      val single5 = pqIdx.searchPQ(q2, 15, nprobe = 4, refineC = 200)
        .select("vec_id").as[Long].collect().toSet
      assert(batch(1L) == single1 && batch(5L) == single5)
    } finally { pqIdx.unpersist(); idx.unpersist() }
  }

  test("refine requires c >= k") {
    val packed = PQ.pack(PQ.encode(emb, "embedding", cb), "codes", cb)
    intercept[IllegalArgumentException] {
      PQ.refineTopK(packed, emb, "vec_id", "embedding", "pq64",
        cb, query, c = 5, k = 15)
    }
  }
}
