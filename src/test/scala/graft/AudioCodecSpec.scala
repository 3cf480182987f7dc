package graft

import graft.mm.Multimodal

class AudioCodecSpec extends SparkSpec {

  test("encodeWav/decodePcm round-trips 16-bit PCM samples exactly") {
    val samples = Array.tabulate(1234)(i => ((i * 37 + 11) % 4096) - 2048)
    val clip = Multimodal.decodePcm(Multimodal.encodeWav(samples, 16000))
    assert(clip != null)
    assert(clip.rate == 16000)
    assert(clip.samples.toSeq == samples.toSeq)
  }

  test("extreme sample values survive the container") {
    val samples = Array(-32768, 32767, 0, -1, 1, -32768, 32767)
    val clip = Multimodal.decodePcm(Multimodal.encodeWav(samples, 8000))
    assert(clip.samples.toSeq == samples.toSeq)
  }

  test("corrupt and empty bytes decode to null, features keep the row") {
    assert(Multimodal.decodePcm(Array[Byte](9, 9, 9, 9)) == null)
    assert(Multimodal.decodePcm(Array.empty[Byte]) == null)
    assert(Multimodal.decodePcm(null) == null)
    val df = Multimodal.toMediaFrame(spark, Seq(
      (1L, Multimodal.encodeWav(Array(100, -100, 50), 8000), "wav", 0, 0, 0L),
      (2L, Array[Byte](1, 2, 3), "bin", 0, 0, 0L)))
    val rows = Multimodal.audioFeatures(df).orderBy("media_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getBoolean(1))
    assert(rows(0).getAs[Long]("zero_crossings") == 2L)
    assert(!rows(1).getBoolean(1))
    assert(rows(1).isNullAt(rows(1).fieldIndex("amp_sum")))
  }

  test("audio_features entry matches hand-computed moments at id 0") {
    val df = SparkEntry.queries("audio_features")(spark, sf)
    val r0 = df.filter("media_id = 0").collect().head
    val n = 800
    val s = Array.tabulate(n)(i => ((i * i * 7 + i * 13) % 4096) - 2048)
    assert(r0.getAs[Long]("n_samples") == n.toLong)
    assert(r0.getAs[Long]("sample_rate") == 8000L)
    assert(r0.getAs[Long]("amp_sum") == s.map(_.toLong).sum)
    assert(r0.getAs[Long]("energy") == s.map(v => v.toLong * v).sum)
    assert(r0.getAs[Long]("amp_min") == s.min.toLong)
    assert(r0.getAs[Long]("amp_max") == s.max.toLong)
  }

  test("audioFingerprint: gain invariance and frame-local perturbation") {
    // doubling every sample scales each frame energy by exactly 4 ->
    // every gradient comparison is preserved; a 10-sample bump inside
    // one frame flips at most that frame's 2 adjacent bits
    val base = Array.tabulate(650)(i => ((i * 11) % 401) - 200)
    val media = Multimodal.toMediaFrame(spark, Seq(
      (0L, Multimodal.encodeWav(base, 8000), "wav", 0, 0, 0L),
      (1L, Multimodal.encodeWav(base.map(_ * 2), 8000), "wav", 0, 0, 0L),
      // boost frame 1 (samples [10, 20)): its base gradient pattern is
      // (e0 < e1 = false, e1 < e2 = true), so a large energy boost
      // provably flips both adjacent bits to (true, false)
      (2L, Multimodal.encodeWav(base.zipWithIndex.map { case (v, i) =>
        if (i >= 10 && i < 20) v + 2000 else v }, 8000), "wav", 0, 0, 0L),
      (3L, Array[Byte](9, 9, 9), "wav", 0, 0, 0L)))
    val h = Multimodal.audioFingerprint(media).orderBy("media_id").collect()
    assert(h(0).getBoolean(1) && !h(3).getBoolean(1) && h(3).isNullAt(2))
    def bands(i: Int) = (2 to 5).map(h(i).getInt)
    assert(bands(0) == bands(1)) // gain invariance
    val flips = bands(0).zip(bands(2))
      .map { case (a, b) => Integer.bitCount(a ^ b) }.sum
    assert(flips >= 1 && flips <= 2, s"perturbation flipped $flips bits")
    // planted pair found by the shared banded kernel
    val nd = Multimodal.bandedNearDups(
        Multimodal.audioFingerprint(media), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(nd.exists(p => p._1 == 0L && p._2 == 2L))
    assert(nd.contains((0L, 1L, 0)))
  }

  test("non-PCM encodings are rejected, not silently mis-decoded") {
    // hand-build a tiny u-law AU file: magic .snd, 24-byte header,
    // encoding 1 (u-law), rate 8000, 1 channel, 4 data bytes
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bos)
    d.writeBytes(".snd"); d.writeInt(24); d.writeInt(4)
    d.writeInt(1); d.writeInt(8000); d.writeInt(1)
    d.write(Array[Byte](0x7f, 0x00, 0x55, 0x2a.toByte))
    assert(Multimodal.decodePcm(bos.toByteArray) == null)
  }
}
