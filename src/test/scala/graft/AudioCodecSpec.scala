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
