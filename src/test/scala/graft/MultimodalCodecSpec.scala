package graft

import graft.mm.Multimodal
import graft.entries.Batch18Entries

/** The real javax.imageio codec path: lossless container round-trips,
  * analytic moment parity, resize floor-sampling, corrupt-input
  * handling. */
class MultimodalCodecSpec extends SparkSpec {
  import spark.implicits._

  private def f(id: Int)(x: Int, y: Int): Int = (x * 7 + y * 13 + id * 31) % 256

  test("bmp encode/decode round-trip is pixel-exact") {
    val img = Multimodal.decodeGray(Multimodal.encodeBmp(5, 3, f(2)))
    assert(img.w == 5 && img.h == 3)
    for (y <- 0 until 3; x <- 0 until 5)
      assert(img.px(y * 5 + x) == f(2)(x, y), s"($x,$y)")
  }

  test("png encode/decode round-trip is pixel-exact") {
    val img = Multimodal.decodeGray(Multimodal.encodePng(7, 4, f(5)))
    assert(img.w == 7 && img.h == 4)
    for (y <- 0 until 4; x <- 0 until 7)
      assert(img.px(y * 7 + x) == f(5)(x, y), s"($x,$y)")
  }

  test("nearest-neighbor resize samples floor coordinates") {
    // 4×2 source with px(x,y) = 10*y + x; 2×2 thumb samples
    // (tx*4/2, ty*2/2) = (0,0), (2,0), (0,1), (2,1)
    val src = Multimodal.GrayImage(4, 2, Array(0, 1, 2, 3, 10, 11, 12, 13))
    assert(Multimodal.resizeNearest(src, 2).toSeq == Seq(0, 2, 10, 12))
  }

  test("imageFeatures matches analytic moments computed in-process") {
    val rows = Batch18Entries.syntheticBmps(spark)
    val got = Multimodal.imageFeatures(rows, thumbSide = 8)
      .orderBy("media_id").collect()
    assert(got.length == 24)
    got.foreach { r =>
      val id = r.getLong(0).toInt
      val w = 16 + (id % 3) * 4
      val h = 12 + (id % 2) * 6
      val thumb = for (ty <- 0 until 8; tx <- 0 until 8)
        yield f(id)(tx * w / 8, ty * h / 8)
      val sum = thumb.map(_.toLong).sum
      val sumSq = thumb.map(v => v.toLong * v).sum
      assert(r.getBoolean(1), s"id=$id not ok")
      assert(r.getLong(2) == w && r.getLong(3) == h)
      assert(r.getLong(4) == thumb.min && r.getLong(5) == thumb.max)
      assert(r.getLong(6) == sum)
      assert(r.getDouble(7) == sum.toDouble / 64)
      assert(r.getDouble(8) == (64L * sumSq - sum * sum).toDouble / 4096)
    }
  }

  test("undecodable or null content keeps the row with ok=false") {
    val media = Multimodal.toMediaFrame(spark, Seq(
      (1L, Array[Byte](1, 2, 3, 4), "bin", 0, 0, 0L),
      (2L, null, "png", 0, 0, 0L),
      (3L, Multimodal.encodeBmp(8, 8, f(0)), "bmp", 8, 8, 0L)))
    val out = Multimodal.imageFeatures(media).orderBy("media_id").collect()
    assert(out.length == 3)
    assert(!out(0).getBoolean(1) && out(0).isNullAt(7))
    assert(!out(1).getBoolean(1))
    assert(out(2).getBoolean(1) && out(2).getLong(2) == 8)
  }

  test("byte-histogram features are a real normalized histogram") {
    val media = Multimodal.toMediaFrame(spark, Seq(
      (1L, Array[Byte](0, 0, 0, -1), "bin", 0, 0, 0L))) // 3× bucket 0, 1× bucket 7 (0xff)
    val feat = Multimodal.decodeFeatures(media, dim = 8)
      .orderBy("media_id").as[(Long, Seq[Float], Int)].collect()
    assert(feat.head._3 == 4)
    assert(feat.head._2 == Seq(0.75f, 0f, 0f, 0f, 0f, 0f, 0f, 0.25f))
  }
}
