package graft

import org.apache.spark.sql.functions._
import graft.io.Npy

/** npy/npz ingest against GOLDEN fixtures written by numpy itself
  * (src/test/resources/npy — generated with np.save/np.savez, so the
  * parser is checked against the real producer, not a self-written
  * encoder). */
class NpySpec extends SparkSpec {
  import spark.implicits._

  private val dir = "src/test/resources/npy"

  private def coo(file: String) =
    Npy.readNpy(spark, s"$dir/$file")
      .select($"coords", $"value", $"value_long", $"dtype")

  test("f8 1-D: exact doubles, coords, dtype") {
    val got = coo("f8_1d.npy").orderBy(element_at($"coords", 1))
      .as[(Seq[Long], Double, Option[Long], String)].collect()
    assert(got.map(_._2).toSeq === Seq(1.5, -2.25, 3.75, 0.0, 1e300))
    assert(got.map(_._1).toSeq === (0 until 5).map(i => Seq(i.toLong)))
    assert(got.forall(_._3.isEmpty) && got.forall(_._4 == "<f8"))
  }

  test("f4 2-D: C-order coords and widened float values") {
    val got = coo("f4_2d.npy")
      .orderBy(element_at($"coords", 1), element_at($"coords", 2))
      .as[(Seq[Long], Double, Option[Long], String)].collect()
    assert(got.length === 12)
    got.zipWithIndex.foreach { case ((c, v, _, _), k) =>
      assert(c === Seq(k / 4L, k % 4L))
      assert(v === k * 0.5) // exact in f4 and f8
    }
  }

  test("i8 1-D: value_long exact at +-2^53, value is the double view") {
    val got = coo("i8_1d.npy").orderBy(element_at($"coords", 1))
      .as[(Seq[Long], Double, Option[Long], String)].collect()
    assert(got.map(_._3.get).toSeq ===
      Seq(-9007199254740992L, 0L, 42L, 9007199254740992L))
    assert(got.map(_._2).toSeq === got.map(_._3.get.toDouble).toSeq)
  }

  test("i4 / u1 / b1 dtypes decode with exact integer payloads") {
    val i4 = coo("i4_2d.npy")
      .orderBy(element_at($"coords", 1), element_at($"coords", 2))
      .select($"value_long").as[Long].collect()
    assert(i4.toSeq === Seq(1L, -2L, 3L, -4L, 5L, -6L))
    val u1 = coo("u1_1d.npy").orderBy(element_at($"coords", 1))
      .select($"value_long").as[Long].collect()
    assert(u1.toSeq === Seq(0L, 127L, 255L))
    val b1 = coo("b1_1d.npy").orderBy(element_at($"coords", 1))
      .select($"value_long").as[Long].collect()
    assert(b1.toSeq === Seq(1L, 0L, 1L))
  }

  test("fortran-order file lands on the same logical matrix") {
    val f = Npy.readNpyMatrix(spark, s"$dir/f8_2d_fortran.npy")
      .orderBy("row").select($"values").as[Seq[Double]].collect()
    assert(f.toSeq === Seq(Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)))
  }

  test("readNpyMatrix: 2-D per-row vectors, 1-D one whole vector") {
    val m = Npy.readNpyMatrix(spark, s"$dir/f4_2d.npy")
      .orderBy("row").select($"row", $"values")
      .as[(Long, Seq[Double])].collect()
    assert(m.map(_._1).toSeq === Seq(0L, 1L, 2L))
    assert(m(1)._2 === (4 until 8).map(_ * 0.5))
    val v = Npy.readNpyMatrix(spark, s"$dir/f8_1d.npy")
      .select($"row", $"values").as[(Long, Seq[Double])].collect()
    assert(v.length === 1 && v.head._1 === 0L)
    assert(v.head._2 === Seq(1.5, -2.25, 3.75, 0.0, 1e300))
  }

  test("npz archives: stored and deflated entries, names stripped") {
    val z = Npy.readNpz(spark, s"$dir/pair.npz")
    val names = z.select($"array_name").distinct().as[String].collect()
    assert(names.toSet === Set("alpha", "beta"))
    val beta = z.filter($"array_name" === "beta")
      .orderBy(element_at($"coords", 1), element_at($"coords", 2))
      .select($"value_long").as[Long].collect()
    assert(beta.toSeq === Seq(7L, 8L, 9L, 10L))
    val g = Npy.readNpz(spark, s"$dir/pair_c.npz")
      .orderBy(element_at($"coords", 1))
      .select($"value").as[Double].collect()
    assert(g.toSeq === Seq(3.5, 4.5)) // deflated entry
  }

  test("IO.readData dispatches .npy and .npz by extension") {
    assert(graft.io.IO.readData(spark, s"$dir/f8_1d.npy").count() === 5L)
    assert(graft.io.IO.readData(spark, s"$dir/pair.npz")
      .select($"array_name").distinct().count() === 2L)
  }

  test("empty arrays, bad magic and unsupported dtypes refuse loudly") {
    assert(coo("f4_1d_empty.npy").count() === 0L)
    intercept[IllegalArgumentException] {
      Npy.parseHeader("not an npy".getBytes)
    }
    // hand-build a big-endian header: the parser must refuse, not
    // silently byte-swap
    val hdr = "{'descr': '>f8', 'fortran_order': False, 'shape': (1,), }"
    val pad = hdr + " " * (63 - hdr.length % 64) + "\n"
    val bytes = Array[Byte](0x93.toByte, 'N', 'U', 'M', 'P', 'Y', 1, 0,
      (pad.length & 0xff).toByte, ((pad.length >> 8) & 0xff).toByte) ++
      pad.getBytes ++ new Array[Byte](8)
    intercept[IllegalArgumentException] { Npy.parseHeader(bytes) }
  }
}
