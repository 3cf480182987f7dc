package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.io.{Dta, Sas, Sav, Xpt}

/** Property fuzz of the four statistical-codec kernels at the parser
  * level (writer → parseMeta/rows, no Spark session): random finite
  * doubles (plus NaN → missing), random non-blank unicode strings,
  * random nulls, random shapes — decoded rows must equal the written
  * rows under each format's documented null rules. The range guards
  * (IBM 16^63, Stata 2^1023 ladder, sysmis sentinel) get explicit
  * refusal cases. */
class CodecPropertySpec extends AnyFunSuite {

  private def forSamples[A](gen: Gen[A], n: Int = 25)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(1234L + i)).foreach(f)
    }

  // strings: no trailing blanks (every codec right-strips pads), never
  // all-blank (pads decode to null); mixed ascii + multi-byte UTF-8
  private val strGen: Gen[String] = for {
    base <- Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('é', 'δ', 'ü', '中', '_', '-')))
  } yield ("s" + base.mkString).take(24)

  private val numGen: Gen[java.lang.Double] = Gen.frequency(
    6 -> Gen.choose(-1e15, 1e15).map(java.lang.Double.valueOf),
    2 -> Gen.oneOf(0.0, -0.0, 1.0, -1.0, 0.25, 1e-60, -3.5e12, 7.0e75 / 10)
      .map(java.lang.Double.valueOf),
    1 -> Gen.const(java.lang.Double.valueOf(Double.NaN)),
    1 -> Gen.const(null: java.lang.Double))

  private val rowsGen: Gen[Seq[Seq[Any]]] = for {
    n <- Gen.choose(1, 40)
    rows <- Gen.listOfN(n, for {
      a <- numGen
      b <- Gen.frequency(4 -> strGen, 1 -> Gen.const(null: String))
      c <- numGen
    } yield Seq[Any](a, b, c))
  } yield rows

  private val cols = Seq(("a", true), ("b", false), ("c", true))

  /** The written cell's expected read-back under the null rules. */
  private def norm(v: Any): Any = v match {
    case d: java.lang.Double if d == null || d.isNaN => null
    case d: java.lang.Double => java.lang.Double.valueOf(d.doubleValue())
    case s: String if s == null || s.isEmpty => null
    case other => other
  }

  private def unbox(r: Seq[Any]): Seq[Any] = r.map(norm)

  test("sas7bdat: dumps → parse round-trips under the null rules") {
    forSamples(rowsGen) { rows =>
      val blob = Sas.dumps(cols, rows)
      val meta = Sas.parseMeta(blob)
      val got = Sas.rows(blob, meta).toSeq
      assert(got.map(unbox) === rows.map(unbox))
    }
  }

  test("sav: both codecs round-trip under the null rules") {
    forSamples(rowsGen) { rows =>
      Seq(false, true).foreach { bc =>
        val blob = Sav.dumps(cols, rows, bytecode = bc)
        val meta = Sav.parseMeta(blob)
        val got = Sav.rows(blob, meta).toSeq
        assert(got.map(unbox) === rows.map(unbox), s"bytecode=$bc")
      }
    }
  }

  test("dta: dumps → parse round-trips under the null rules") {
    forSamples(rowsGen) { rows =>
      val blob = Dta.dumps(cols, rows)
      val meta = Dta.parseMeta(blob)
      val got = Dta.rows(blob, meta).toSeq
      assert(got.map(unbox) === rows.map(unbox))
    }
  }

  test("xpt: dumps → parse round-trips (IEEE ⊂ IBM in range)") {
    forSamples(rowsGen) { rows =>
      val blob = Xpt.dumps(cols, rows)
      val meta = Xpt.parseMeta(blob)
      val got = Xpt.rows(blob, meta).toSeq
      // xpt uppercases names but positions are unchanged
      assert(got.map(unbox) === rows.map(unbox))
    }
  }

  test("range guards refuse what each format cannot hold") {
    val e1 = intercept[IllegalArgumentException] {
      Xpt.dumps(Seq(("a", true)), Seq(Seq[Any](1e100)))
    }
    assert(e1.getMessage.contains("IBM float range"))
    intercept[IllegalArgumentException] {
      Xpt.dumps(Seq(("a", true)), Seq(Seq[Any](Double.PositiveInfinity)))
    }
    val e2 = intercept[IllegalArgumentException] {
      Dta.dumps(Seq(("a", true)), Seq(Seq[Any](1.5e308)))
    }
    assert(e2.getMessage.contains("missing-value range"))
    val e3 = intercept[IllegalArgumentException] {
      Sav.dumps(Seq(("a", true)), Seq(Seq[Any](-java.lang.Double.MAX_VALUE)))
    }
    assert(e3.getMessage.contains("sysmis"))
    // sub-IBM-normal underflows to zero, the standard float semantics
    val tiny = Xpt.dumps(Seq(("a", true)), Seq(Seq[Any](1e-90)))
    val got = Xpt.rows(tiny, Xpt.parseMeta(tiny)).toSeq
    assert(got === Seq(Seq(0.0)))
  }
}
