package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.io.Fwf

/** Property fuzz of the fixed-width kernel: random schemas rendered as
  * fixed-width text (left-justified cells, 2-space gutters — gutters
  * stay blank in every line, so the all-blank-column rule must recover
  * the layout exactly), then parsed back. Checks boundary inference,
  * sampled type inference (long → double → string), blank-cell nulls
  * and header naming in one pass. */
class FwfPropertySpec extends SparkSpec {
  import spark.implicits._

  private def forSamples[A](gen: Gen[A], n: Int = 12)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(77L + i)).foreach(f)
    }

  private val nameGen = Gen.choose(1, 6).flatMap(k =>
    Gen.listOfN(k, Gen.alphaLowerChar).map(_.mkString))

  private sealed trait ColType
  private case object L extends ColType
  private case object D extends ColType
  private case object S extends ColType

  private val colGen: Gen[(String, ColType)] =
    Gen.zip(nameGen, Gen.oneOf(L, D, S))

  private def cellGen(t: ColType): Gen[Option[String]] = {
    val v = t match {
      case L => Gen.choose(-99999L, 99999L).map(_.toString)
      case D => Gen.choose(-9999, 9999).map(n => (n / 8.0).toString)
      case S => Gen.choose(1, 8).flatMap(k =>
        Gen.listOfN(k, Gen.alphaNumChar).map("s" + _.mkString))
    }
    Gen.frequency(8 -> v.map(Some(_)), 1 -> Gen.const(None))
  }

  private case class Table(cols: Seq[(String, ColType)],
                           rows: Seq[Seq[Option[String]]])

  private val tableGen: Gen[Table] = for {
    k <- Gen.choose(1, 6)
    cols0 <- Gen.listOfN(k, colGen)
    // 'h' prefix: no data cell can ever equal a header cell, so the
    // header-drop-by-text rule can't eat a data row
    cols = cols0.zipWithIndex.map { case ((n, t), i) => (s"h$n$i", t) }
    n <- Gen.choose(2, 25)
    rows <- Gen.listOfN(n, Gen.sequence[Seq[Option[String]], Option[String]](
      cols.map(c => cellGen(c._2))))
  } yield Table(cols, rows)

  private def render(t: Table): Seq[String] = {
    val widths = t.cols.zipWithIndex.map { case ((name, _), i) =>
      math.max(name.length,
        t.rows.iterator.map(_(i).fold(0)(_.length)).foldLeft(0)(math.max))
    }
    def line(cells: Seq[String]): String =
      cells.zip(widths).map { case (c, w) => c + " " * (w - c.length) }
        .mkString("  ").replaceAll("\\s+$", "")
    line(t.cols.map(_._1)) +:
      t.rows.map(r => line(r.map(_.getOrElse(""))))
  }

  /** What the sampled inference should conclude for a column: the SAME
    * rule Fwf uses, applied to the intended values. */
  private def expectType(vals: Seq[Option[String]]): ColType = {
    val got = vals.flatten
    if (got.isEmpty) S
    else if (got.forall(_.toLongOption.isDefined)) L
    else if (got.forall(_.toDoubleOption.isDefined)) D
    else S
  }

  test("random fixed-width tables round-trip: layout, types, nulls") {
    forSamples(tableGen) { t =>
      val df = Fwf.fromLines(render(t).toDS(), sampleRows = 1000)
      assert(df.columns.toSeq === t.cols.map(_._1))
      val want = t.cols.zipWithIndex.map { case ((_, _), i) =>
        expectType(t.rows.map(_(i)))
      }
      df.schema.fields.zip(want).foreach { case (f, w) =>
        val simple = f.dataType.simpleString
        w match {
          case L => assert(simple === "bigint", f.name)
          case D => assert(simple === "double", f.name)
          case S => assert(simple === "string", f.name)
        }
      }
      val got = df.collect()
      // an all-None row renders as a blank line — not a record in any
      // fwf dialect; the reader skips it and so does the expectation
      val keptRows = t.rows.filter(_.exists(_.isDefined))
      assert(got.length === keptRows.length)
      // compare as strings: the parse is a cast of the exact cell text
      got.zip(keptRows).foreach { case (row, expected) =>
        expected.zipWithIndex.foreach { case (cell, i) =>
          val g = Option(row.get(i)).map(_.toString)
          (cell, want(i)) match {
            case (None, _) => assert(g === None, s"col $i")
            case (Some(v), L) => assert(g === Some(v.toLong.toString))
            case (Some(v), D) => assert(g === Some(v.toDouble.toString))
            case (Some(v), S) => assert(g === Some(v))
          }
        }
      }
    }
  }
}
