package graft

import graft.io.Sav

/** SPSS .sav ingest against fixtures assembled field-by-field from the
  * PSPP "System File Format" spec by tools/make_sav_fixture.py — a
  * second implementation kept deliberately separate from the Scala
  * reader/writer (no independent .sav library exists in this sandbox,
  * unlike sas7bdat's pandas anchor; that honesty note lives in the
  * [[graft.io.Sav]] scaladoc). Both the uncompressed and the
  * bytecode-compressed layouts decode to the same golden frame, and
  * the refusal cases pin the documented subset. */
class SavSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "src/test/resources/sav"

  private def bytes(f: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, f))

  /** tools/make_sav_fixture.py ROWS: id numeric, name string(10) with
    * row 12 blank (null), score numeric with row 5 sysmis. */
  private def expected: Seq[(Double, Option[String], Option[Double])] =
    (0 until 20).map { i =>
      (i.toDouble,
        if (i == 12) None else Some(s"w${i % 4}_$i"),
        if (i == 5) None else Some(i * 0.75 - 2.0))
    }

  private def check(file: String): Unit = {
    val wide = Sav.readSavRecords(spark, s"$dir/$file")
      .orderBy("row").select($"id", $"name", $"score")
      .as[(Double, Option[String], Option[Double])].collect()
    assert(wide.toSeq === expected)
  }

  test("uncompressed fixture decodes: continuations, sysmis, labels, docs") {
    check("fixture_plain.sav")
  }

  test("bytecode fixture decodes identically (all five command classes)") {
    check("fixture_bytecode.sav")
  }

  test("long names from info-13 win; tall cells carry types") {
    val tall = Sav.readSav(spark, s"$dir/fixture_plain.sav")
    assert(tall.count() === 60L)
    val types = tall.select("key", "vtype").distinct()
      .as[(String, String)].collect().toMap
    assert(types === Map("id" -> "num", "name" -> "str", "score" -> "num"))
    val missing = tall
      .filter($"key" === "score" && $"value_double".isNull)
      .select($"row").as[Long].collect()
    assert(missing.toSeq === Seq(5L))
  }

  test("writer round-trips, uncompressed and bytecode, multi-element strings") {
    val cols = Seq(("k", true), ("txt", false), ("v", true))
    val data = (0 until 300).map { i =>
      Seq(i.toDouble,
        if (i % 5 == 0) null else s"some_longer_string_$i", // > 8 bytes
        if (i % 7 == 0) null else (i * 1.25 - 10.0)): Seq[Any]
    }
    Seq(false, true).foreach { bc =>
      val blob = Sav.dumps(cols, data, bytecode = bc)
      val wide = Sav.records(
          Sav.readSavBlobs(spark, Seq(("t.sav", blob))), cols)
        .orderBy("row")
        .select($"k", $"txt", $"v")
        .as[(Double, Option[String], Option[Double])].collect()
      assert(wide.length === 300, s"bytecode=$bc")
      wide.zipWithIndex.foreach { case ((k, txt, v), i) =>
        assert(k === i.toDouble)
        assert(txt === (if (i % 5 == 0) None
          else Some(s"some_longer_string_$i")))
        assert(v === (if (i % 7 == 0) None else Some(i * 1.25 - 10.0)))
      }
    }
  }

  test("bytecode biased integers actually compress (fewer raw bytes)") {
    val cols = Seq(("n", true))
    val data = (0 until 100).map(i => Seq[Any]((i % 50).toDouble))
    val plain = Sav.dumps(cols, data, bytecode = false)
    val packed = Sav.dumps(cols, data, bytecode = true)
    // 100 biased one-byte commands vs 100 8-byte elements
    assert(packed.length < plain.length - 500)
  }

  test("zsav, zlib code, big-endian and junk refuse loudly") {
    val zsav = bytes("fixture_plain.sav").clone()
    "$FL3".getBytes.copyToArray(zsav, 0)
    val e1 = intercept[IllegalArgumentException] { Sav.parseMeta(zsav) }
    assert(e1.getMessage.contains("zlib") || e1.getMessage.contains("FL3"))

    val z2 = bytes("fixture_plain.sav").clone()
    z2(72) = 2 // compression code field
    val e2 = intercept[IllegalArgumentException] { Sav.parseMeta(z2) }
    assert(e2.getMessage.contains("zlib"))

    val be = bytes("fixture_plain.sav").clone()
    // byte-swap the layout code: 02 00 00 00 -> 00 00 00 02
    be(64) = 0; be(67) = 2
    val e3 = intercept[IllegalArgumentException] { Sav.parseMeta(be) }
    assert(e3.getMessage.contains("big-endian"))

    intercept[IllegalArgumentException] {
      Sav.parseMeta(Array.fill[Byte](300)(0x41))
    }
  }

  test("IO.readData dispatches .sav") {
    val df = graft.io.IO.readData(spark, s"$dir/fixture_plain.sav")
    assert(df.count() === 20L)
    assert(df.columns.sorted.toSeq === Seq("id", "name", "row",
      "score", "src_file"))
  }

  test("paged reader matches whole-file; bytecode refuses the split") {
    val paged = Sav.records(
        Sav.readSavPaged(spark, s"$dir/fixture_plain.sav", partitions = 4),
        Seq(("id", true), ("name", false), ("score", true)))
      .orderBy("row").select($"id", $"name", $"score")
      .as[(Double, Option[String], Option[Double])].collect()
    assert(paged.toSeq === expected)
    val e = intercept[IllegalArgumentException] {
      Sav.readSavPaged(spark, s"$dir/fixture_bytecode.sav")
    }
    assert(e.getMessage.contains("paged scan needs uncompressed"))
  }

  test("IO.exportData round-trips .sav (bytecode) incl. nulls") {
    val tmp = java.nio.file.Files.createTempFile("graft_sav_export_", ".sav")
    val src = spark.range(40).selectExpr(
      "CAST(id AS DOUBLE) AS k",
      "CASE WHEN id % 3 = 0 THEN NULL ELSE CAST(id AS DOUBLE) / 4 END AS v",
      "CASE WHEN id % 5 = 0 THEN NULL ELSE 'v' || CAST(id AS STRING) END AS txt")
    graft.io.IO.exportData(src, tmp.toString)
    val back = graft.io.IO.readData(spark, tmp.toString)
      .orderBy("row").select($"k", $"v", $"txt")
      .as[(Double, Option[Double], Option[String])].collect()
    assert(back.length === 40)
    back.zipWithIndex.foreach { case ((k, v, txt), i) =>
      assert(k === i.toDouble)
      assert(v === (if (i % 3 == 0) None else Some(i / 4.0)))
      assert(txt === (if (i % 5 == 0) None else Some(s"v$i")))
    }
    java.nio.file.Files.delete(tmp)
  }
}
