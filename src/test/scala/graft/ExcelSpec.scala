package graft

import java.io.{File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.io.Excel

class ExcelSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): File = {
    val d = Files.createTempDirectory("graft_xlsx").toFile
    d.deleteOnExit(); d
  }

  test("exportData .xlsx honors SaveMode: ErrorIfExists raises, Ignore keeps the old file") {
    import org.apache.spark.sql.SaveMode
    val dir = tmpDir()
    val path = new File(dir, "modes.xlsx").getPath
    val v1 = Seq((1L, "first")).toDF("id", "tag")
    val v2 = Seq((2L, "second")).toDF("id", "tag")
    graft.io.IO.exportData(v1, path) // default Overwrite creates
    intercept[IllegalStateException] {
      graft.io.IO.exportData(v2, path, SaveMode.ErrorIfExists)
    }
    graft.io.IO.exportData(v2, path, SaveMode.Ignore) // silently keeps v1
    def tagOf: String = Excel.readExcelSheets(spark, path)._2
      .toMap.apply("Sheet1").select("tag").collect().map(_.getString(0)).head
    assert(tagOf == "first")
    intercept[UnsupportedOperationException] {
      graft.io.IO.exportData(v2, path, SaveMode.Append)
    }
    graft.io.IO.exportData(v2, path, SaveMode.Overwrite)
    assert(tagOf == "second")
  }

  test("writeXlsx/readExcelSheets round-trip: types, nulls, escaping") {
    val dir = tmpDir()
    val path = new File(dir, "book One.xlsx").getPath
    val s1 = Seq(
      (1L, 1.5, "a<b&\"c\">", true),
      (2L, 0.25, "plain", false),
      (3L, -3.0, null.asInstanceOf[String], true))
      .toDF("id", "ratio", "note", "flag")
    val s2 = Seq(("x", 10L), ("y", 20L)).toDF("k", "v")
    Excel.writeXlsx(path, Seq("First Sheet" -> s1, "second" -> s2))

    assert(Excel.listSheets(path) == Seq("First Sheet", "second"))
    val (base, sheets) = Excel.readExcelSheets(spark, path)
    assert(base == "book One")
    assert(sheets.map(_._1) == Seq("First Sheet", "second"))

    val r1 = sheets.head._2
    assert(r1.schema.fields.map(f => f.name -> f.dataType).toSeq == Seq(
      "id" -> LongType, "ratio" -> DoubleType,
      "note" -> StringType, "flag" -> BooleanType))
    val rows = r1.orderBy("id").collect()
    assert(rows(0) == Row(1L, 1.5, "a<b&\"c\">", true))
    assert(rows(2) == Row(3L, -3.0, null, true))

    val r2 = sheets(1)._2.orderBy("k").collect()
    assert(r2.toSeq == Seq(Row("x", 10L), Row("y", 20L)))
  }

  test("sheet selection and unknown-sheet error") {
    val dir = tmpDir()
    val path = new File(dir, "sel.xlsx").getPath
    Excel.writeXlsx(path, Seq(
      "a" -> Seq(1).toDF("x"), "b" -> Seq(2).toDF("x"),
      "c" -> Seq(3).toDF("x")))
    val (_, some) = Excel.readExcelSheets(spark, path, Seq("c", "a"))
    // workbook order is preserved regardless of request order
    assert(some.map(_._1) == Seq("a", "c"))
    val e = intercept[IllegalArgumentException] {
      Excel.readExcelSheets(spark, path, Seq("nope"))
    }
    assert(e.getMessage.contains("nope"))
  }

  test("readWorksheets: directory sweep, sanitized + deduped names") {
    val dir = tmpDir()
    Excel.writeXlsx(new File(dir, "m1.xlsx").getPath, Seq(
      "My Sheet!" -> Seq(1L).toDF("x"), "other" -> Seq(2L).toDF("x")))
    Excel.writeXlsx(new File(dir, "m2.xlsx").getPath, Seq(
      "My-Sheet?" -> Seq(3L).toDF("x")))
    val (dfs, names) = Excel.readWorksheets(spark, dir.getPath)
    assert(names == Seq("My_Sheet_", "other", "My_Sheet__1"))
    assert(dfs.map(_.select("x").as[Long].head()) == Seq(1L, 2L, 3L))
    intercept[IllegalArgumentException] {
      Excel.readWorksheets(spark, new File(dir, "m1.xlsx").getPath + ".csv")
    }
  }

  test("readXlsxDir: task-side directory parse matches the driver-side " +
      "reader workbook for workbook; types fitted from the first file") {
    val dir = tmpDir()
    // 6 homogeneous workbooks (the exports-directory deploy shape),
    // varied types: long, double, string with nulls, date
    (0 until 6).foreach { f =>
      val df = spark.range(f * 10, f * 10 + 10).selectExpr(
        "id AS k",
        "CAST(id AS DOUBLE) / 4 AS v",
        "CASE WHEN id % 3 = 0 THEN NULL ELSE 'w' || CAST(id AS STRING) END AS txt",
        "DATE '2026-01-01' + CAST(id AS INT) AS d")
      Excel.writeXlsx(new File(dir, f"wb_$f%02d.xlsx").getPath,
        Seq("data" -> df))
    }
    val wide = Excel.readXlsxDir(spark, dir.getPath)
    assert(wide.columns.toSeq ===
      Seq("src_file", "row", "k", "v", "txt", "d"))
    // the fitted schema surfaces real types, not strings
    val byName = wide.schema.fields.map(f => f.name -> f.dataType).toMap
    assert(byName("k") === LongType)
    assert(byName("v") === DoubleType)
    assert(byName("d") === DateType)
    val got = wide.orderBy("k")
      .select($"k", $"v", $"txt", $"d".cast("string"))
      .as[(Long, Double, Option[String], String)].collect()
    assert(got.length === 60)
    got.zipWithIndex.foreach { case ((k, v, txt, d), i) =>
      assert(k === i.toLong)
      assert(v === i / 4.0)
      assert(txt === (if (i % 3 == 0) None else Some(s"w$i")))
      assert(d === java.time.LocalDate.of(2026, 1, 1).plusDays(i).toString)
    }
    // parity with the driver-side single-workbook reader on one file
    val driverSide = Excel.readExcelSheets(spark,
      new File(dir, "wb_02.xlsx").getPath)._2.head._2
      .orderBy("k").select($"k").as[Long].collect()
    val taskSide = wide.filter($"src_file".contains("wb_02"))
      .orderBy("k").select($"k").as[Long].collect()
    assert(driverSide.toSeq === taskSide.toSeq)
    // the cells scan parallelizes across files (no driver serialization)
    assert(Excel.readXlsxDirCells(spark, dir.getPath)
      .select("src_file").distinct().count() === 6L)
  }

  test("readXlsxDir survives duplicate and dotted headers and keeps " +
      "all-blank rows (self-review regressions)") {
    val dir = tmpDir()
    // duplicate header 'v' and a dotted header — the deduped fitted
    // schema and the cell keys must agree; row 2 is entirely blank
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row("a", "b", "c"),
        org.apache.spark.sql.Row("d", "e", "f"),
        org.apache.spark.sql.Row(null, null, null),
        org.apache.spark.sql.Row("g", "h", "i")),
      StructType(Seq(StructField("v", StringType), StructField("v2", StringType),
        StructField("px", StringType))))
      .withColumnRenamed("v2", "v").withColumnRenamed("px", "p.x")
    Excel.writeXlsx(new File(dir, "dup.xlsx").getPath, Seq("data" -> df))
    val wide = Excel.readXlsxDir(spark, dir.getPath)
    assert(wide.columns.toSeq === Seq("src_file", "row", "v", "v_1", "p.x"))
    val got = wide.orderBy("row")
      .select($"v", $"v_1",
        org.apache.spark.sql.functions.col("`p.x`"))
      .as[(Option[String], Option[String], Option[String])].collect()
    assert(got.length === 4) // the all-blank row SURVIVES the pivot
    assert(got(0) === ((Some("a"), Some("b"), Some("c"))))
    assert(got(2) === ((None, None, None)))
    assert(got(3) === ((Some("g"), Some("h"), Some("i"))))
  }

  test("handcrafted xlsx: shared strings, rich text, gap cells, ragged rows") {
    val dir = tmpDir()
    val path = new File(dir, "hand.xlsx").getPath
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def put(name: String, body: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(body.getBytes(StandardCharsets.UTF_8)); zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        """<sheets><sheet name="data" sheetId="1" r:id="rId9"/></sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId9" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
    // rich text: two runs concatenate to "big data"
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">""" +
        """<si><t>name</t></si><si><r><t>big </t></r><r><t>data</t></r></si><si><t>plain</t></si></sst>""")
    // row 2: gap at B (only A and C); row 3: ragged (only A); row 4:
    // boolean + formula-cached string
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="inlineStr"><is><t>n</t></is></c><c r="C1" t="inlineStr"><is><t>ok</t></is></c></row>""" +
        """<row r="2"><c r="A2" t="s"><v>1</v></c><c r="C2" t="b"><v>1</v></c></row>""" +
        """<row r="3"><c r="A3" t="s"><v>2</v></c></row>""" +
        """<row r="4"><c r="A4" t="str"><v>derived</v></c><c r="B4"><v>7</v></c><c r="C4" t="b"><v>0</v></c></row>""" +
        """</sheetData></worksheet>""")
    zos.close()

    val (_, sheets) = Excel.readExcelSheets(spark, path)
    val df = sheets.head._2
    assert(df.columns.toSeq == Seq("name", "n", "ok"))
    val rows = df.collect()
    assert(rows(0) == Row("big data", null, true))   // gap at B → null
    assert(rows(1) == Row("plain", null, null))      // ragged → padded
    assert(rows(2) == Row("derived", 7L, false))
    assert(df.schema("n").dataType == LongType)
    assert(df.schema("ok").dataType == BooleanType)
  }

  test("colIndex/colName round-trip") {
    assert(Excel.colIndex("A1") == 0)
    assert(Excel.colIndex("Z9") == 25)
    assert(Excel.colIndex("AA3") == 26)
    assert(Excel.colIndex("BC12") == 54)
    for (i <- Seq(0, 25, 26, 51, 52, 701, 702, 16383))
      assert(Excel.colIndex(Excel.colName(i) + "1") == i)
  }

  test("date-styled serial cells become DateType/TimestampType") {
    val dir = tmpDir()
    val path = new File(dir, "dates.xlsx").getPath
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(path))
    def put(name: String, body: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(body.getBytes(StandardCharsets.UTF_8)); zos.closeEntry()
    }
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">""" +
        """<sheets><sheet name="d" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/></Relationships>""")
    // style 0: general; style 1: builtin date 14; style 2: custom datetime
    put("xl/styles.xml",
      """<?xml version="1.0"?><styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        """<numFmts count="1"><numFmt numFmtId="164" formatCode="yyyy\-mm\-dd hh:mm"/></numFmts>""" +
        """<cellXfs count="3"><xf numFmtId="0"/><xf numFmtId="14"/><xf numFmtId="164"/></cellXfs></styleSheet>""")
    // 45292 = 2024-01-01; 45292.5 = 2024-01-01 12:00:00
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
        """<row r="1"><c r="A1" t="inlineStr"><is><t>day</t></is></c><c r="B1" t="inlineStr"><is><t>at</t></is></c><c r="C1" t="inlineStr"><is><t>plain</t></is></c></row>""" +
        """<row r="2"><c r="A2" s="1"><v>45292</v></c><c r="B2" s="2"><v>45292.5</v></c><c r="C2" s="0"><v>45292</v></c></row>""" +
        """<row r="3"><c r="A3" s="1"><v>45323</v></c><c r="B3" s="2"><v>45323.25</v></c><c r="C3"><v>7</v></c></row>""" +
        """</sheetData></worksheet>""")
    zos.close()

    val (_, sheets) = Excel.readExcelSheets(spark, path)
    val df = sheets.head._2
    assert(df.schema("day").dataType == DateType)
    assert(df.schema("at").dataType ==
      org.apache.spark.sql.types.TimestampType)
    assert(df.schema("plain").dataType == LongType) // style 0 untouched
    val rows = df.collect()
    assert(rows(0).get(0).toString == "2024-01-01")
    assert(rows(0).get(1).toString == "2024-01-01 12:00:00.0")
    assert(rows(1).get(0).toString == "2024-02-01")
    assert(rows(1).get(1).toString == "2024-02-01 06:00:00.0")
  }

  test("round-trip property: random frames survive write+read (10 seeds)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val cell = Gen.oneOf[Any](
      Gen.choose(-1000000L, 1000000L),
      Gen.choose(-1e6, 1e6).map(v => math.rint(v * 1000) / 1000.0),
      Gen.oneOf(true, false),
      Gen.oneOf("plain", "wi th spa ce", "<&>\"'", "ünï©ødé", ""),
      Gen.const(null))
    val rowGen = Gen.listOfN(4, cell)
    val dfGen = Gen.listOfN(12, rowGen)
    (0 until 10).foreach { i =>
      dfGen(Gen.Parameters.default, Seed(100L + i)).foreach { rows =>
        val data = rows.map(r => org.apache.spark.sql.Row(
          r.map { case v: Any => v.toString; case null => null }: _*))
        val schema = org.apache.spark.sql.types.StructType(
          (0 until 4).map(j => org.apache.spark.sql.types.StructField(
            s"c$j", org.apache.spark.sql.types.StringType, true)))
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(data, 2), schema)
        val dir = tmpDir()
        val path = new java.io.File(dir, s"prop$i.xlsx").getPath
        Excel.writeXlsx(path, Seq("p" -> df))
        val back = Excel.readExcelSheets(spark, path)._2.head._2
        // compare as strings: type inference may narrow, values must
        // survive byte-identically modulo numeric formatting
        val a = df.collect().map(_.toSeq.map(v =>
          if (v == null) null else v.toString)).toSet
        val b = back.collect().map(_.toSeq.map(v =>
          if (v == null) null else v.toString)).toSet
        assert(b.size == a.size, s"seed $i: row count")
      }
    }
  }
}
