package graft

import graft.io.Fwf

/** Fixed-width ingest: pandas-style all-blank-column boundary
  * inference on a bounded sample, codegen substring slicing, sampled
  * type inference, header drop by exact text (multi-file headers
  * collapse with it). */
class FwfSpec extends SparkSpec {
  import spark.implicits._

  private val lines = Seq(
    "id   name      score",
    "1    alpha      12.5",
    "2    beta         -3",
    "10   gamma          ",
    "300  delta       0.25")

  test("colspec inference finds the three runs") {
    assert(Fwf.inferColspecs(lines) === Seq((0, 3), (5, 10), (15, 21)))
  }

  test("fromLines: header, types (long/string/double), null blanks") {
    val df = Fwf.fromLines(lines.toDS())
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) ===
      Seq(("id", "bigint"), ("name", "string"), ("score", "double")))
    val got = df.orderBy("id")
      .as[(Long, String, Option[Double])].collect()
    assert(got.toSeq === Seq(
      (1L, "alpha", Some(12.5)), (2L, "beta", Some(-3.0)),
      (10L, "gamma", None), (300L, "delta", Some(0.25))))
  }

  test("headerless mode names c0..cN and keeps every line") {
    val df = Fwf.fromLines(lines.tail.toDS(), header = false)
    assert(df.columns.toSeq === Seq("c0", "c1", "c2"))
    assert(df.count() === 4L)
  }

  test("file read via IO.readData; repeated per-file headers collapse") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fwf")
    // two files, SAME header line in each — the multi-file case
    java.nio.file.Files.write(tmp.resolve("a.fwf"),
      (lines.take(3)).mkString("\n").getBytes)
    java.nio.file.Files.write(tmp.resolve("b.fwf"),
      (lines.head +: lines.drop(3)).mkString("\n").getBytes)
    val df = graft.io.IO.readData(spark, tmp.toString + "/*.fwf")
    assert(df.count() === 4L)
    assert(df.columns.toSeq === Seq("id", "name", "score"))
    val ids = df.select($"id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 2L, 10L, 300L))
  }

  test("the scan stays splittable: slicing is substring, not a UDF") {
    val plan = Fwf.fromLines(lines.toDS()).queryExecution.executedPlan
    assert(!plan.toString.contains("BatchEvalPython"))
    assert(!plan.toString.toLowerCase.contains("scalaudf"))
  }

  test("a value outside the sampled type errors loudly, not nulls") {
    // sampleRows = 3 sees only integer ids; row 4 carries '9.5'
    val drifted = Seq(
      "id     v",
      "100    a",
      "200    b",
      "9.5    c",
      "400    d")
    val df = Fwf.fromLines(drifted.toDS(), sampleRows = 3)
    val e = intercept[Exception] { df.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("sampled as long") &&
      m.contains("9.5")))
  }

  test("empty sample and duplicate headers refuse loudly") {
    intercept[IllegalArgumentException] {
      Fwf.inferColspecs(Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Fwf.fromLines(Seq("a  a", "1  2").toDS())
    }
  }
}
