package graft.io

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-width-format ingest — `read_data(.fwf)` dispatches to pandas
  * `read_fwf` in the reference (gofast/api/property.py:2788); here the
  * column boundaries are inferred once from a bounded sample (the
  * fitted-scalar pattern, pandas' infer_nrows=100 convention: a
  * boundary is a character column that is blank in EVERY sampled
  * line), and the per-row slicing is pure codegen `substring` — the
  * scan stays splittable and distributed, unlike the per-file parsers.
  *
  * Header handling: the first line names the columns and is dropped by
  * its exact text (fwf headers are unique in practice: they name the
  * columns); `header = false` yields c0..cN. Column types are inferred
  * from the sample (long → double → string); empty cells → null.
  */
object Fwf {

  /** Maximal runs of positions that are non-blank in at least one
    * sampled line — pandas' all-blank-column boundary rule. */
  def inferColspecs(sample: Seq[String]): Seq[(Int, Int)] = {
    require(sample.nonEmpty, "fwf: empty sample — nothing to infer from")
    val width = sample.iterator.map(_.length).max
    require(width > 0, "fwf: sampled lines are all empty")
    val blank = Array.fill(width)(true)
    sample.foreach { line =>
      var i = 0
      while (i < line.length) {
        if (!line.charAt(i).isWhitespace) blank(i) = false
        i += 1
      }
    }
    val specs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0
    while (i < width) {
      if (!blank(i)) {
        var j = i
        while (j < width && !blank(j)) j += 1
        specs += ((i, j))
        i = j
      } else i += 1
    }
    require(specs.nonEmpty, "fwf: no data columns found in the sample")
    specs.toSeq
  }

  private def slice(c: Column, from: Int, until: Int): Column =
    trim(substring(c, from + 1, until - from))

  /** Infer a column's type from its sampled trimmed values. */
  private def inferType(vals: Seq[String]): String = {
    val nonEmpty = vals.filter(_.nonEmpty)
    if (nonEmpty.isEmpty) "string"
    else if (nonEmpty.forall(v => v.toLongOption.isDefined)) "long"
    else if (nonEmpty.forall(v => v.toDoubleOption.isDefined)) "double"
    else "string"
  }

  /** Parse fixed-width lines: boundaries + names + types fitted from
    * the first `sampleRows` lines, slicing by codegen substring. */
  def fromLines(lines: Dataset[String], header: Boolean = true,
                sampleRows: Int = 100): DataFrame = {
    val sample = lines.filter(length(trim(col("value"))) > 0)
      .take(sampleRows).toSeq
    val specs = inferColspecs(sample)
    def cells(s: String): Seq[String] = specs.map { case (a, b) =>
      s.slice(math.min(a, s.length), math.min(b, s.length)).trim
    }
    val names =
      if (header) {
        val h = cells(sample.head)
        require(h.forall(_.nonEmpty), "fwf: blank header cell — pass " +
          "header = false for headerless files")
        h
      } else specs.indices.map(i => s"c$i")
    require(names.distinct.length == names.length,
      s"fwf: duplicate header names ${names.mkString(",")}")
    // drop EVERY header-equal line from the inference body, not just
    // the first: in a multi-file read each file repeats the header and
    // a stray "id"/"name" cell would poison the numeric inference
    val body = if (header) sample.filter(_ != sample.head) else sample
    val types = specs.indices.map(i => inferType(body.map(cells(_)(i))))

    val raw = col("value")
    val out = specs.zip(names).zip(types).map { case (((a, b), n), t) =>
      val cell = slice(raw, a, b)
      val nulled = when(cell === lit(""), lit(null)).otherwise(cell)
      (t match {
        case "long" | "double" =>
          // the type was fitted on a SAMPLE: a later row outside it
          // must fail LOUDLY with a message that names the fix —
          // validity is checked BEFORE the cast (ANSI mode would throw
          // its own opaque error; non-ANSI would silently null)
          val valid =
            if (t == "long") nulled.rlike("^[+-]?[0-9]+$")
            else nulled.rlike(
              "^[+-]?(([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?" +
                "|NaN|Infinity)$")
          when(nulled.isNotNull && !valid,
            raise_error(concat(
              lit(s"fwf: column '$n' sampled as $t but value '"), nulled,
              lit("' does not parse — raise sampleRows past the first " +
                "divergent row"))).cast(t))
            .otherwise(nulled.cast(t))
        case _ => nulled
      }).as(n)
    }
    val data = lines.filter(length(trim(col("value"))) > 0)
    val noHeader =
      if (header) data.filter(col("value") =!= lit(sample.head))
      else data
    noHeader.select(out: _*)
  }

  /** File read: `spark.read.text` keeps the scan splittable; the
    * sample that fits boundaries/types is one bounded driver read. */
  def readFwf(spark: SparkSession, path: String,
              header: Boolean = true): DataFrame = {
    import spark.implicits._
    fromLines(spark.read.textFile(path).as[String], header)
  }
}
