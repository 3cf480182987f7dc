package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** String-cell rows → DataFrame with narrowest-type inference
  * (long → double → boolean → string), shared by the driver-side
  * ingest codecs ([[Excel]], [[Scrape]]) whose sources carry no
  * schema. Inference runs on the driver over the already-collected
  * cells — these formats are small by construction. */
private[graft] object TypedRows {

  /** Numeric-suffix dedup for repeated header labels — exposed so the
    * tall-cell path (Excel.readXlsxDir) keys cells under EXACTLY the
    * names the fitted schema will carry. */
  def dedupeNames(rawNames: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.Map.empty[String, Int]
    rawNames.map { n =>
      val k = seen.getOrElse(n, 0); seen(n) = k + 1
      if (k == 0) n else s"${n}_$k"
    }
  }

  def toDf(spark: SparkSession, rawNames: Seq[String],
           data: Seq[Seq[String]]): DataFrame = {
    // real spreadsheets repeat header labels; dedupe with numeric
    // suffixes or the per-column cast below hits AMBIGUOUS_REFERENCE
    val names = dedupeNames(rawNames)
    val schema = StructType(names.map(StructField(_, StringType, true)))
    val raw = spark.createDataFrame(
      spark.sparkContext.parallelize(
        data.map(Row.fromSeq), math.max(1, data.size / 10000)),
      schema)
    names.zipWithIndex.foldLeft(raw) { case (df, (name, i)) =>
      val cells = data.iterator.map(_(i)).filter(_ != null).toSeq
      val target =
        if (cells.isEmpty) StringType
        else if (cells.forall(s => scala.util.Try(s.trim.toLong).isSuccess))
          LongType
        else if (cells.forall(s => scala.util.Try(s.trim.toDouble).isSuccess))
          DoubleType
        else if (cells.forall(s =>
            s.trim.equalsIgnoreCase("true") ||
              s.trim.equalsIgnoreCase("false")))
          BooleanType
        else if (cells.forall(_.trim.matches("\\d{4}-\\d{2}-\\d{2}")))
          DateType
        else if (cells.forall(_.trim.matches(
            "\\d{4}-\\d{2}-\\d{2}[ T]\\d{2}:\\d{2}(:\\d{2})?(\\.\\d+)?")))
          TimestampType
        else StringType
      if (target == StringType) df
      else df.withColumn(name, col(s"`$name`").cast(target))
    }
  }
}
