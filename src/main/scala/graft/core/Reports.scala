package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured report objects (SURVEY §1.2 container/result types:
  * `ResultSummary`/`Summary`/`ReportFactory`, gofast/api/summary.py).
  * Pure case classes computed from ONE cached aggregate pass — the
  * pretty-printer never forces extra collects (SURVEY §7.4 note).
  */
object Reports {

  case class ColumnAudit(name: String, dtype: String, nNull: Long,
                         nullRatio: Double, approxDistinct: Long)

  case class AuditReport(nRows: Long, columns: Seq[ColumnAudit]) {
    def render: String = {
      val header = f"AuditReport: $nRows%d rows, ${columns.size}%d columns"
      val lines = columns.map { c =>
        f"  ${c.name}%-24s ${c.dtype}%-10s nulls=${c.nNull}%-8d (${c.nullRatio * 100}%5.2f%%)  ~distinct=${c.approxDistinct}%d"
      }
      (header +: lines).mkString("\n")
    }
  }

  /** One-pass audit of every column: null counts + HLL distincts.
    * Reference: `audit_data(return_report=True)`
    * (gofast/dataops/quality.py:118). */
  def audit(df: DataFrame): AuditReport = {
    val cols = df.schema.fields
    val aggs = cols.flatMap { f =>
      Seq(sum(when(col(f.name).isNull, 1L).otherwise(0L)).as(s"${f.name}__n"),
          approx_count_distinct(col(f.name)).as(s"${f.name}__d"))
    } :+ count(lit(1)).as("__rows")
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val nRows = r.getLong(2 * cols.length)
    AuditReport(nRows, cols.zipWithIndex.map { case (f, i) =>
      val nulls = r.getLong(2 * i)
      ColumnAudit(f.name, f.dataType.typeName, nulls,
        if (nRows == 0) 0.0 else nulls.toDouble / nRows, r.getLong(2 * i + 1))
    }.toSeq)
  }
}
