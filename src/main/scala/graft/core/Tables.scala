package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided TPC-H-ish testdata (TESTDATA.md).
  *
  * One parquet file per table under an sf directory. All engine queries
  * take the sf directory as a parameter so the same code runs at any
  * scale factor (and, on a real cluster, against a warehouse path).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** The events table's `ts` column has shipped in two parquet encodings
    * across driver testdata generations: TIMESTAMP(NANOS) (no native Spark
    * type — read nanos as long via the legacy conf, divide to micros) and
    * native timestamp[us] with isAdjustedToUTC=false (read as TIMESTAMP_NTZ).
    * Dispatch on the loaded dtype so either generation works; normalize to
    * TimestampType under the UTC session (wall-clock preserving, and exactly
    * what DuckDB renders) so downstream queries see one type.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts has unsupported dtype $other — expected long (nanos), timestamp_ntz, or timestamp")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")

  /** Embeddings with the element-nullability contract NARROWED at the
    * scan. Parquet list elements load as `containsNull = true`, which
    * forces the vector expressions' per-element `isNullAt` branch into
    * every cosine codegen loop (they propagate a null element to a
    * NULL result when the schema admits one) — measured 1.8× on the
    * embed_dedup n² scan. A null element is INVALID in this table, so
    * fail fast instead: `transform(_, assert_not_null)` throws on bad
    * data and its output type is `containsNull = false`, restoring the
    * branch-free loops. One linear array copy per row at the scan —
    * negligible against any pairwise/ANN consumer. */
  def embeddings(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, transform}
    import org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull
    import org.apache.spark.sql.GraftColumnBridge
    table(s, d, "embeddings").withColumn("embedding",
      transform(col("embedding"), x =>
        GraftColumnBridge.toColumn(
          AssertNotNull(GraftColumnBridge.toExpr(s, x)))))
  }
}
