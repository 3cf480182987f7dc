package graft.mm

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling — north-star
  * training-data-pipeline operators.
  *
  * Media is an opaque `binary` column plus a typed metadata struct; all
  * Spark-side plumbing (schema, partitioning, batch iteration, output
  * shape) is real. The codec step itself is a clearly marked STUB —
  * this container has no image/audio libraries — producing a
  * deterministic hash-derived feature vector with the exact signature a
  * real decoder would have (Iterator[Row] → Iterator[Row] per
  * partition, the Scala analog of `mapInPandas` batches).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Build a media frame from (id, bytes, format, w, h, duration). */
  def toMediaFrame(spark: SparkSession,
                   rows: Seq[(Long, Array[Byte], String, Int, Int, Long)]): DataFrame = {
    val rdd = spark.sparkContext.parallelize(rows.map { case (id, b, f, w, h, d) =>
      Row(id, b, Row(f, w, h, d))
    })
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** STUB decoder ??? — stands in for an image/audio decode + feature
    * extraction kernel (e.g. pillow/torchvision inside mapInPandas).
    * Deterministic: features are derived from a 64-bit FNV-1a of the
    * bytes, so tests and re-runs are stable. The real implementation
    * replaces ONLY the body of `fakeFeature`; the partition-iterator
    * plumbing, schema, and batching stay. */
  private def fakeFeature(bytes: Array[Byte], dim: Int): Array[Float] = {
    var h = 0xcbf29ce484222325L
    if (bytes != null) bytes.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
    val out = new Array[Float](dim)
    var x = h
    var i = 0
    while (i < dim) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17 // xorshift64
      out(i) = (x.toDouble / Long.MaxValue.toDouble).toFloat
      i += 1
    }
    out
  }

  /** Decode + featurize each media row per partition (mapPartitions —
    * one decoder init per partition, the batch shape a GPU/codec kernel
    * needs). Output: (media_id, feature array<float>, n_bytes). */
  def decodeFeatures(df: DataFrame, dim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("feature", ArrayType(FloatType), nullable = false),
      StructField("n_bytes", IntegerType, nullable = false)))
    val rdd = df.select("media_id", "content").rdd.mapPartitions { it =>
      // real impl: init decoder ONCE here, stream batches through it
      it.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        Row(id, fakeFeature(bytes, dim).toSeq,
          if (bytes == null) 0 else bytes.length)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling for video-ish media: one row per sampled frame
    * offset, `explode(sequence(...))` — a Generator, no shuffle.
    * Frame step is in ms over meta.duration_ms. */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.withColumn("frame_ms",
        explode(sequence(lit(0L),
          coalesce(col("meta.duration_ms"), lit(0L)),
          lit(everyMs))))
      .select(col("media_id"), col("frame_ms"), col("meta.format").as("format"))

  /** Size-balanced repartition for decode batches: media blobs vary
    * wildly; partition by id hash so decoder tasks get even counts. */
  def repartitionForDecode(df: DataFrame, partitions: Int): DataFrame =
    df.repartition(partitions, col("media_id"))
}
