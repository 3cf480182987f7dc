package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared machinery for the range-parallel single-file scans
  * ([[Sas.readSasPaged]] pioneered the shape): a bounded, widening
  * driver read fits the file's own metadata, then each task preads
  * and decodes a contiguous fixed-stride row range. */
private[io] object PagedScan {

  /** Read a HEAD of the file, widening geometrically until `parse`
    * accepts it — metadata is front-loaded in every supported format,
    * so this stays a bounded driver read (loud past `limit`). `align`
    * rounds head sizes down (xpt parses whole 80-byte cards only). */
  def driverMeta[M](spark: SparkSession, path: String,
                    initial: Int = 1 << 16, limit: Int = 1 << 26,
                    align: Int = 1)(parse: Array[Byte] => M): M = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen
    val cap = math.min(limit.toLong, len)
    def aligned(s: Long): Int = {
      val a = math.min(s, cap)
      (a - a % align).toInt
    }
    val in = fs.open(p)
    try {
      var size = aligned(initial.toLong)
      var out: Option[M] = None
      while (out.isEmpty) {
        val buf = new Array[Byte](size)
        in.readFully(0, buf)
        try out = Some(parse(buf))
        catch {
          case e: Exception =>
            if (size >= cap) throw new IllegalArgumentException(
              s"metadata did not close within the first $cap bytes of " +
                s"$path — not a front-loaded file the paged scan " +
                s"supports (${e.getMessage})", e)
            size = aligned(size.toLong * 8)
        }
      }
      out.get
    } finally in.close()
  }

  /** Pread the tail of the file on the driver — xpt's blank-pad trim. */
  def readTail(spark: SparkSession, path: String, from: Long,
               n: Int): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](n)
      in.readFully(from, buf)
      buf
    } finally in.close()
  }

  def fileLength(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(p).getLen
  }

  /** Fan contiguous row ranges across tasks; each task preads its
    * bytes and hands them to `decode(buf, startRow, nRows)`. */
  def scan(spark: SparkSession, path: String, schema: StructType,
           totalRows: Long, dataAt: Long, rowLen: Long, partitions: Int)
          (decode: (Array[Byte], Long, Long) => Iterator[Row]): DataFrame = {
    require(rowLen > 0, "paged scan needs a positive row stride")
    val nParts = math.max(1, if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism)
    val perPart = math.max(1L, (totalRows + nParts - 1) / nParts)
    val ranges = (0L until totalRows by perPart)
      .map(s => (s, math.min(perPart, totalRows - s)))
    val rdd = spark.sparkContext
      .parallelize(ranges, math.max(1, ranges.size))
      .flatMap { case (start, n) =>
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val in = fs.open(p)
        try {
          val buf = new Array[Byte]((n * rowLen).toInt)
          in.readFully(dataAt + start * rowLen, buf)
          decode(buf, start, n)
        } finally in.close()
      }
    spark.createDataFrame(rdd, schema)
  }
}
