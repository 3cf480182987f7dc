package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Shared machinery for the statistical-format readers: the tall-cell
  * schema they all emit, the bounded first-file bootstrap, and the
  * range-parallel single-file scan ([[Sas.readSasPaged]] pioneered the
  * shape: a widening driver read fits the file's own metadata, then
  * each task preads and decodes a contiguous fixed-stride row range).
  */
private[io] object PagedScan {

  /** The (src_file, row, key, vtype, value_str, value_double) cell
    * layout every statistical reader emits — declared once. */
  val cellSchema: StructType = StructType(Seq(
    StructField("src_file", StringType, nullable = false),
    StructField("row", LongType, nullable = false),
    StructField("key", StringType, nullable = false),
    StructField("vtype", StringType, nullable = false),
    StructField("value_str", StringType, nullable = true),
    StructField("value_double", DoubleType, nullable = true)))

  /** The TYPED surfaces prepend (src_file, row) to the file's own
    * variables — a user variable with either name would collide
    * silently (duplicate columns, or an ambiguous-column error three
    * operators later). Refuse loudly at the read, the family's
    * convention. */
  def requireNoReservedNames(names: Seq[String], reader: String): Unit = {
    val hit = names.filter(n => n == "src_file" || n == "row")
    require(hit.isEmpty,
      s"$reader: column name(s) ${hit.mkString(", ")} collide with the " +
        "typed surface's reserved (src_file, row) columns — rename them " +
        "at the producer")
  }

  /** First file of a path/glob by NAME, its bytes read once — the
    * records() schema bootstrap (binaryFile prunes `content` when
    * unselected, so choosing by path costs no data reads). */
  def firstFileBytes(spark: SparkSession, path: String): Array[Byte] = {
    val firstPath = spark.read.format("binaryFile").load(path)
      .select("path").orderBy("path").limit(1).head().getString(0)
    spark.read.format("binaryFile").load(firstPath)
      .select("content").head().getAs[Array[Byte]](0)
  }

  /** The session Hadoop conf flattened for task-side rebuild — a bare
    * `new Configuration()` on an executor would lose every non-default
    * filesystem property (s3a credentials, endpoints, timeouts). */
  private[io] def confMap(spark: SparkSession): Map[String, String] = {
    val it = spark.sparkContext.hadoopConfiguration.iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    b.result()
  }

  private[io] def rebuild(m: Map[String, String]): org.apache.hadoop.conf.Configuration = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    m.foreach { case (k, v) => c.set(k, v) }
    c
  }

  /** Read a HEAD of the file, widening geometrically until `parse`
    * accepts it — metadata is front-loaded in every supported format,
    * so this stays a bounded driver read (loud past `limit`). `align`
    * rounds head sizes down (xpt parses whole 80-byte cards only).
    * `retryable` decides whether a parse failure means "head too
    * short" (widen) or "broken file" (rethrow). */
  def driverMeta[M](spark: SparkSession, path: String,
                    initial: Int = 1 << 16, limit: Int = 1 << 26,
                    align: Int = 1,
                    retryable: Exception => Boolean = _ => true)
                   (parse: Array[Byte] => M): M = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen
    def aligned(s: Long): Int = {
      val a = math.min(math.min(s, limit.toLong), len)
      (a - a % align).toInt
    }
    val cap = aligned(Long.MaxValue) // largest head we will ever read
    require(cap > 0,
      s"$path is shorter than one $align-byte unit — not a data file")
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
            if (size >= cap || !retryable(e))
              throw new IllegalArgumentException(
                s"metadata did not close within the first $size bytes " +
                  s"of $path (head limit $cap) — ${e.getMessage}", e)
            size = aligned(size.toLong * 8)
        }
      }
      out.get
    } finally in.close()
  }

  /** Pread a byte range on the driver — xpt's blank-pad trim. */
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

  /** Expand a path/glob/directory into its data files — the
    * multi-file paged readers union one scan per file. */
  def listFiles(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    val files = matched.flatMap { st =>
      if (st.isDirectory)
        fs.listStatus(st.getPath).toSeq.filter(_.isFile).map(_.getPath)
      else Seq(st.getPath)
    }
    files.map(_.toString).sorted
  }

  /** Union one WITHIN-file-parallel scan per matched file — both axes
    * of parallelism at once (across files AND across each file's
    * pages/rows/batches). Backs every reader's `*PagedAll`. */
  def unionPerFile(spark: SparkSession, path: String)
                  (perFile: String => DataFrame): DataFrame = {
    val files = listFiles(spark, path)
    require(files.nonEmpty, s"no files match $path")
    files.map(perFile).reduce(_.unionByName(_))
  }

  def fileLength(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(p).getLen
  }

  /** Largest per-task pread — keeps every buffer far under both the
    * 2 GB Array limit and executor memory; ranges split further when
    * `totalRows / partitions` rows would exceed it. */
  private val MaxRangeBytes = 128L << 20

  /** Fan contiguous row ranges across tasks; each task rebuilds the
    * session's Hadoop conf, preads its bytes and hands them to
    * `decode(buf, startRow, nRows)`. */
  def scan(spark: SparkSession, path: String, schema: StructType,
           totalRows: Long, dataAt: Long, rowLen: Long, partitions: Int)
          (decode: (Array[Byte], Long, Long) => Iterator[Row]): DataFrame = {
    require(rowLen > 0, "paged scan needs a positive row stride")
    val nParts = math.max(1, if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism)
    val byParts = math.max(1L, (totalRows + nParts - 1) / nParts)
    val perPart = math.min(byParts, math.max(1L, MaxRangeBytes / rowLen))
    val ranges = (0L until totalRows by perPart)
      .map(s => (s, math.min(perPart, totalRows - s)))
    val hconf = confMap(spark)
    val rdd = spark.sparkContext
      .parallelize(ranges, math.max(1, ranges.size))
      .flatMap { case (start, n) =>
        val p = new org.apache.hadoop.fs.Path(path)
        val fs = p.getFileSystem(rebuild(hconf))
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
