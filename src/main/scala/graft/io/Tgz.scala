package graft.io

import java.io.{BufferedInputStream, DataInputStream, EOFException, File,
  FileInputStream, FileOutputStream, InputStream, PushbackInputStream}
import java.net.URI
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import scala.collection.mutable

/** tar / tar.gz ingest with zero non-JDK deps.
  *
  * Reference: `fetch_tgz` (gofast/utils/ml/data_handling.py:954) —
  * download a .tgz and extract everything — and `fetch_tgz_in`
  * (data_handling.py:892) — extract one member matched by filename
  * suffix, optionally renamed.
  *
  * The tar walk is a plain 512-byte-block ustar reader (name+prefix
  * fields, octal sizes, GNU 'L' long-name and PAX 'x' path overrides),
  * gzip via `java.util.zip`. Driver-side by design: archives are an
  * ingest/landing format — extract once, then read the contained
  * csv/json/parquet distributed via [[IO.readData]].
  *
  * Every entry path is resolved against the destination and rejected
  * if it escapes it (zip-slip), so untrusted archives can't write
  * outside `destDir`.
  */
object Tgz {

  /** One archive member's metadata (regular files only). */
  final case class Entry(name: String, size: Long)

  /** List regular-file members without extracting. */
  def list(archive: String): Seq[Entry] = {
    val in = open(archive)
    try {
      val out = mutable.ArrayBuffer.empty[Entry]
      walk(in) { (e, data) => out += e; skipFully(data, e.size); true }
      out.toSeq
    } finally in.close()
  }

  /** `fetch_tgz` extraction half: extract every regular file under
    * `destDir` (created if absent), returning the extracted paths. */
  def extractAll(archive: String, destDir: String): Seq[String] = {
    val dest = new File(destDir); dest.mkdirs()
    val in = open(archive)
    try {
      val out = mutable.ArrayBuffer.empty[String]
      walk(in) { (e, data) =>
        out += writeMember(dest, e, data)
        true
      }
      out.toSeq
    } finally in.close()
  }

  /** `fetch_tgz_in`: extract the first member whose name ends with
    * `filename`, into `destDir`, optionally renamed; returns the
    * final path. Raises if no member matches, like the reference. */
  def extractOne(archive: String, filename: String,
                 destDir: String = "tgz",
                 renameTo: Option[String] = None): String = {
    val dest = new File(destDir); dest.mkdirs()
    var found: Option[String] = None
    val in = open(archive)
    try {
      walk(in) { (e, data) =>
        if (found.isEmpty && e.name.endsWith(filename)) {
          val extracted = writeMember(dest, e, data)
          val target = renameTo match {
            case Some(r) => new File(dest, r).getPath
            case None => new File(dest, filename).getPath
            }
          // same zip-slip containment as writeMember: a caller-supplied
          // renameTo of "../x" must not write outside destDir either
          val canonDest = dest.getCanonicalPath
          val canonTarget = new File(target).getCanonicalPath
          require(canonTarget.startsWith(canonDest + File.separator) ||
              canonTarget == canonDest,
            s"rename target escapes destination: $target")
          if (extracted != target) {
            new File(target).getParentFile.mkdirs()
            require(new File(extracted).renameTo(new File(target)),
              s"rename failed: $extracted -> $target")
          }
          found = Some(target)
          false // stop the walk
        } else { skipFully(data, e.size); true }
      }
    } finally in.close()
    found.getOrElse(throw new java.io.FileNotFoundException(
      s"no member of $archive ends with '$filename'"))
  }

  /** `fetch_tgz`: fetch `url` (http/https/file) to `destDir` and
    * extract it there; returns extracted paths. The download is a
    * plain stream copy — no auth, no retries — matching the
    * reference's urllib one-shot. */
  def fetchTgz(url: String, destDir: String): Seq[String] = {
    val dest = new File(destDir); dest.mkdirs()
    val local = new File(dest, url.substring(url.lastIndexOf('/') + 1))
    val in = new BufferedInputStream(new URI(url).toURL.openStream())
    try {
      val out = new FileOutputStream(local)
      try {
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      } finally out.close()
    } finally in.close()
    extractAll(local.getPath, destDir)
  }

  // ---------------------------------------------------------------- internals

  /** Open plain or gzipped tar, sniffing the gzip magic. */
  private def open(path: String): InputStream = {
    val raw = new PushbackInputStream(
      new BufferedInputStream(new FileInputStream(path)), 2)
    val m = new Array[Byte](2)
    val n = raw.read(m)
    if (n > 0) raw.unread(m, 0, n)
    if (n == 2 && (m(0) & 0xFF) == 0x1F && (m(1) & 0xFF) == 0x8B)
      new GZIPInputStream(raw)
    else raw
  }

  /** Walk members; `f` gets each regular file's entry and a stream
    * positioned at its data (f must consume exactly `size` bytes or
    * use skipFully) and returns whether to continue. */
  private def walk(in: InputStream)
                  (f: (Entry, DataInputStream) => Boolean): Unit = {
    val data = new DataInputStream(in)
    val block = new Array[Byte](512)
    var longName: String = null
    var paxPath: String = null
    var paxSize: Long = -1L
    var go = true
    while (go) {
      val n = try { data.readFully(block); 512 } catch {
        case _: EOFException => 0
      }
      if (n == 0 || block.forall(_ == 0)) { go = false }
      else {
        val headerSize = numeric(block, 124, 12)
        val typeflag = block(156).toChar
        // metadata records ('L' long name, 'x'/'g' PAX) are buffered in
        // memory: cap them so a hostile base-256/octal size can neither
        // truncate through toInt (desynchronizing the block walk) nor
        // allocate unbounded
        def metaBuf(): Array[Byte] = {
          require(headerSize >= 0 && headerSize <= (1L << 20),
            s"malformed tar: $typeflag metadata record of $headerSize bytes")
          new Array[Byte](headerSize.toInt)
        }
        typeflag match {
          case 'L' => // GNU long name: data holds the real name
            val padded = ((headerSize + 511) / 512) * 512
            val nameBuf = metaBuf()
            data.readFully(nameBuf)
            skipFully(data, padded - headerSize)
            longName = cstr(nameBuf, 0, nameBuf.length)
          case 'x' | 'g' => // PAX header
            val padded = ((headerSize + 511) / 512) * 512
            val buf = metaBuf()
            data.readFully(buf)
            skipFully(data, padded - headerSize)
            // only per-file 'x' records may override the NEXT member's
            // name/size; 'g' records are archive-wide defaults (POSIX)
            // and must not rename whichever member happens to come next
            if (typeflag == 'x') {
              // POSIX record: "LEN key=value\n" where LEN counts the
              // WHOLE record (digits, space, trailing newline). Records
              // must be consumed by LEN, not split on '\n' — values may
              // legally contain newlines, and a line-split would let
              // "…=x\n10 size=99\n" inside one VALUE masquerade as a
              // size record and desynchronize the block walk.
              var off = 0
              while (off < buf.length) {
                var sp = off
                while (sp < buf.length && buf(sp) != ' '.toByte) sp += 1
                val digits = sp - off
                require(digits > 0 && digits <= 7 && sp < buf.length &&
                    (off until sp).forall(i => buf(i) >= '0'.toByte &&
                      buf(i) <= '9'.toByte),
                  "malformed tar: PAX record length")
                val len =
                  new String(buf, off, digits, StandardCharsets.US_ASCII).toInt
                require(len > digits + 1 && off + len <= buf.length &&
                    buf(off + len - 1) == '\n'.toByte,
                  s"malformed tar: PAX record length $len")
                val rec = new String(buf, sp + 1, off + len - 1 - (sp + 1),
                  StandardCharsets.UTF_8)
                val eq = rec.indexOf('=')
                if (eq > 0) {
                  val key = rec.substring(0, eq)
                  val v = rec.substring(eq + 1)
                  if (key == "path") paxPath = v
                  else if (key == "size") {
                    // overrides the header field for >= 8 GiB members
                    // whose octal size field can't represent them
                    require(v.nonEmpty && v.length <= 18 &&
                        v.forall(_.isDigit),
                      s"malformed tar: PAX size '$v'")
                    paxSize = v.toLong
                  }
                }
                off += len
              }
            }
          case c if c == '0' || c == 0.toChar => // regular file
            val size = if (paxSize >= 0) paxSize else headerSize
            val padded = ((size + 511) / 512) * 512
            val name =
              if (paxPath != null) paxPath
              else if (longName != null) longName
              else {
                val base = cstr(block, 0, 100)
                val prefix = cstr(block, 345, 155)
                if (prefix.isEmpty) base else s"$prefix/$base"
              }
            longName = null; paxPath = null; paxSize = -1L
            go = f(Entry(name, size), data)
            skipFully(data, padded - size)
          case _ => // dir/link/other: skip data (dirs have size 0)
            val padded = ((headerSize + 511) / 512) * 512
            longName = null; paxPath = null; paxSize = -1L
            skipFully(data, padded)
        }
      }
    }
  }

  /** Extract one member's bytes under `dest` with a zip-slip guard. */
  private def writeMember(dest: File, e: Entry,
                          data: DataInputStream): String = {
    val target = new File(dest, e.name)
    val canonDest = dest.getCanonicalPath
    require(target.getCanonicalPath.startsWith(canonDest + File.separator) ||
        target.getCanonicalPath == canonDest,
      s"archive member escapes destination: ${e.name}")
    target.getParentFile.mkdirs()
    val out = new FileOutputStream(target)
    try {
      val buf = new Array[Byte](64 * 1024)
      var left = e.size
      while (left > 0) {
        val n = data.read(buf, 0, math.min(buf.length.toLong, left).toInt)
        require(n >= 0, s"truncated archive at ${e.name}")
        out.write(buf, 0, n); left -= n
      }
    } finally out.close()
    target.getPath
  }

  private def skipFully(in: InputStream, n: Long): Unit = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s <= 0) {
        if (in.read() < 0) throw new EOFException("truncated tar")
        left -= 1
      } else left -= s
    }
  }

  /** Parse a tar numeric header field. Octal (POSIX) plus GNU
    * base-256 (first byte has the 0x80 flag — used for members
    * >= 8 GiB). A field that is neither is rejected rather than
    * silently read as 0: a zero size would desynchronize the 512-byte
    * block walk and extract garbage from every subsequent member. */
  private def numeric(b: Array[Byte], off: Int, len: Int): Long = {
    if ((b(off) & 0x80) != 0) { // GNU base-256, big-endian
      var acc = (b(off) & 0x3FL)
      var i = off + 1
      while (i < off + len) {
        // 6 + 11*8 = 94 payload bits overflow a Long: a hostile field
        // (0x80 then eleven 0xFF) would wrap NEGATIVE, make the padded
        // size 0 and desynchronize the block walk — reject loudly once
        // the accumulator leaves the representable (non-negative) range
        require(acc <= (Long.MaxValue >> 8),
          s"malformed tar: base-256 numeric field at offset $off overflows")
        acc = (acc << 8) | (b(i) & 0xFFL); i += 1
      }
      return acc
    }
    var i = off; var acc = 0L
    val end = off + len
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    while (i < end && b(i) >= '0' && b(i) <= '7') {
      acc = acc * 8 + (b(i) - '0'); i += 1
    }
    // after the digits only space/NUL terminators are legal; an
    // all-blank field reads as 0 (sloppy but unambiguous dir/link tars)
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    require(i == end,
      s"malformed tar numeric field at offset $off: " +
        new String(b, off, len, StandardCharsets.ISO_8859_1).trim)
    acc
  }

  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    val max = off + len
    while (end < max && b(end) != 0) end += 1
    new String(b, off, end - off, StandardCharsets.UTF_8)
  }
}
