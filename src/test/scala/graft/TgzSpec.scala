package graft

import java.io.{File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream

import scala.sys.process._

import graft.io.{IO, Tgz}

class TgzSpec extends SparkSpec {

  private def tmpDir(): File = {
    val d = Files.createTempDirectory("graft_tgz").toFile
    d.deleteOnExit(); d
  }

  /** Fixture: dir with a csv, a nested file, and a >100-char-name file
    * (forces the GNU/PAX long-name path), tarred by the system tar. */
  private def buildFixture(gzip: Boolean): (File, String) = {
    val src = tmpDir()
    Files.write(Paths.get(src.getPath, "people.csv"),
      "id,name\n1,ada\n2,grace\n".getBytes(StandardCharsets.UTF_8))
    new File(src, "nested/deep").mkdirs()
    Files.write(Paths.get(src.getPath, "nested", "deep", "note.txt"),
      "hello".getBytes(StandardCharsets.UTF_8))
    val longName = "x" * 120 + ".txt"
    Files.write(Paths.get(src.getPath, longName),
      "long".getBytes(StandardCharsets.UTF_8))
    val out = tmpDir()
    val arch = new File(out, if (gzip) "fix.tgz" else "fix.tar").getPath
    val flags = if (gzip) "-czf" else "-cf"
    require(Seq("tar", flags, arch, "-C", src.getPath,
      "people.csv", "nested", longName).! == 0, "tar failed")
    (src, arch)
  }

  test("list + extractAll on gzipped tar with long names and subdirs") {
    val (_, arch) = buildFixture(gzip = true)
    val names = Tgz.list(arch).map(_.name)
    assert(names.contains("people.csv"))
    assert(names.contains("nested/deep/note.txt"))
    assert(names.exists(_.length > 110), s"long name missing: $names")

    val dest = tmpDir()
    val paths = Tgz.extractAll(arch, dest.getPath)
    assert(paths.size == 3)
    val csv = paths.find(_.endsWith("people.csv")).get
    val df = IO.readData(spark, csv)
    assert(df.count() == 2)
    assert(df.columns.toSeq == Seq("id", "name"))
    assert(new String(Files.readAllBytes(
      Paths.get(dest.getPath, "nested", "deep", "note.txt")),
      StandardCharsets.UTF_8) == "hello")
  }

  test("plain (non-gzip) tar is sniffed and read") {
    val (_, arch) = buildFixture(gzip = false)
    assert(Tgz.list(arch).map(_.name).contains("people.csv"))
  }

  test("extractOne: suffix match, rename, missing-member error") {
    val (_, arch) = buildFixture(gzip = true)
    val dest = tmpDir()
    val p = Tgz.extractOne(arch, "note.txt", dest.getPath,
      renameTo = Some("renamed.txt"))
    assert(p.endsWith("renamed.txt"))
    assert(new String(Files.readAllBytes(Paths.get(p)),
      StandardCharsets.UTF_8) == "hello")
    intercept[java.io.FileNotFoundException] {
      Tgz.extractOne(arch, "absent.bin", dest.getPath)
    }
  }

  test("fetchTgz over file:// URL extracts everything") {
    val (_, arch) = buildFixture(gzip = true)
    val dest = tmpDir()
    val paths = Tgz.fetchTgz("file://" + arch, dest.getPath)
    assert(paths.exists(_.endsWith("people.csv")))
  }

  test("zip-slip: member with ../ escape is rejected") {
    // hand-roll a tar whose single member is named ../evil.txt
    val dest = tmpDir()
    val arch = new File(dest, "evil.tgz").getPath
    val name = "../evil.txt"
    val body = "pwn".getBytes(StandardCharsets.UTF_8)
    val header = new Array[Byte](512)
    val nb = name.getBytes(StandardCharsets.UTF_8)
    System.arraycopy(nb, 0, header, 0, nb.length)
    val size = f"${body.length}%011o".getBytes(StandardCharsets.UTF_8)
    System.arraycopy(size, 0, header, 124, size.length)
    header(156) = '0'
    val chkInit = "        ".getBytes(StandardCharsets.UTF_8)
    System.arraycopy(chkInit, 0, header, 148, 8)
    val chk = header.map(_ & 0xFF).sum
    val cb = f"$chk%06o".getBytes(StandardCharsets.UTF_8)
    System.arraycopy(cb, 0, header, 148, cb.length)
    header(154) = 0; header(155) = ' '
    val gz = new GZIPOutputStream(new FileOutputStream(arch))
    gz.write(header); gz.write(body)
    gz.write(new Array[Byte](512 - body.length)) // pad data block
    gz.write(new Array[Byte](1024))              // end-of-archive
    gz.close()
    val e = intercept[IllegalArgumentException] {
      Tgz.extractAll(arch, new File(dest, "out").getPath)
    }
    assert(e.getMessage.contains("escapes"))
    assert(!new File(dest, "evil.txt").exists())
  }

  /** ustar header with caller-controlled name/size bytes + checksum. */
  private def rawHeader(name: String, sizeField: Array[Byte],
                        typeflag: Char = '0'): Array[Byte] = {
    val header = new Array[Byte](512)
    val nb = name.getBytes(StandardCharsets.UTF_8)
    System.arraycopy(nb, 0, header, 0, nb.length)
    System.arraycopy(sizeField, 0, header, 124, math.min(sizeField.length, 12))
    header(156) = typeflag.toByte
    val chkInit = "        ".getBytes(StandardCharsets.UTF_8)
    System.arraycopy(chkInit, 0, header, 148, 8)
    val chk = header.map(_ & 0xFF).sum
    val cb = f"$chk%06o".getBytes(StandardCharsets.UTF_8)
    System.arraycopy(cb, 0, header, 148, cb.length)
    header(154) = 0; header(155) = ' '
    header
  }

  private def writeTar(arch: String, parts: Array[Byte]*): Unit = {
    val out = new FileOutputStream(arch)
    parts.foreach(out.write)
    out.write(new Array[Byte](1024))
    out.close()
  }

  private def pad512(body: Array[Byte]): Array[Byte] =
    new Array[Byte](((body.length + 511) / 512) * 512 - body.length)

  test("GNU base-256 size field parses (>=8GiB encoding on a small member)") {
    val dest = tmpDir()
    val arch = new File(dest, "b256.tar").getPath
    val body = "base256-body".getBytes(StandardCharsets.UTF_8)
    // 12-byte field: 0x80 flag then big-endian size
    val sf = new Array[Byte](12)
    sf(0) = 0x80.toByte
    sf(11) = body.length.toByte
    // a second OCTAL member proves the block walk stayed in sync
    val body2 = "after".getBytes(StandardCharsets.UTF_8)
    val oct = f"${body2.length}%011o".getBytes(StandardCharsets.UTF_8)
    writeTar(arch,
      rawHeader("big.bin", sf), body, pad512(body),
      rawHeader("after.txt", oct), body2, pad512(body2))
    val entries = Tgz.list(arch)
    assert(entries.map(e => e.name -> e.size) ==
      Seq("big.bin" -> body.length.toLong, "after.txt" -> body2.length.toLong))
    val out = new File(dest, "out")
    Tgz.extractAll(arch, out.getPath)
    assert(new String(Files.readAllBytes(Paths.get(out.getPath, "big.bin")),
      StandardCharsets.UTF_8) == "base256-body")
    assert(new String(Files.readAllBytes(Paths.get(out.getPath, "after.txt")),
      StandardCharsets.UTF_8) == "after")
  }

  test("PAX size= override wins over the octal header field") {
    val dest = tmpDir()
    val arch = new File(dest, "pax.tar").getPath
    val body = "pax-sized-member-content".getBytes(StandardCharsets.UTF_8)
    val paxLine = {
      // PAX record: "LEN size=N\n" where LEN counts the whole record
      var rec = s" size=${body.length}\n"
      var len = rec.length + 2
      while (s"$len$rec".length != len) len = s"$len$rec".length
      s"$len$rec".getBytes(StandardCharsets.UTF_8)
    }
    val paxOct = f"${paxLine.length}%011o".getBytes(StandardCharsets.UTF_8)
    // the member's own size field LIES (says 0): the PAX override must win
    val zeroOct = f"${0}%011o".getBytes(StandardCharsets.UTF_8)
    val body2 = "sync".getBytes(StandardCharsets.UTF_8)
    val oct2 = f"${body2.length}%011o".getBytes(StandardCharsets.UTF_8)
    writeTar(arch,
      rawHeader("pax-head", paxOct, 'x'), paxLine, pad512(paxLine),
      rawHeader("data.bin", zeroOct), body, pad512(body),
      rawHeader("sync.txt", oct2), body2, pad512(body2))
    assert(Tgz.list(arch).map(e => e.name -> e.size) ==
      Seq("data.bin" -> body.length.toLong, "sync.txt" -> body2.length.toLong))
    val out = new File(dest, "out")
    Tgz.extractAll(arch, out.getPath)
    assert(new String(Files.readAllBytes(Paths.get(out.getPath, "data.bin")),
      StandardCharsets.UTF_8) == "pax-sized-member-content")
    assert(new String(Files.readAllBytes(Paths.get(out.getPath, "sync.txt")),
      StandardCharsets.UTF_8) == "sync")
  }

  test("malformed size field raises instead of silently reading 0") {
    val dest = tmpDir()
    val arch = new File(dest, "bad.tar").getPath
    val body = "x".getBytes(StandardCharsets.UTF_8)
    writeTar(arch,
      rawHeader("bad.bin", "garbage-size".getBytes(StandardCharsets.UTF_8)),
      body, pad512(body))
    val e = intercept[IllegalArgumentException] { Tgz.list(arch) }
    assert(e.getMessage.contains("malformed tar numeric field"))
  }

  test("PAX value containing ' size=' text does not masquerade as the size record") {
    val dest = tmpDir()
    val arch = new File(dest, "paxtrap.tar").getPath
    // a comment VALUE embedding ' size=1': substring matching would set
    // paxSize=1 and desynchronize the walk; strict key parsing must not
    val rec = {
      var r = s" comment=x size=1\n"
      var len = r.length + 2
      while (s"$len$r".length != len) len = s"$len$r".length
      s"$len$r".getBytes(StandardCharsets.UTF_8)
    }
    val paxOct = f"${rec.length}%011o".getBytes(StandardCharsets.UTF_8)
    val body = "real-member-body".getBytes(StandardCharsets.UTF_8)
    val oct = f"${body.length}%011o".getBytes(StandardCharsets.UTF_8)
    writeTar(arch,
      rawHeader("pax-head", paxOct, 'x'), rec, pad512(rec),
      rawHeader("data.bin", oct), body, pad512(body))
    assert(Tgz.list(arch).map(e => e.name -> e.size) ==
      Seq("data.bin" -> body.length.toLong))
    val out = new File(dest, "out")
    Tgz.extractAll(arch, out.getPath)
    assert(new String(Files.readAllBytes(Paths.get(out.getPath, "data.bin")),
      StandardCharsets.UTF_8) == "real-member-body")
  }

  test("PAX value with an embedded newline cannot fake a size record") {
    val dest = tmpDir()
    val arch = new File(dest, "paxnl.tar").getPath
    // POSIX allows newlines INSIDE a value (LEN covers them). A
    // line-split parser would see the second line "10 size=99" as its
    // own record and desynchronize the walk; the LEN-prefix walk must
    // treat the whole thing as one comment record.
    val inner = "10 size=99\n"
    val rec = {
      var r = s" comment=x\n$inner"
      var len = r.length + 2
      while (s"$len$r".length != len) len = s"$len$r".length
      s"$len$r".getBytes(StandardCharsets.UTF_8)
    }
    val paxOct = f"${rec.length}%011o".getBytes(StandardCharsets.UTF_8)
    val body = "true-body".getBytes(StandardCharsets.UTF_8)
    val oct = f"${body.length}%011o".getBytes(StandardCharsets.UTF_8)
    writeTar(arch,
      rawHeader("pax-head", paxOct, 'x'), rec, pad512(rec),
      rawHeader("data.bin", oct), body, pad512(body))
    assert(Tgz.list(arch).map(e => e.name -> e.size) ==
      Seq("data.bin" -> body.length.toLong))
    val out = new File(dest, "out")
    Tgz.extractAll(arch, out.getPath)
    assert(new String(Files.readAllBytes(Paths.get(out.getPath, "data.bin")),
      StandardCharsets.UTF_8) == "true-body")
  }

  test("metadata record with an absurd size raises instead of toInt-truncating") {
    val dest = tmpDir()
    val arch = new File(dest, "bigmeta.tar").getPath
    // 'L' long-name record claiming 2^32+16 bytes: toInt truncation
    // would allocate 16 bytes and desync; the cap must raise cleanly
    val sf = new Array[Byte](12)
    sf(0) = 0x80.toByte
    sf(7) = 1 // big-endian 2^32
    sf(11) = 16
    writeTar(arch, rawHeader("ignored", sf, 'L'),
      new Array[Byte](512))
    val e = intercept[IllegalArgumentException] { Tgz.list(arch) }
    assert(e.getMessage.contains("metadata record"))
  }

  test("renameTo with ../ escape is rejected like archive member names") {
    val (_, arch) = buildFixture(gzip = true)
    val dest = tmpDir()
    val e = intercept[IllegalArgumentException] {
      Tgz.extractOne(arch, "note.txt", dest.getPath,
        renameTo = Some("../escaped.txt"))
    }
    assert(e.getMessage.contains("escapes"))
    assert(!new File(dest.getParentFile, "escaped.txt").exists())
  }
}
