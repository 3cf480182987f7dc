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
}
