package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.FileManager

class FileManagerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def fm(): FileManager = {
    val dir = java.nio.file.Files.createTempDirectory("fm-spec").toString
    new FileManager(spark, dir)
  }

  test("upload, list, download round-trip with metadata") {
    val m = fm()
    m.mkdir("sub")
    m.upload("sub/a.txt", "hello".getBytes("UTF-8"))
    m.upload("sub/b.bin", Array[Byte](1, 2, 3))
    val entries = m.list("sub")
    assert(entries.map(_.name).toSet == Set("a.txt", "b.bin"))
    assert(entries.find(_.name == "a.txt").get.sizeBytes == 5L)
    assert(entries.forall(!_.isDir))
    assert(new String(m.download("sub/a.txt"), "UTF-8") == "hello")
    assert(m.list("").exists(e => e.name == "sub" && e.isDir))
  }

  test("rename and delete") {
    val m = fm()
    m.upload("x.txt", "x".getBytes)
    assert(m.rename("x.txt", "y.txt"))
    assert(!m.exists("x.txt") && m.exists("y.txt"))
    assert(m.delete("y.txt"))
    assert(!m.exists("y.txt"))
    assert(m.list("").isEmpty)
  }

  test("zip batch-download bundles existing files, skips missing") {
    val m = fm()
    m.upload("a.txt", "aaa".getBytes)
    m.upload("b.txt", "bbb".getBytes)
    val n = m.zipBatch(Seq("a.txt", "b.txt", "missing.txt"), "bundle.zip")
    assert(n == 2)
    val zipped = m.download("bundle.zip")
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(zipped))
    val names = Iterator.continually(zin.getNextEntry).takeWhile(_ != null).map(_.getName).toSet
    assert(names == Set("a.txt", "b.txt"))
  }

  test("path escapes are rejected") {
    val m = fm()
    intercept[IllegalArgumentException] { m.upload("../evil.txt", "x".getBytes) }
    intercept[IllegalArgumentException] { m.list("../..") }
  }

  test("sibling directory sharing the workspace name prefix is not reachable") {
    val root = java.nio.file.Files.createTempDirectory("fm-prefix")
    val ws = root.resolve("ws")
    java.nio.file.Files.createDirectories(ws)
    java.nio.file.Files.createDirectories(root.resolve("ws-backup"))
    val m = new FileManager(spark, ws.toString)
    // "/x/ws-backup" starts with "/x/ws" as a raw string — must still be
    // rejected as outside the workspace
    intercept[IllegalArgumentException] { m.upload("../ws-backup/evil.txt", "x".getBytes) }
    intercept[IllegalArgumentException] { m.delete("../ws-backup", recursive = true) }
  }
}
