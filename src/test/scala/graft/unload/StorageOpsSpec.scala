package graft.unload

import graft.SparkSpec
import java.nio.file.{Files, Paths}

/** Storage ops contract, ported from the reference's S3 client tests
  * (reference tests/IntegrationTests/S3ClientTests.cs:65-240).
  */
class StorageOpsSpec extends SparkSpec {

  private def ops = new StorageOps(spark.sparkContext.hadoopConfiguration)

  private def writeLocal(dir: String, name: String, content: String): String = {
    val p = Paths.get(dir, name)
    Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  test("upload + download round-trip preserves content (S3ClientTests.cs:65-106)") {
    val src = writeLocal(tmpDir("st-src"), "hello.txt", "hello graft")
    val remote = tmpDir("st-remote") + "/nested/dir/hello.txt"
    ops.upload(src, remote)
    val back = tmpDir("st-back") + "/deep/out.txt"
    ops.download(remote, back)
    assert(new String(Files.readAllBytes(Paths.get(back)), "UTF-8") == "hello graft")
  }

  test("missing local file on upload → typed error (S3ClientTests.cs:169-191)") {
    intercept[StorageException] { ops.upload("/nonexistent/nope.txt", tmpDir("x") + "/y") }
  }

  test("missing object on download → typed error") {
    intercept[StorageException] { ops.download(tmpDir("x") + "/missing", tmpDir("y") + "/out") }
  }

  test("list returns key/size/mtime for all objects under prefix (S10)") {
    val base = tmpDir("st-list")
    writeLocal(base, "a.txt", "aa")
    Files.createDirectories(Paths.get(base, "sub"))
    writeLocal(base + "/sub", "b.txt", "bbbb")
    val infos = ops.list(base)
    assert(infos.size == 2)
    val bySuffix = infos.map(i => i.key.split('/').last -> i.size).toMap
    assert(bySuffix == Map("a.txt" -> 2L, "b.txt" -> 4L))
    assert(infos.forall(_.lastModifiedMillis > 0))
  }

  test("list of missing prefix is empty, batch delete no-ops on empty (S3ClientTests/MinioS3Client.cs:166-170)") {
    assert(ops.list(tmpDir("st-empty") + "/nothing") == Nil)
    ops.deleteAll(Nil) // must not throw
  }

  test("etag: equal content ⇒ equal etag, distinct content ⇒ distinct (S3ObjectInfo.cs:10)") {
    val base = tmpDir("st-etag")
    val a = writeLocal(base, "a.txt", "same content")
    writeLocal(base, "b.txt", "same content")
    writeLocal(base, "c.txt", "different content")
    val byName = ops.list(base, withETags = true)
      .map(i => i.key.split('/').last -> i.etag).toMap
    assert(byName.values.forall(_.isDefined), "etags requested but absent")
    assert(byName("a.txt") == byName("b.txt"), "identical bytes must share an etag")
    assert(byName("a.txt") != byName("c.txt"), "different bytes must differ")
    // default listing skips the per-entry checksum cost
    assert(ops.list(base).forall(_.etag.isEmpty))
    // single-object form; directories have no etag
    assert(ops.etag(a) == byName("a.txt"))
    assert(ops.etag(base).isEmpty)
  }

  test("copy + delete (S11, S12)") {
    val base = tmpDir("st-copy")
    val src = writeLocal(base, "orig.txt", "content")
    ops.copy(src, s"$base/copied.txt")
    assert(Files.exists(Paths.get(base, "copied.txt")))
    assert(Files.exists(Paths.get(base, "orig.txt"))) // copy, not move
    ops.delete(src)
    assert(!Files.exists(Paths.get(base, "orig.txt")))
    ops.deleteAll(Seq(s"$base/copied.txt"))
    assert(!Files.exists(Paths.get(base, "copied.txt")))
  }
}
