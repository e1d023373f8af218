package graft.catalog

import java.nio.file.Files
import java.nio.file.attribute.{PosixFileAttributes, PosixFilePermission}

import org.apache.hadoop.fs.{FileStatus, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** `RawLocalFileSystem` whose chmod is one java.nio syscall instead of a
  * forked `chmod` process.
  *
  * Without native libhadoop (none in this image, and none on most
  * container images), Hadoop's `RawLocalFileSystem.setPermission` falls
  * back to `Shell.execCommand("chmod", …)` — a fork+exec per call — and
  * the local filesystem calls it on EVERY file create and every mkdir
  * (`create` applies the umasked default permission via setPermission;
  * `mkOneDirWithMode` does the same for directories). Driver stack
  * sampling of the warehouse demos showed those forks as the largest
  * single non-Spark cost of the write path (guide §1 measure-first,
  * §7.3 thread dumps): a tiny INSERT pays several forks (task file,
  * committer temp dirs, _SUCCESS), ~3-10 ms each.
  *
  * `Files.setPosixFilePermissions` applies the identical mode bits with
  * one `fchmodat(2)` — same resulting permissions, no process fork. The
  * production analog is simply having libhadoop (NativeIO.chmod); this
  * class is the pure-JVM equivalent for deployments without it. Modes
  * outside the POSIX rwx bits (setuid/setgid/sticky — never produced by
  * Spark's write path) fall back to Hadoop's own implementation.
  */
class NioRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val mode = permission.toShort.toInt
    if ((mode & ~0x1ff) != 0) super.setPermission(p, permission)
    else {
      import PosixFilePermission._
      // bit i of the mode ↔ order(i), LSB = others-execute
      val order = Array(OTHERS_EXECUTE, OTHERS_WRITE, OTHERS_READ,
        GROUP_EXECUTE, GROUP_WRITE, GROUP_READ,
        OWNER_EXECUTE, OWNER_WRITE, OWNER_READ)
      val set = new java.util.HashSet[PosixFilePermission]()
      var i = 0
      while (i < 9) {
        if ((mode & (1 << i)) != 0) set.add(order(i))
        i += 1
      }
      Files.setPosixFilePermissions(pathToFile(p).toPath, set)
    }
  }

  /** Statuses with the POSIX permission/owner/group pre-filled from one
    * java.nio `readAttributes` call. Hadoop's raw-local statuses load
    * permissions LAZILY via a forked `ls` — and `LocatedFileStatus`'s
    * constructor (built by `listFiles`/`listLocatedStatus`, and by
    * Spark's own InMemoryFileIndex listing) triggers that load eagerly,
    * so every file of every directory listing pays a fork. Pre-filling
    * makes the later permission read free.
    */
  private def withNioPerms(s: FileStatus): FileStatus =
    try {
      val attrs = Files.readAttributes(
        pathToFile(s.getPath).toPath, classOf[PosixFileAttributes])
      import PosixFilePermission._
      val order = Array(OTHERS_EXECUTE, OTHERS_WRITE, OTHERS_READ,
        GROUP_EXECUTE, GROUP_WRITE, GROUP_READ,
        OWNER_EXECUTE, OWNER_WRITE, OWNER_READ)
      var mode = 0
      val ps = attrs.permissions()
      var i = 0
      while (i < 9) { if (ps.contains(order(i))) mode |= (1 << i); i += 1 }
      new FileStatus(s.getLen, s.isDirectory, 1, s.getBlockSize,
        s.getModificationTime, s.getAccessTime,
        new FsPermission(mode.toShort), attrs.owner().getName,
        attrs.group().getName, s.getPath)
    } catch { case _: Exception => s } // symlink races etc: keep Hadoop's

  override def getFileStatus(f: Path): FileStatus =
    withNioPerms(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(withNioPerms)
}

/** Drop-in `fs.file.impl` replacement for Hadoop's `LocalFileSystem`:
  * identical checksum behavior (it IS a `LocalFileSystem`, so
  * `FileSystem.getLocal`'s cast and every `case cfs: ChecksumFileSystem`
  * keep working), but permission changes go through
  * [[NioRawLocalFileSystem]] — no shell forks. Wired by the harness
  * sessions via `spark.hadoop.fs.file.impl` (see [[graft.LocalDirs]]).
  */
class NioLocalFileSystem extends LocalFileSystem(new NioRawLocalFileSystem)
