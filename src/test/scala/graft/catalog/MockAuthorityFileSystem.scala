package graft.catalog

import java.io.File
import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** Test-only FileSystem registered at `mock://<bucket>/` — an
  * authority-carrying scheme backed by the local disk. Paths keep their
  * `mock://bucket` prefix through qualification, listing, and status
  * calls while bytes live at the literal local path (the authority
  * names a namespace, not a storage root — two buckets used by one
  * test simply point at different temp dirs). This is the offline
  * proxy for s3a/hdfs URIs: every path-identity surface (eq-delete
  * file matching, manifest absolute paths, adoption qualification,
  * cross-bucket unload) runs over URIs where stripping or mangling the
  * authority is an observable bug, which bare `file:/` paths can never
  * catch.
  */
class MockAuthorityFileSystem extends RawLocalFileSystem {
  private var myUri: URI = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    myUri = URI.create(name.getScheme + "://" + name.getAuthority)
    super.initialize(name, conf)
  }

  override def getUri: URI = myUri

  override def getScheme: String = "mock"

  override def pathToFile(path: Path): File =
    new File(path.toUri.getPath)

  // the superclass constructor asks for the working directory before
  // initialize() has run — fall back to the local-FS answer until the
  // mock URI exists
  override def getWorkingDirectory: Path =
    if (myUri == null) new Path("file:///")
    else new Path(myUri.toString + "/")

  protected override def getInitialWorkingDirectory: Path =
    if (myUri == null) new Path("file:///")
    else new Path(myUri.toString + "/")

  /** Re-anchor a status produced by the local-FS superclass (which
    * reconstructs paths from java.io.File, losing the mock authority)
    * back onto this filesystem's URI.
    */
  private def requalify(st: FileStatus): FileStatus =
    // a PLAIN FileStatus, never the superclass's deprecated one: that
    // one lazy-loads permissions via `new java.io.File(path.toUri)`,
    // which rejects any non-file scheme — exactly the path shape this
    // mock exists to produce. Size/kind/mtime are what the engine
    // reads; permissions default.
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      null, null, null,
      new Path(myUri.toString + st.getPath.toUri.getPath))

  override def getFileStatus(f: Path): FileStatus =
    requalify(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(requalify)
}

/** FileContext binding for `mock://` (the atomic commit-log rename goes
  * through FileContext, not FileSystem) — a plain delegate onto
  * [[MockAuthorityFileSystem]].
  */
class MockAbstractFileSystem(uri: URI, conf: Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new MockAuthorityFileSystem, conf, "mock", false)
