package graft.unload

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}

/** File/object metadata, mirroring the reference's S3ObjectInfo
  * (reference src/S3Client/Models/S3ObjectInfo.cs:10 — Key, Size,
  * LastModified, ETag). `etag` is a content checksum: S3-style stores
  * return it with the listing for free; Hadoop filesystems charge an
  * extra RPC (or a full content read on raw local disks) per entry, so
  * listings populate it only when asked (`withETags = true`) — the
  * million-object default listing stays one metadata call per page.
  */
final case class ObjectInfo(key: String, size: Long, lastModifiedMillis: Long,
                            etag: Option[String] = None)

final class StorageException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

/** Storage operations (S9-S12) over the Hadoop FileSystem API — the
  * Spark-native equivalent of the reference's MinIO S3 client
  * (reference src/S3Client/MinioS3Client.cs:56-181). Works uniformly over
  * local paths and any Hadoop-supported object store (s3a://, etc.), so the
  * same code path serves local tests and a production bucket.
  */
class StorageOps(conf: Configuration) {

  private def fs(p: Path): FileSystem = p.getFileSystem(conf)

  /** Upload (S9): local file → target; parent dirs auto-created
    * (MinioS3Client.cs:56-72).
    */
  def upload(localFile: String, target: String): Unit = {
    val src = new Path(localFile)
    val dst = new Path(target)
    if (!fs(src).exists(src))
      throw new StorageException(s"Local file not found: $localFile")
    fs(dst).copyFromLocalFile(false, true, src, dst)
  }

  /** Download (S9): source → local file; local parent dirs auto-created
    * (MinioS3Client.cs:74-94).
    */
  def download(source: String, localFile: String): Unit = {
    val src = new Path(source)
    val dst = new Path(localFile)
    if (!fs(src).exists(src))
      throw new StorageException(s"Object not found: $source")
    Option(dst.getParent).foreach(p => fs(dst).mkdirs(p))
    fs(src).copyToLocalFile(false, src, dst, true)
  }

  /** Paginated-equivalent prefix listing (S10): recursive, returns flat
    * object infos like the reference's continuation-token loop
    * (MinioS3Client.cs:97-130). This convenience form MATERIALIZES the
    * listing (one ObjectInfo per entry on the driver heap) — use
    * [[listIterator]] for huge prefixes.
    */
  def list(prefix: String, withETags: Boolean = false): Seq[ObjectInfo] =
    listIterator(prefix, withETags).toSeq

  /** Streaming variant of [[list]]: wraps Hadoop's RemoteIterator, so a
    * million-object prefix is consumed entry-by-entry without driver-side
    * materialization.
    */
  def listIterator(prefix: String, withETags: Boolean = false): Iterator[ObjectInfo] = {
    val p = new Path(prefix)
    val f = fs(p)
    if (!f.exists(p)) return Iterator.empty
    val it = f.listFiles(p, true)
    new Iterator[ObjectInfo] {
      def hasNext: Boolean = it.hasNext
      def next(): ObjectInfo = {
        val st = it.next()
        // reuse the FileStatus the listing already holds — etag(path)
        // would redo exists+getFileStatus, two avoidable metadata RPCs
        // per listed object
        ObjectInfo(st.getPath.toString, st.getLen, st.getModificationTime,
          if (withETags) etagOf(st.getPath, st.isDirectory) else None)
      }
    }
  }

  /** Content checksum for one object (the reference's ETag,
    * S3ObjectInfo.cs:10): the filesystem's native checksum when it has one
    * (S3A exposes the real ETag; HDFS its MD5-of-CRC composite), else a
    * streamed MD5 of the content — identical bytes always yield an equal
    * etag within one filesystem, the property callers use it for.
    */
  def etag(path: String): Option[String] = {
    val p = new Path(path)
    val f = fs(p)
    if (!f.exists(p)) return None
    etagOf(p, f.getFileStatus(p).isDirectory)
  }

  /** [[etag]] core for callers that already know the status (the listing
    * iterator) — skips the existence/status round-trips.
    */
  private def etagOf(p: Path, isDirectory: Boolean): Option[String] = {
    val f = fs(p)
    if (isDirectory) return None
    Option(f.getFileChecksum(p)) match {
      case Some(ck) =>
        Some(ck.getBytes.map(b => f"$b%02x").mkString)
      case None =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val in = f.open(p)
        try {
          val buf = new Array[Byte](64 * 1024)
          var n = in.read(buf)
          while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
        } finally in.close()
        Some(md.digest().map(b => f"$b%02x").mkString)
    }
  }

  /** Server-side-style copy (S11, MinioS3Client.cs:133-151). */
  def copy(source: String, target: String): Unit = {
    val src = new Path(source)
    val dst = new Path(target)
    if (!fs(src).exists(src))
      throw new StorageException(s"Object not found: $source")
    if (!FileUtil.copy(fs(src), src, fs(dst), dst, false, true, conf))
      throw new StorageException(s"Copy failed: $source -> $target")
  }

  /** Delete single (S12). */
  def delete(path: String): Unit = {
    val p = new Path(path)
    fs(p).delete(p, false)
  }

  /** Batch delete (S12): no-ops on empty input (MinioS3Client.cs:166-170). */
  def deleteAll(paths: Seq[String]): Unit =
    paths.foreach(delete)
}
