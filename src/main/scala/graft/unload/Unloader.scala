package graft.unload

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Result of an unload — row count + final path, mirroring the reference's
  * UnloadResponse (reference src/AthenaTrinoClient/Models/UnloadResponse.cs:3).
  */
final case class UnloadResponse(rowCount: Long, path: String)

final class UnloadException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

/** Query → Parquet export (S7/S8/C4), ported from the reference's
  * CTAS + copy + cleanup orchestration (reference
  * src/AthenaTrinoClient/AthenaClient.cs:116-208) but collapsed to a single
  * engine: write once to a temp dir, then *flatten* the part files into the
  * target root — the reference's tests assert the export has no `data/` or
  * `metadata/` path components, only bare `*.parquet` files at the target
  * (AthenaClientTests.cs:158-169, :264-274).
  *
  * Scale notes: the write is fully distributed; the flatten step is a pure
  * metadata `rename` per part file when temp and target share a filesystem
  * (the common case — temp lives next to the target), and falls back to a
  * byte copy only across filesystems (S8 cross-bucket). Row count comes
  * from the written Parquet footers (metadata-only read), avoiding the
  * reference's double-scan CTAS-then-count pattern.
  *
  * Concurrency/isolation: each run cleans up only its OWN temp directory
  * (concurrent unloads under the same parent never clobber each other),
  * and checksum suppression happens on private FileSystem instances —
  * mutating the JVM-wide cached FS would disable .crc checksums for every
  * other Hadoop user in the process.
  */
class Unloader(spark: SparkSession) {

  private def conf = spark.sparkContext.hadoopConfiguration

  /** Export `df` as flat Parquet files under `targetDir` (created if
    * missing; may be on a different filesystem/bucket than the source — S8).
    */
  def unload(df: DataFrame, targetDir: String): UnloadResponse = {
    val target = new Path(targetDir)
    // unique temp identity, reference AthenaClient.cs:132-138
    val stamp = java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss")
      .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now)
    val rand = java.util.UUID.randomUUID.toString.take(8)
    val temp = new Path(target.getParent match {
      case null => target
      case p    => p
    }, s"_unload_temp/unload_temp_${stamp}_$rand")
    // private (non-cached) instances: checksum flags below must not leak
    // into the JVM-wide FileSystem cache
    val tfs = FileSystem.newInstance(temp.toUri, conf)
    val outFs = FileSystem.newInstance(target.toUri, conf)
    try {
      df.write.mode("errorifexists").parquet(temp.toString)
      // metadata-only count from parquet footers of what was written
      val rowCount = spark.read.parquet(temp.toString).count()
      // the export contract is bare *.parquet at the target root — suppress
      // local-FS .crc sidecars (AthenaClientTests.cs:158-169 asserts only
      // parquet files survive)
      tfs.setVerifyChecksum(false)
      outFs.setWriteChecksum(false)
      outFs.mkdirs(target)
      val sameFs = tfs.getUri == outFs.getUri
      // rename through the RAW filesystem where one exists:
      // ChecksumFileSystem.rename drags .crc sidecars to the target,
      // breaking the bare-*.parquet contract; the raw rename moves only
      // the data file and the sidecars die with the temp dir
      val renameFs = tfs match {
        case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
        case f => f
      }
      val parts = tfs.listStatus(temp).filter(_.getPath.getName.endsWith(".parquet"))
      parts.foreach { st =>
        val dst = new Path(target, st.getPath.getName)
        val ok =
          if (sameFs) renameFs.rename(st.getPath, dst)
          else org.apache.hadoop.fs.FileUtil.copy(tfs, st.getPath, outFs, dst,
            false, true, conf)
        if (!ok)
          throw new UnloadException(s"Failed to move ${st.getPath} to $dst")
      }
      UnloadResponse(rowCount, target.toString)
    } catch {
      case e: UnloadException => throw e
      case e: Throwable =>
        // error contract: wrap with actionable target path, AthenaClient.cs:200-207
        throw new UnloadException(s"Failed to unload data to path: $targetDir", e)
    } finally {
      // best-effort cleanup of THIS run's temp dir only (concurrent runs
      // share the _unload_temp parent), AthenaClient.cs:174-196
      try tfs.delete(temp, true) catch { case _: Throwable => () }
      try {
        // prune the shared parent only when empty
        val parent = temp.getParent
        if (tfs.exists(parent) && tfs.listStatus(parent).isEmpty)
          tfs.delete(parent, false)
      } catch { case _: Throwable => () }
      try tfs.close() catch { case _: Throwable => () }
      try outFs.close() catch { case _: Throwable => () }
    }
  }
}
