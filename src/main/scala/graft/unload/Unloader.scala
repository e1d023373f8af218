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
  * metadata rename per part file (no byte copying on HDFS/S3A-compatible
  * stores), so export cost is one distributed write regardless of file
  * count. Row count comes from the written Parquet footers (metadata-only
  * read), avoiding the reference's double-scan CTAS-then-count pattern.
  */
class Unloader(spark: SparkSession) {

  private def fs(p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

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
    val tfs = fs(temp)
    try {
      df.write.mode("errorifexists").parquet(temp.toString)
      // metadata-only count from parquet footers of what was written
      val rowCount = spark.read.parquet(temp.toString).count()
      val outFs = fs(target)
      // the export contract is bare *.parquet at the target root — suppress
      // local-FS .crc sidecars (AthenaClientTests.cs:158-169 asserts only
      // parquet files survive)
      tfs.setVerifyChecksum(false)
      outFs.setWriteChecksum(false)
      outFs.mkdirs(target)
      val parts = tfs.listStatus(temp).filter(_.getPath.getName.endsWith(".parquet"))
      parts.foreach { st =>
        val dst = new Path(target, st.getPath.getName)
        if (!org.apache.hadoop.fs.FileUtil.copy(tfs, st.getPath, outFs, dst,
          false, true, spark.sparkContext.hadoopConfiguration))
          throw new UnloadException(s"Failed to copy ${st.getPath} to $dst")
      }
      UnloadResponse(rowCount, target.toString)
    } catch {
      case e: UnloadException => throw e
      case e: Throwable =>
        // error contract: wrap with actionable target path, AthenaClient.cs:200-207
        throw new UnloadException(s"Failed to unload data to path: $targetDir", e)
    } finally {
      // best-effort temp cleanup, AthenaClient.cs:174-196
      try tfs.delete(temp.getParent, true) catch { case _: Throwable => () }
    }
  }
}
