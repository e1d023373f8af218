package graft

/** Shuffle/spill local-dir resolution for the harness mains.
  *
  * Profiling the sf0.1 sweep showed shuffle FILE CREATION (the
  * `FileOutputStream.open0` syscall under `DiskBlockObjectWriter.open`)
  * as the single largest non-idle executor cost of the shuffle-heavy
  * operators — /tmp here is ext4 on a virtualized disk, so per-file
  * metadata ops are ~ms, and a 32-core sweep creates thousands of
  * shuffle/spill files. Pointing `spark.local.dir` at a RAM-backed
  * tmpfs removes that floor (measured at sf0.1: near_dup_jaccard
  * 1.47 → 1.05 s, dedup_clusters 3.64 → 3.14 s; scan/broadcast-shaped
  * queries unchanged).
  *
  * This is the standard production posture for shuffle working sets
  * that fit in memory — Spark-on-Kubernetes exposes it directly as
  * `spark.kubernetes.local.dirs.tmpfs=true` (local dirs on a
  * tmpfs-backed emptyDir); on YARN/standalone the equivalent is
  * SPARK_LOCAL_DIRS on the fastest ephemeral device (RAM disk or
  * NVMe). At 100 TB the same knob points at striped NVMe instead —
  * the parameterization below, not the tmpfs constant, is the
  * contract. Override order:
  *
  *   1. `SPARK_GRAFT_LOCAL_DIR` env (explicit operator choice)
  *   2. `SPARK_LOCAL_DIRS` env (Spark's own convention — left to Spark)
  *   3. `/dev/shm/graft-spark-local` when /dev/shm is a usable tmpfs
  *   4. Spark's default (java.io.tmpdir)
  *
  * Spark namespaces its blocks under a per-app `spark-<uuid>/`
  * subdirectory and removes it on shutdown, so concurrent JVMs sharing
  * the directory are safe.
  */
object LocalDirs {
  /** The `spark.local.dir` value to use, or None to leave Spark's
    * default. No effect when the operator already set SPARK_LOCAL_DIRS
    * (Spark reads that env itself, overriding spark.local.dir).
    */
  def resolve(): Option[String] =
    sys.env.get("SPARK_GRAFT_LOCAL_DIR").orElse {
      if (sys.env.contains("SPARK_LOCAL_DIRS")) None
      else {
        val shm = new java.io.File("/dev/shm")
        // require real headroom: on a host with a small tmpfs, running
        // shuffles out of space mid-job would be far worse than the ext4
        // file-create tax this avoids
        if (shm.isDirectory && shm.canWrite &&
            shm.getUsableSpace >= 8L * 1024 * 1024 * 1024) {
          val d = new java.io.File(shm, "graft-spark-local")
          d.mkdirs()
          if (d.isDirectory && d.canWrite) Some(d.getAbsolutePath) else None
        } else None
      }
    }

  /** Apply to a session builder: set spark.local.dir when resolvable,
    * and make `file://` permission changes fork-free.
    *
    * Without native libhadoop, Hadoop's local filesystem shells out a
    * `chmod` fork+exec on EVERY file create and mkdir (driver stack
    * sampling showed those forks as the largest non-Spark cost of the
    * write path — several per tiny INSERT: task file, committer temp
    * dirs, _SUCCESS). [[graft.catalog.NioLocalFileSystem]] is
    * byte-identical Hadoop `LocalFileSystem` behavior (checksums and
    * all) with the chmod done as one java.nio syscall. The production
    * analog is installing libhadoop (NativeIO.chmod — the same syscall
    * path); `SPARK_GRAFT_STOCK_LOCALFS=1` restores the stock class.
    */
  def configure(b: org.apache.spark.sql.SparkSession.Builder)
    : org.apache.spark.sql.SparkSession.Builder = {
    val withDirs =
      resolve().map(d => b.config("spark.local.dir", d)).getOrElse(b)
    if (sys.env.contains("SPARK_GRAFT_STOCK_LOCALFS")) withDirs
    else withDirs.config("spark.hadoop.fs.file.impl",
      "graft.catalog.NioLocalFileSystem")
  }
}
