package graft

import org.apache.spark.sql.SparkSession

/** Dev-only scaling check for the distributed `add_files` adoption path
  * (Trino Iceberg's `ALTER TABLE … EXECUTE add_files`): adopt external
  * parquet directories of growing file counts and report wall time plus
  * the per-file cost. The footer/validation pass runs as a Spark job
  * over the file list (executors open the footers; the driver collects
  * only KB-scale entries), so per-file wall cost must stay flat-or-
  * falling as the count grows — the round-8 serial driver loop grew
  * linearly with single-threaded I/O latency, which at the 10⁵-10⁶
  * files of a real 100 TB adoption meant hours.
  * Usage: runMain graft.DevAddFilesBench [counts...] (default 64 256)
  */
object DevAddFilesBench {
  def main(args: Array[String]): Unit = {
    val counts = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(64, 256)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // driver peak-heap sampler: polls used heap during each adoption so
    // the 10^4-file arm can show FLAT driver memory (the sharded path
    // returns only manifest names + paths to the driver)
    @volatile var sampling = false
    @volatile var peakUsed = 0L
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val rt = Runtime.getRuntime
          val used = rt.totalMemory - rt.freeMemory
          if (used > peakUsed) peakUsed = used
        }
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    def measured[A](f: => A): (A, Double, Long) = {
      System.gc()
      val rt = Runtime.getRuntime
      val base = rt.totalMemory - rt.freeMemory
      peakUsed = base; sampling = true
      val t0 = System.nanoTime()
      val r = f
      val secs = (System.nanoTime() - t0) / 1e9
      sampling = false
      (r, secs, (peakUsed - base).max(0L))
    }

    val wh = java.nio.file.Files.createTempDirectory("graft-addfbench").toString
    val c = new graft.catalog.SnapshotCatalog(spark, wh)
    c.createSchema("b")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))

    val results = counts.map { n =>
      val ext = java.nio.file.Files.createTempDirectory(s"graft-addf-$n").toString
      (0L until n.toLong * 64).toDF("id").selectExpr("id", "id * 2 as v")
        .repartition(n).write.mode("overwrite").parquet(ext)
      val t = s"t$n"
      c.createTable("b", t, schema)
      val (adopted, secs, peak) = measured(c.addFiles("b", t, ext))
      require(c.readLatest("b", t).count() == n.toLong * 64,
        s"adopted table row count mismatch at n=$n")
      val shards = c.manifestNames("b", t, c.snapshots("b", t).last).size
      (n, adopted, secs, peak, shards)
    }
    results.foreach { case (n, adopted, secs, peak, shards) =>
      println(f"[addfilesbench] files=$n%5d adopted=$adopted%5d " +
        f"wall=${secs}%6.2fs per-file=${secs * 1000 / n}%6.2fms " +
        f"driverPeak=${peak / 1048576.0}%6.1fMiB shards=$shards%3d")
    }
    val perFile = results.map { case (n, _, s, _, _) => s / n }
    println(f"[addfilesbench] per-file ratio largest/smallest count = " +
      f"${perFile.last / perFile.head}%.2f (flat-or-falling expected; " +
      "a serial driver loop would hold ~1.0 with latency, never amortize)")

    // migrate arm: same distributed footer job plus the in-place
    // metadata writes — per-file cost must amortize identically
    val mResults = counts.map { n =>
      val lake = java.nio.file.Files.createTempDirectory(s"graft-mig-$n").toString
      (0L until n.toLong * 64).toDF("id").selectExpr("id", "id * 2 as v")
        .repartition(n).write.mode("overwrite").parquet(lake)
      val (migrated, secs, peak) = measured(c.migrateTable("b", s"m$n", lake))
      require(c.readLatest("b", s"m$n").count() == n.toLong * 64,
        s"migrated table row count mismatch at n=$n")
      (n, migrated, secs, peak)
    }
    mResults.foreach { case (n, migrated, secs, peak) =>
      println(f"[migratebench]  files=$n%5d adopted=$migrated%5d " +
        f"wall=${secs}%6.2fs per-file=${secs * 1000 / n}%6.2fms " +
        f"driverPeak=${peak / 1048576.0}%6.1fMiB")
    }
    val mPerFile = mResults.map { case (n, _, s, _) => s / n }
    println(f"[migratebench]  per-file ratio largest/smallest count = " +
      f"${mPerFile.last / mPerFile.head}%.2f")
  }
}
