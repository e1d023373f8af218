package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only A/B for manifest-driven scan planning: builds a catalog
  * table with many bounds-disjoint files, then times a point-predicate
  * read with the manifest file index ON vs OFF (`graft.manifestRead`
  * session conf). The ON path plans its file list from manifest JSON
  * (no storage listing) and prunes to the single matching file at plan
  * time; the OFF path partition-discovers and scans every footer.
  * Usage: runMain graft.DevScanBench [nCommits] [filesPerCommit]
  */
object DevScanBench {
  def main(args: Array[String]): Unit = {
    val nCommits = args.lift(0).map(_.toInt).getOrElse(16)
    val perCommit = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val wh = java.nio.file.Files.createTempDirectory("graft-scanbench").toString
    val c = new graft.catalog.SnapshotCatalog(spark, wh)
    c.createSchema("b")
    c.createTable("b", "t", org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType))))
    val rowsPerFile = 1000
    (0 until nCommits).foreach { k =>
      val base = k.toLong * perCommit * rowsPerFile
      val hi = base + perCommit.toLong * rowsPerFile
      val df = (base until hi).map(i => (i, i * 2)).toDF("id", "v")
        .repartitionByRange(perCommit, col("id")) // contiguous → disjoint bounds
      c.insert("b", "t", df)
    }
    val nFiles = c.filesMeta("b", "t").filter(col("content") === 0).count()
    val probe = nCommits.toLong * perCommit * rowsPerFile / 2 + 17

    def time(label: String, manifestRead: Boolean): Double = {
      spark.conf.set("graft.manifestRead", manifestRead.toString)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = c.readLatest("b", "t").filter(col("id") === probe).count()
        require(n == 1L, s"probe matched $n rows")
        (System.nanoTime() - t0) / 1e6
      }
      val best = times.min
      println(f"[scanbench] $label%-14s files=$nFiles best-of-3 = $best%.1f ms (${times.map(t => f"$t%.0f").mkString(",")})")
      best
    }
    val off = time("listing path", manifestRead = false)
    val on = time("manifest path", manifestRead = true)
    println(f"[scanbench] speedup ${off / on}%.2fx at $nFiles files")

    // -- plan-time pruning at manifest scale (round-10 verdict #7):
    //    synthetic bloom-carrying entries, direct listFiles timing —
    //    the driver-serial bounds/bloom walk vs the parallel driver walk --
    {
      import org.apache.spark.sql.GraftManifestFileIndex
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
      import org.apache.spark.sql.types.{LongType, StructType}
      val attr = AttributeReference("id", LongType)()
      val allOnes = Array.fill((graft.catalog.Manifests.MinBloomBits / 64).toInt)(-1L)
      val saved = GraftManifestFileIndex.distributedPruneThreshold
      for (n <- Seq(1000, 10000, 100000)) {
        val entries = (0 until n).map { i =>
          graft.catalog.DataFileEntry(s"snap-x/f$i.parquet", 1000L, 1L << 20,
            Map("id" -> graft.catalog.ColBounds("long",
              (i * 1000L).toString, (i * 1000L + 999).toString, 0L)),
            blooms = Map("id" -> graft.catalog.ColBloom("BIGINT", allOnes)))
        }
        val idx = new GraftManifestFileIndex(
          spark.sparkContext.hadoopConfiguration,
          new org.apache.hadoop.fs.Path("/tmp/graft-scanbench-fake"),
          entries, StructType(Nil))
        val filt = Seq(EqualTo(attr, Literal(n * 500L + 17L)))
        def planMs(thr: Int): Double = {
          GraftManifestFileIndex.distributedPruneThreshold = thr
          (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            val r = idx.listFiles(Nil, filt)
            require(r.map(_.files.size).sum == 1, "probe must keep one file")
            (System.nanoTime() - t0) / 1e6
          }.min
        }
        val serial = planMs(Int.MaxValue)
        val dist = planMs(0) // parallel driver walk
        println(f"[scanbench] plan-prune n=$n%-7d serial=$serial%.1f ms  " +
          f"parallel=$dist%.1f ms")

        // worst case: every file's bounds contain the probe, so the
        // bloom probe (two xxhash64 evaluations per entry before the
        // literal-hash memo) runs for EVERY entry
        val overlapping = entries.map(e => e.copy(bounds =
          Map("id" -> graft.catalog.ColBounds("long", "0",
            (n * 1000L).toString, 0L))))
        val idxO = new GraftManifestFileIndex(
          spark.sparkContext.hadoopConfiguration,
          new org.apache.hadoop.fs.Path("/tmp/graft-scanbench-fake"),
          overlapping, StructType(Nil))
        def planOMs(thr: Int): Double = {
          GraftManifestFileIndex.distributedPruneThreshold = thr
          (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            val r = idxO.listFiles(Nil, filt)
            require(r.map(_.files.size).sum == n, "all-ones bloom keeps all")
            (System.nanoTime() - t0) / 1e6
          }.min
        }
        println(f"[scanbench] plan-prune n=$n%-7d bloom-heavy serial=${planOMs(Int.MaxValue)}%.1f ms  " +
          f"parallel=${planOMs(0)}%.1f ms")
      }
      GraftManifestFileIndex.distributedPruneThreshold = saved
    }
    spark.stop()
  }
}
