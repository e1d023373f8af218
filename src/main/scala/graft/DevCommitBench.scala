package graft

import org.apache.spark.sql.SparkSession

/** Dev-only commit-path micro-bench: times the phases of a small INSERT
  * (the multi-commit demos' dominant op) — raw parquet write of the same
  * frame vs the full engine insert — so commit overhead (manifests,
  * commit log, listings) is separable from Spark's write job itself.
  * Usage: runMain graft.DevCommitBench [reps]
  */
object DevCommitBench {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 12
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    var b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B knobs for the write path (dev-only experiment surface)
    if (sys.env.contains("GRAFT_BENCH_RAWFS"))
      b = b.config("spark.hadoop.fs.file.impl",
        "org.apache.hadoop.fs.RawLocalFileSystem")
    if (sys.env.contains("GRAFT_BENCH_COMMIT_V2"))
      b = b.config(
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    val spark = LocalDirs.configure(b).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val wh = "/tmp/graft-commit-bench-wh"
    val p = new org.apache.hadoop.fs.Path(wh)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    val cat = new catalog.SnapshotCatalog(spark, wh)
    cat.createSchema("s")
    val df = (0L until 25L).map(i => (i, s"name$i", i % 5)).toDF("k", "nm", "g")
    cat.createTable("s", "t", df.schema)
    // warmup
    cat.insert("s", "t", df)
    df.write.mode("overwrite").parquet(s"$wh/raw")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val noops = (1 to reps).map { _ =>
      time(df.write.mode("overwrite").format("noop").save())
    }
    val raws = (1 to reps).map { i =>
      time(df.write.mode("overwrite").parquet(s"$wh/raw$i"))
    }
    val inserts = (1 to reps).map { _ => time(cat.insert("s", "t", df)) }
    def stats(xs: Seq[Double]): String =
      f"min=${xs.min}%.3f med=${xs.sorted.apply(xs.size / 2)}%.3f max=${xs.max}%.3f"
    println(s"noop write:        ${stats(noops)}")
    println(s"raw parquet write: ${stats(raws)}")
    println(s"engine insert:     ${stats(inserts)}")
    spark.stop()
  }
}
