package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only A/B for manifest-tier bloom file skipping: two identical
  * tables of INTERLEAVED-key files (every file's min/max spans the whole
  * key range, so bounds pruning is structurally useless) — one with
  * `bloom_filter_columns`, one without — then a point-predicate read on
  * each. The bloom table must read ~1 file where the plain table reads
  * all of them; the timing gap is the local-FS lower bound of the win
  * (every skipped file is an object-store GET at deployment scale).
  * Usage: runMain graft.DevBloomBench [nFiles] [rowsPerFile]
  */
object DevBloomBench {
  def main(args: Array[String]): Unit = {
    val nFiles = args.lift(0).map(_.toInt).getOrElse(64)
    val rowsPerFile = args.lift(1).map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val wh = java.nio.file.Files.createTempDirectory("graft-bloombench").toString
    val c = new graft.catalog.SnapshotCatalog(spark, wh)
    c.createSchema("b")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    def build(table: String, blooms: Seq[String]): Unit = {
      c.createTable("b", table, schema, bloomFilterColumns = blooms)
      // file k holds ids ≡ k (mod nFiles): bounds [k, (rows-1)*n+k] all overlap
      (0 until nFiles).foreach { k =>
        val df = (0 until rowsPerFile)
          .map(i => (i.toLong * nFiles + k, k.toLong)).toDF("id", "v")
        c.insert("b", table, df.coalesce(1))
      }
    }
    build("t_plain", Nil)
    build("t_bloom", Seq("id"))
    val probe = (rowsPerFile / 2).toLong * nFiles + (nFiles / 2) // present, one file

    def run(table: String): (Double, Long) = {
      var files = -1L
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val q = c.readLatest("b", table).filter(col("id") === probe)
        val n = q.collect().length // executes q's own plan → its metrics fill
        require(n == 1, s"probe matched $n rows")
        files = q.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.metrics("numFiles").value
        }.sum
        (System.nanoTime() - t0) / 1e6
      }
      (times.min, files)
    }
    val (tPlain, fPlain) = run("t_plain")
    val (tBloom, fBloom) = run("t_bloom")
    println(f"[bloombench] plain  files_read=$fPlain%3d of $nFiles best-of-3 = $tPlain%.1f ms")
    println(f"[bloombench] bloom  files_read=$fBloom%3d of $nFiles best-of-3 = $tBloom%.1f ms")
    println(f"[bloombench] speedup ${tPlain / tBloom}%.2fx, files ${fPlain}→${fBloom}")
    spark.stop()
  }
}
