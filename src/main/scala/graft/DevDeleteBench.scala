package graft

import graft.params.SqlStatement
import org.apache.spark.sql.SparkSession

/** Dev-only cost probe for the metadata delete: builds a lineitem-backed
  * table of N disjoint-orderkey-range copies (each committed separately,
  * 4 files per commit), then times
  *   (a) a retention-shaped DELETE that fully covers one copy's files —
  *       must commit METADATA-ONLY (files leave the manifest; zero data
  *       bytes read or written), and
  *   (b) a half-copy DELETE whose range splits every file of its copy —
  *       the copy-on-write rewrite path, same order of deleted volume.
  * At 100 TB (a) is the difference between dropping a day in
  * milliseconds-per-manifest and rewriting a day of parquet.
  *
  * Usage: runMain graft.DevDeleteBench <sfDir> [copies]
  */
object DevDeleteBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val copies = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions.col

    val wh = java.nio.file.Files.createTempDirectory("graft-delbench").toString
    val e = new GraftEngine(spark, wh)
    e.catalog.createSchema("demo")
    val li = graft.Tables.lineitem(spark, sfDir).select(
      col("l_orderkey"), col("l_quantity").cast("double"), col("l_returnflag"))
    e.catalog.createTable("demo", "li", li.schema)
    val span = 10000000L
    (0 until copies).foreach { k =>
      e.catalog.insert("demo", "li",
        li.withColumn("l_orderkey", col("l_orderkey") + k * span).repartition(4))
    }
    def files(): Set[String] =
      e.query(SqlStatement("""SELECT file_path FROM demo."li$files""""))
        .collect().map(_.getString(0)).toSet
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime(); val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    val before = files()
    val total = e.query(SqlStatement("SELECT count(*) AS n FROM demo.li"))
      .collect()(0).getLong(0)

    // (a) full-coverage retention delete: the LAST copy's whole range
    val (tMeta, nMeta) = time(e.executeNonQuery(SqlStatement(
      s"DELETE FROM demo.li WHERE l_orderkey >= ${(copies - 1) * span}")))
    val afterMeta = files()
    require((afterMeta -- before).isEmpty,
      s"retention delete wrote files: ${afterMeta -- before}")

    // (b) half-coverage delete: splits every file of the next copy (sf0.1
    // orderkeys span 0..150k, so halve THAT range, not the copy stride)
    val lo = (copies - 2) * span + 75000L
    val (tCow, nCow) = time(e.executeNonQuery(SqlStatement(
      s"DELETE FROM demo.li WHERE l_orderkey >= $lo AND l_orderkey < ${(copies - 1) * span}")))
    val afterCow = files()

    println(f"[delbench] table=$total%d rows, ${before.size}%d files, copies=$copies%d")
    println(f"[delbench] metadata delete: $nMeta%d rows, ${(before -- afterMeta).size}%d files dropped, 0 written — $tMeta%.2f s")
    println(f"[delbench] CoW delete:      $nCow%d rows, ${(afterCow -- afterMeta).size}%d files rewritten — $tCow%.2f s")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
  }
}
