package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only A/B for equality-delete upsert vs copy-on-write MERGE: one
  * `format_version = 2` table of N data files, a small keyed batch
  * written both ways (fresh clone per arm). The upsert arm must commit
  * in time FLAT in N (it appends the batch + one key file and never
  * touches the target's data), while the MERGE arm pays the probe plus
  * a rewrite of every file its touched keys live in — the write-side
  * counterpart of the bloom read A/B. Reports per-arm wall time and the
  * number of pre-existing data files rewritten (dropped from the new
  * snapshot). Usage: runMain graft.DevUpsertBench [nFiles] [rowsPerFile]
  */
object DevUpsertBench {
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

    val wh = java.nio.file.Files.createTempDirectory("graft-upsertbench").toString
    val c = new graft.catalog.SnapshotCatalog(spark, wh)
    c.createSchema("b")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    // interleaved keys: every file's id bounds span the whole range, so
    // the MERGE probe cannot prune — the honest worst case a hash-keyed
    // upsert hits on an unsorted table
    def build(table: String): Unit = {
      c.createTable("b", table, schema, formatVersion = 2)
      (0 until nFiles).foreach { k =>
        val df = (0 until rowsPerFile)
          .map(i => (i.toLong * nFiles + k, k.toLong)).toDF("id", "v")
        c.insert("b", table, df.coalesce(1))
      }
    }
    // the batch: 5 keys scattered across 5 distinct files
    def batch(): org.apache.spark.sql.DataFrame =
      (0 until 5).map(i => ((rowsPerFile / 2).toLong * nFiles + i, -1L))
        .toDF("id", "v")

    def filesOf(table: String): Set[String] =
      c.dataFilePaths("b", table, c.snapshots("b", table).last).toSet

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    build("t_upsert")
    build("t_merge")

    val beforeU = filesOf("t_upsert")
    val tU = time(c.upsert("b", "t_upsert", batch(), Seq("id")))
    val rewrittenU = (beforeU -- filesOf("t_upsert")).size

    val beforeM = filesOf("t_merge")
    val tM = time(c.merge("b", "t_merge", batch(), "id"))
    val rewrittenM = (beforeM -- filesOf("t_merge")).size

    val nU = c.readLatest("b", "t_upsert").count()
    val nM = c.readLatest("b", "t_merge").count()
    require(nU == nM, s"arms disagree: upsert $nU rows vs merge $nM rows")
    val sU = c.readLatest("b", "t_upsert").agg(sum("v")).head.getLong(0)
    val sM = c.readLatest("b", "t_merge").agg(sum("v")).head.getLong(0)
    require(sU == sM, s"arms disagree on content: $sU vs $sM")

    println(f"[upsertbench] nFiles=$nFiles rowsPerFile=$rowsPerFile " +
      f"upsert=${tU}%.2fs rewrote $rewrittenU files; " +
      f"merge=${tM}%.2fs rewrote $rewrittenM files; states identical ($nU rows)")
  }
}
