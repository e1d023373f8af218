package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Dev-only scale measurement for the Iceberg-format registration path:
  *
  * 1. REGISTER COST vs tree shape — fabricates realistic trees where
  *    each snapshot adds ONE new manifest and its manifest list CARRIES
  *    every earlier manifest forward (Iceberg's own layout: a table
  *    with S snapshots shares manifests, it does not rewrite them), so
  *    the per-call decode memo in convertIcebergSnapshots is what's
  *    being measured: cost should grow ~linearly in DISTINCT manifests
  *    (S) even though the naive walk is S×M (quadratic). Data files are
  *    phantom paths (registration reads manifests + ≤8 sampled footers,
  *    never data), except the sampled corners which are real.
  *
  * 2. EQ-DELETE IMPORT at CDC scale — one snapshot carrying a 10⁶-key
  *    equality-delete file: the key rewrite must be ONE distributed
  *    Spark job (never a driver collect), and a second refresh
  *    re-listing the same carried file must reuse the SHA-named dir
  *    (~zero marginal cost).
  *
  * Usage: runMain graft.DevIcebergBench [filesPerSnap] [snapCounts…]
  */
object DevIcebergBench {
  def main(args: Array[String]): Unit = {
    val perSnap = args.lift(0).map(_.toInt).getOrElse(64)
    val snapCounts = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(4, 16, 64)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    import graft.catalog.IcebergFixture._

    def mkTree(loc: Path, snaps: Int, withEq: Boolean): Unit = {
      val mdir = new Path(loc, "metadata")
      val fields = Seq((1, "id", "long"), (2, "name", "string"))
      // REAL parquet only at the four footer-sampled corners (first/last
      // entry of the first/last snapshot's manifests); every other entry
      // is a phantom path — registration reads manifests, not data
      val corners = Set(1, perSnap, (snaps - 1) * perSnap + 1, snaps * perSnap)
      val tiny = withFieldIds(
        Seq((1L, "a")).toDF("id", "name"), Map("id" -> 1, "name" -> 2))
      var realLen = 0L
      var mans = Seq.empty[(Path, Long, Int, Long)]
      var fileNo = 0
      val withLists = (1 to snaps).map { i =>
        val seq = i.toLong
        val newFiles = (0 until perSnap).map { _ =>
          fileNo += 1
          val p = new Path(loc, f"data/f$fileNo%06d.parquet")
          if (corners(fileNo)) realLen = writeOneParquet(conf, tiny, p)
          FileRef(p.toUri.toString, 1L, realLen max 1L,
            Map(1 -> (encodeLong(fileNo.toLong), encodeLong(fileNo.toLong), 0L)))
        }
        val (mp, mlen) = writeManifest(conf, mdir, 9000L + i, newFiles)
        mans = mans :+ ((mp, mlen, 0, seq))
        val eqMans =
          if (!withEq || i != snaps) Nil
          else {
            // the CDC arm: one 10⁶-key equality-delete file on the tip
            val e = new Path(loc, "data/eqdel.parquet")
            val elen = writeOneParquet(conf, withFieldIds(
              spark.range(1000000L).select($"id"), Map("id" -> 1)), e)
            val (ep, eplen) = writeManifest(conf, mdir, 9000L + i,
              Seq(FileRef(e.toUri.toString, 1000000L, elen, Map.empty,
                eqIds = Seq(1))), content = 2)
            Seq((ep, eplen, 1, seq))
          }
        val snap = SnapRef(9000L + i, 1700000000000L + i * 1000L, Nil,
          seq = Some(seq))
        (snap, writeManifestListSeq(conf, mdir, snap.id, mans ++ eqMans))
      }
      val json = metadataJson(2, loc.toUri.toString, fields, withLists,
        withLists.last._1.id)
      val mp = new Path(mdir, "v1.metadata.json")
      val fs = mp.getFileSystem(conf)
      val out = fs.create(mp, true); out.write(json.getBytes("UTF-8")); out.close()
      val hint = fs.create(new Path(mdir, "version-hint.text"), true)
      hint.write("1".getBytes("UTF-8")); hint.close()
    }

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- arm 1: register cost vs snapshot count (shared manifests) ----
    snapCounts.foreach { s =>
      val loc = new Path(java.nio.file.Files
        .createTempDirectory(f"graft-icebench-$s%03d").toString)
      val wh = java.nio.file.Files.createTempDirectory("graft-icebench-wh").toString
      mkTree(loc, s, withEq = false)
      val e = new GraftEngine(spark, wh)
      e.catalog.createSchema("lake")
      val (_, t) = timed(e.executeNonQuery(graft.params.SqlStatement(
        s"CALL system.register_iceberg_table('lake', 't', '${loc.toUri}')")))
      val n = e.query(graft.params.SqlStatement(
        "SELECT count(*) FROM lake.\"t$files\"")).collect()(0).getLong(0)
      println(f"[icebench] snapshots=$s%3d files=${s * perSnap}%6d " +
        f"register=$t%6.2f s  (s/snapshot=${t / s}%5.3f, files entries=$n)")
      CacheHygiene.sweep(spark)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(loc.toString))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    }

    // ---- arm 2: 10⁶-key equality-delete import + carried-refresh reuse ----
    {
      val loc = new Path(java.nio.file.Files
        .createTempDirectory("graft-icebench-eq").toString)
      val wh = java.nio.file.Files.createTempDirectory("graft-icebench-eqwh").toString
      mkTree(loc, 4, withEq = true)
      val e = new GraftEngine(spark, wh)
      e.catalog.createSchema("lake")
      val rt = Runtime.getRuntime
      def heapMb(): Long = { System.gc(); (rt.totalMemory - rt.freeMemory) >> 20 }
      val h0 = heapMb()
      val (_, t1) = timed(e.executeNonQuery(graft.params.SqlStatement(
        s"CALL system.register_iceberg_table('lake', 'cdc', '${loc.toUri}')")))
      val h1 = heapMb()
      // foreign writer appends one more snapshot CARRYING the delete:
      // the refresh must reuse the SHA-named dir, not rewrite 10⁶ keys
      mkTree(loc, 5, withEq = true) // rebuilds incl. snapshot 9005 tip
      val (synced, t2) = timed(e.executeNonQuery(graft.params.SqlStatement(
        "CALL system.refresh_iceberg_table('lake', 'cdc')")))
      val eqDirs = e.catalog.snapshots("lake", "cdc")
        .flatMap(_.eqDeletes.map(_.path)).distinct
      println(f"[icebench] eq-import 1e6 keys: register=$t1%6.2f s " +
        f"(driver-heap +${h1 - h0}%d MB), refresh(carried)=$t2%6.2f s " +
        f"synced=$synced distinctEqDirs=${eqDirs.size}")
      require(eqDirs.size == 1,
        "carried 1e6-key delete must reuse ONE deterministic dir")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(loc.toString))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    }
    // ---- arm 3: incremental re-export (sync-out) — O(new), not O(S×F) ----
    {
      import org.apache.spark.sql.functions.{concat, lit, col}
      val wh = java.nio.file.Files.createTempDirectory("graft-icebench-xwh").toString
      val e = new GraftEngine(spark, wh)
      e.catalog.createSchema("src")
      e.executeNonQuery(graft.params.SqlStatement(
        "CREATE TABLE src.t (id bigint, v varchar)"))
      val snaps = 16
      (0 until snaps).foreach { i =>
        e.catalog.insert("src", "t",
          spark.range(i * 100L, i * 100L + 100L)
            .select(col("id"), concat(lit("v"), col("id")).as("v"))
            .repartition(8))
      }
      val loc = new Path(java.nio.file.Files
        .createTempDirectory("graft-icebench-exp").toString, "tree")
      val (n1, tFull) = timed(e.executeNonQuery(graft.params.SqlStatement(
        s"CALL system.export_iceberg_table('src', 't', '${loc.toUri}')")))
      e.catalog.insert("src", "t",
        spark.range(9000L, 9100L)
          .select(col("id"), concat(lit("v"), col("id")).as("v"))
          .repartition(8))
      val (n2, tInc) = timed(e.executeNonQuery(graft.params.SqlStatement(
        s"CALL system.export_iceberg_table('src', 't', '${loc.toUri}')")))
      println(f"[icebench] export full=$tFull%6.2f s ($n1 snapshots), " +
        f"incremental(+1 commit)=$tInc%6.2f s ($n2 exported)")
      CacheHygiene.sweep(spark)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(loc.getParent.toString))
    }
    println("[icebench] done")
  }
}
