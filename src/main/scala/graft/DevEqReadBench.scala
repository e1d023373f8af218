package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe for the eq-delete read rent (round-10 task 1): phase
  * timings inside upsert_demo, plus readLatest wall time at 0/1/2/5
  * pending equality deletes. Usage: runMain graft.DevEqReadBench <sfDir>
  */
object DevEqReadBench {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val wh = "/tmp/graft_dev_eqread_wh"
    val whPath = new org.apache.hadoop.fs.Path(wh)
    val whFs = whPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (whFs.exists(whPath)) whFs.delete(whPath, true)
    val engine = new GraftEngine(spark, wh)
    val c = engine.catalog
    c.createSchema("demo")
    val nation = graft.Tables.nation(spark, d)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))

    println("== upsert_demo phases ==")
    t("create+insert") {
      c.createTable("demo", "nat_up", nation.schema, formatVersion = 2)
      c.insert("demo", "nat_up", nation)
    }
    t("upsert batch 1") {
      c.upsert("demo", "nat_up",
        nation.filter(col("n_regionkey") === 2)
          .select(col("n_nationkey"), concat(col("n_name"), lit("_u1")).as("n_name"),
            col("n_regionkey")),
        Seq("n_nationkey"))
    }
    t("upsert batch 2") {
      val b2 = nation.filter(col("n_nationkey") % 5 === 0)
        .select(col("n_nationkey"), concat(col("n_name"), lit("_u2")).as("n_name"),
          (col("n_regionkey") + 10).as("n_regionkey"))
        .unionByName(nation.filter(col("n_nationkey") < 3)
          .select((col("n_nationkey") + 100).as("n_nationkey"),
            concat(col("n_name"), lit("_new")).as("n_name"), col("n_regionkey")))
      c.upsert("demo", "nat_up", b2, Seq("n_nationkey"))
    }
    t("filesMeta count") {
      c.filesMeta("demo", "nat_up").filter(col("content") === 2).count()
    }
    t("read @2 pending (collect)") {
      c.readLatest("demo", "nat_up").orderBy("n_nationkey", "n_name").collect()
    }
    t("read @2 pending again") {
      c.readLatest("demo", "nat_up").orderBy("n_nationkey", "n_name").collect()
    }
    t("compact") { c.compact("demo", "nat_up") }
    t("read @0 pending (collect)") {
      c.readLatest("demo", "nat_up").orderBy("n_nationkey", "n_name").collect()
    }
    t("final engine.query") {
      engine.query(graft.params.SqlStatement(
        "SELECT count(*) AS n FROM demo.nat_up")).collect()
    }

    println("== readLatest at N pending deletes ==")
    c.createTable("demo", "nat_n", nation.schema, formatVersion = 2)
    c.insert("demo", "nat_n", nation)
    var pending = 0
    for (n <- Seq(0, 1, 2, 5)) {
      while (pending < n) {
        c.upsert("demo", "nat_n",
          nation.filter(col("n_nationkey") % 7 === pending % 7)
            .select(col("n_nationkey"),
              concat(col("n_name"), lit(s"_p$pending")).as("n_name"),
              col("n_regionkey")),
          Seq("n_nationkey"))
        pending += 1
      }
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        c.readLatest("demo", "nat_n").count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"  pending=$n%-2d  ${times.map(x => f"$x%.2f").mkString(" ")}  min=${times.min}%.2f")
    }

    // -- CDC-scale arm: a ~10⁶-key delete file must take the DISTRIBUTED
    //    read path (never a driver collect) and leave driver heap flat --
    println("== 1e6-key eq-delete file: distributed path, flat driver heap ==")
    def usedHeapMb(): Long = {
      val rt = Runtime.getRuntime
      System.gc(); Thread.sleep(200); System.gc()
      (rt.totalMemory() - rt.freeMemory()) >> 20
    }
    val rows = 2_400_000L
    val base = spark.range(rows).select(col("id"),
      concat(lit("payload_"), col("id")).as("v"))
    c.createTable("demo", "cdc", base.schema, formatVersion = 2)
    t("insert 2.4M rows") { c.insert("demo", "cdc", base) }
    val batch = spark.range(0L, rows, 2L).select(col("id"),
      concat(lit("upd_"), col("id")).as("v")) // 1.2M keys: past the gate
    val h0 = usedHeapMb()
    t("upsert 1.2M-key batch") { c.upsert("demo", "cdc", batch, Seq("id")) }
    val h1 = usedHeapMb()
    t("read @1.2M-key pending (cold)") {
      // first read scans the delete-key parquet AND persists it on the
      // executors (eqDelBigLru) — the warm arm below is the payoff
      val n = c.readLatest("demo", "cdc").count()
      require(n == rows, s"expected $rows rows, got $n")
    }
    val warm = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      c.readLatest("demo", "cdc").count()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"  warm reads (persisted key frame)   " +
      f"${warm.map(x => f"$x%.2f").mkString(" ")}  min=${warm.min}%.2f s")
    val h2 = usedHeapMb()
    // steady-state check: three MORE reads must not grow the heap — any
    // h2→h3 growth would mean per-read retention (the old collect-and-
    // cache path grew by ~200 MB per distinct delete file)
    (1 to 3).foreach(_ => c.readLatest("demo", "cdc").count())
    val h3 = usedHeapMb()
    val plan = c.readLatest("demo", "cdc").queryExecution.optimizedPlan.toString
    val collected = plan.linesIterator.exists(l =>
      l.contains("LocalRelation") && l.contains("__graft_eq_"))
    println(f"  driver heap MB: before=$h0 after-upsert=$h1 after-reads=$h2 " +
      f"steady=$h3 per-read-growth=${(h3 - h2) / 3} keysCollected=$collected")
    require(!collected, "1.2e6-key delete file was materialized on the driver")
    spark.stop()
  }
}
