package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `sorted_by` write clustering (Trino Iceberg's sorted tables,
  * trino.io/docs/current/connector/iceberg.html#sorted-tables): inserts
  * are range-repartitioned + sorted on the declared keys, so each written
  * file covers a DISJOINT sort-key range and parquet footer min/max stats
  * become selective — range predicates skip whole files in the CoW DML
  * probe and whole row groups in any read. The 100 TB story: clustering
  * is decided once at write time, and every later read/DML pays for only
  * the slice it touches.
  */
class SortedWriteSpec extends SparkSpec {
  import spark.implicits._

  private def freshCatalog(): SnapshotCatalog = {
    val c = new SnapshotCatalog(spark, tmpDir("graft-sort-wh"))
    c.createSchema("s")
    c
  }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("grp", StringType),
    StructField("v", LongType)))

  /** Rows in RANDOM order (seeded), so any observed clustering is the
    * writer's doing, not the input's.
    */
  private def rows(n: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(42)
    rnd.shuffle((1 to n).toList)
      .map(i => (i.toLong, if (i % 2 == 0) "a" else "b", i.toLong * 3))
      .toDF("id", "grp", "v")
  }

  /** Run `body` with the range shuffle forced to split small data into
    * multiple files (tiny AQE advisory size), restoring the session conf
    * after.
    */
  private def withTinyPartitions[T](body: => T): T = {
    val keys = Seq(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(spark.conf.set(_, "4KB"))
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def fileRanges(c: SnapshotCatalog, table: String): Seq[(String, Long, Long)] =
    c.filesMeta("s", table).filter($"content" === 0)
      .select("file_path").as[String].collect().toSeq.map { p =>
      val r = spark.read.parquet(p).agg(min("id"), max("id")).head()
      (p, r.getLong(0), r.getLong(1))
    }

  test("sorted insert writes files with disjoint sort-key ranges") {
    val c = freshCatalog()
    c.createTable("s", "t_sorted", schema, sortedBy = Seq("id"))
    withTinyPartitions { c.insert("s", "t_sorted", rows(4000)) }
    val ranges = fileRanges(c, "t_sorted")
    assert(ranges.size >= 3, s"need a multi-file snapshot, got ${ranges.size}")
    val sorted = ranges.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Seq((_, _, hi1), (_, lo2, _)) =>
        assert(hi1 < lo2, s"file ranges must be disjoint: $sorted")
      case _ =>
    }
    // data round-trips completely
    assert(c.readLatest("s", "t_sorted").count() == 4000)
  }

  test("range DELETE on a sorted table rewrites only the overlapping file") {
    val c = freshCatalog()
    c.createTable("s", "t_del", schema, sortedBy = Seq("id"))
    withTinyPartitions { c.insert("s", "t_del", rows(4000)) }
    val ranges = fileRanges(c, "t_del")
    assert(ranges.size >= 3)
    // a range predicate inside ONE file's key span
    val (_, lo, hi) = ranges.sortBy(_._2).head
    val a = lo + (hi - lo) / 3
    val b = lo + 2 * (hi - lo) / 3
    val beforeFiles = ranges.map(_._1).toSet
    val (_, n) = c.deleteCounted("s", "t_del", col("id").between(a, b))
    assert(n == b - a + 1)
    val afterFiles = c.filesMeta("s", "t_del").filter($"content" === 0)
      .select("file_path").as[String].collect().toSet
    assert(beforeFiles.diff(afterFiles).size == 1,
      s"sorted layout: only the file overlapping [$a,$b] may be rewritten, " +
        s"rewrote ${beforeFiles.diff(afterFiles)}")
    assert(c.readLatest("s", "t_del").count() == 4000 - n)

    // control: same data in an UNSORTED table scatters the range across
    // every file — the same DELETE rewrites them all
    val c2 = freshCatalog()
    c2.createTable("s", "t_ctrl", schema)
    withTinyPartitions {
      c2.insert("s", "t_ctrl", rows(4000).repartition(4))
    }
    val ctrlBefore = c2.filesMeta("s", "t_ctrl").filter($"content" === 0)
      .select("file_path").as[String].collect().toSet
    assert(ctrlBefore.size >= 3)
    c2.deleteCounted("s", "t_ctrl", col("id").between(a, b))
    val ctrlAfter = c2.filesMeta("s", "t_ctrl").filter($"content" === 0)
      .select("file_path").as[String].collect().toSet
    assert(ctrlBefore.diff(ctrlAfter).size > 1,
      "round-robin layout must scatter the range over several files " +
        "(otherwise the sorted assertion above proves nothing)")
  }

  test("sorted + partitioned: per-partition disjoint ranges, hive layout intact") {
    val c = freshCatalog()
    c.createTable("s", "t_ps", schema,
      partitionedBy = Seq("grp"), sortedBy = Seq("id"))
    withTinyPartitions { c.insert("s", "t_ps", rows(4000)) }
    val perGrp = c.filesMeta("s", "t_ps").filter($"content" === 0)
      .select("file_path").as[String].collect().toSeq
      .groupBy(p => if (p.contains("grp=a")) "a" else "b")
    perGrp.foreach { case (_, files) =>
      val ranges = files.map { p =>
        val r = spark.read.parquet(p).agg(min("id"), max("id")).head()
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
      ranges.sliding(2).foreach {
        case Seq((_, hi1), (lo2, _)) =>
          assert(hi1 < lo2, s"per-partition ranges must be disjoint: $ranges")
        case _ =>
      }
    }
    assert(c.readLatest("s", "t_ps").filter($"grp" === "a").count() == 2000)
  }

  test("compact preserves sort order and honors the target file count") {
    val c = freshCatalog()
    c.createTable("s", "t_cmp", schema, sortedBy = Seq("id"))
    withTinyPartitions {
      c.insert("s", "t_cmp", rows(2000))
      c.insert("s", "t_cmp", rows(2000).withColumn("id", $"id" + 2000L))
    }
    c.compact("s", "t_cmp", numFiles = 2)
    val ranges = fileRanges(c, "t_cmp")
    assert(ranges.size == 2, s"expected 2 compacted files, got ${ranges.size}")
    val sorted = ranges.sortBy(_._2)
    assert(sorted(0)._3 < sorted(1)._2, "compacted files must stay disjoint")
    assert(c.readLatest("s", "t_cmp").count() == 4000)
  }

  test("SQL surface: sorted_by property parses, applies, and round-trips SHOW CREATE") {
    val eng = new graft.GraftEngine(spark, tmpDir("graft-sort-sql"))
    eng.executeNonQuery(graft.params.SqlStatement(
      "CREATE TABLE s2.ev (id bigint, v bigint) " +
        "WITH (sorted_by = ARRAY['id DESC'], format_version = 2)"))
    eng.executeNonQuery(graft.params.SqlStatement(
      "INSERT INTO s2.ev VALUES (3, 30), (1, 10), (2, 20)"))
    assert(eng.catalog.sortSpec("s2", "ev") == Seq("id DESC"))
    val ddl = eng.query(graft.params.SqlStatement("SHOW CREATE TABLE s2.ev"))
      .collect().head.getString(0)
    assert(ddl.contains("sorted_by = ARRAY['id DESC']"), ddl)
    assert(ddl.contains("format_version = 2"), ddl)
    // DESC order materialized inside the written file
    val file = eng.catalog.filesMeta("s2", "ev").filter($"content" === 0)
      .select("file_path").as[String].head()
    val vals = spark.read.parquet(file).select("id").as[Long].collect().toSeq
    assert(vals == Seq(3L, 2L, 1L), s"rows must be stored DESC-sorted: $vals")
    // unknown sort column rejected loudly
    intercept[Exception] {
      eng.executeNonQuery(graft.params.SqlStatement(
        "CREATE TABLE s2.bad (id bigint) WITH (sorted_by = ARRAY['nope'])"))
    }
  }
}
