package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dynamic partition pruning through the manifest file index: a join
  * whose dimension side filters the fact's PARTITION column must prune
  * fact partitions at RUNTIME (Spark re-filters the index's partitions
  * with the materialized subquery result). This is the 1000-executor
  * star-join shape — the fact side of a 100 TB join must never scan
  * partitions the dimension filter excludes.
  */
class DynamicPruningSpec extends SparkSpec {
  import spark.implicits._

  test("a dim filter prunes fact partitions at runtime through the manifest index") {
    val c = new SnapshotCatalog(spark, tmpDir("graft-dpp-wh"))
    c.createSchema("s")
    val schema = StructType(Seq(
      StructField("grp", StringType), StructField("v", LongType)))
    c.createTable("s", "fact", schema, partitionedBy = Seq("grp"))
    val fact = (1 to 600).map(i => (s"g${i % 6}", i.toLong)).toDF("grp", "v")
    c.insert("s", "fact", fact)
    // dim must be FILE-backed: a LocalRelation's filter constant-folds
    // away and DPP requires a surviving selective predicate
    val dimSchema = StructType(Seq(
      StructField("d_grp", StringType), StructField("tag", StringType)))
    c.createTable("s", "dim", dimSchema)
    c.insert("s", "dim",
      Seq(("g1", "keep"), ("g7", "drop")).toDF("d_grp", "tag"))
    val dim = c.readLatest("s", "dim")
      .filter(col("tag") === "keep") // the selective dim predicate DPP keys on

    val prev = spark.conf.getOption("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
      val joined = c.readLatest("s", "fact")
        .join(broadcast(dim), col("grp") === col("d_grp"))
        .agg(sum("v").as("total"))
      val total = joined.collect().head.getLong(0)
      assert(total === (1 to 600).filter(i => i % 6 == 1).map(_.toLong).sum)
      def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allScans(a.executedPlan)
        case st: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allScans(st.plan)
        case f: FileSourceScanExec => Seq(f)
        case other => other.children.flatMap(allScans)
      }
      val factScan = allScans(joined.queryExecution.executedPlan)
        .filter(_.relation.location.isInstanceOf[
          org.apache.spark.sql.GraftManifestFileIndex])
      assert(factScan.nonEmpty, "fact should plan through the manifest index")
      // the scan carries a dynamic pruning expression on the partition col
      val hasDpp = factScan.exists(
        _.partitionFilters.exists(_.exists(
          _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression])))
      assert(hasDpp, "expected a dynamic partition pruning filter on the fact scan")
      // and at runtime it pruned to g1's files only
      val total6 = c.filesMeta("s", "fact").filter(col("content") === 0).count()
      val read = factScan.map(_.metrics("numFiles").value).sum
      assert(read < total6,
        s"DPP should read fewer than all $total6 files, read $read")
    } finally prev match {
      case Some(v) => spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.useStats", v)
      case None => spark.conf.unset(
        "spark.sql.optimizer.dynamicPartitionPruning.useStats")
    }
  }
}
