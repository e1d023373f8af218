package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet corpus (TESTDATA.md).
  *
  * Mirrors the reference's catalog→schema→table namespace (reference
  * src/AthenaTrinoClient/AthenaClient.cs:37-45) in the degenerate form the
  * harness needs: a scale-factor directory is the "schema", one parquet file
  * per table. The full namespace/DDL layer lives in [[graft.catalog]].
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Plain scan (S1). Column pruning + predicate pushdown reach the parquet
    * reader via Catalyst — callers should select/filter on the result and
    * let the optimizer prune the scan.
    *
    * Deliberately NOT memoized: a path-keyed DataFrame cache pins the
    * file listing, so data regenerated at the same path (the
    * fitQuantizer-refit scenario PipelineOpsSpec exercises) would read
    * stale/deleted files. With one parquet file per table the
    * re-resolution cost is milliseconds — caching buys nothing and
    * introduces a staleness class.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * reader rejects unless `spark.sql.legacy.parquet.nanosAsLong=true` (set
    * in Verify/Bench/test sessions). With that flag the column arrives as
    * nanos-since-epoch LongType; normalize to TimestampType via integer
    * division (`div`, not `/` — Divide is double and loses precision above
    * 2^53 ns).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
