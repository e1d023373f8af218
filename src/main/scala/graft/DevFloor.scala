package graft
import org.apache.spark.sql.SparkSession

/** Dev-only sweep-floor profiler (round-10 verdict #5): decomposes the
  * bench's query-shaped s/q into fixed per-query overhead vs operator work.
  *
  * Measures, with the exact session config + noop-sink drain [[Bench]] uses:
  *   1. trivial drain   — `spark.range(N).toDF` through the noop sink: the
  *      irreducible job floor (plan, schedule, 32 tasks, commit protocol);
  *   2. parquet drain   — `Tables.load(region)` (1 KB file): adds file
  *      listing + footer/schema resolution + vectorized-reader setup;
  *   3. construct+plan  — building a representative query's DataFrame and
  *      forcing `executedPlan` WITHOUT running it: Catalyst analysis +
  *      optimization + physical planning + codegen compile cost;
  *   4. the same query drained end-to-end, so (4) − (3) − floor ≈ honest
  *      executor work.
  *
  * Usage: runMain graft.DevFloor <sfDir> <reps>
  */
object DevFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def stats(name: String, ts: Seq[Double]): Unit =
      println(f"$name%-34s min=${ts.min}%.3f med=${ts.sorted.apply(ts.size / 2)}%.3f max=${ts.max}%.3f mean=${ts.sum / ts.size}%.3f")

    // warm everything once
    drain(spark.range(16).toDF("v"))
    drain(Tables.region(spark, sfDir))
    drain(SparkEntry.queries("q3_shipping")(spark, sfDir))
    CacheHygiene.sweep(spark)

    // 1. trivial drain floor — with and without the between-query sweep,
    //    so the sweep's (untimed-in-bench) cost is visible separately
    stats("trivial_drain", (1 to reps).map(_ => time(drain(spark.range(16).toDF("v")))))
    stats("trivial_drain+sweep", (1 to reps).map { _ =>
      val t = time(drain(spark.range(16).toDF("v"))); CacheHygiene.sweep(spark); t
    })

    // 2. parquet scan floor (region = 1 KB, so this is pure resolution)
    stats("parquet_drain_region", (1 to reps).map(_ => time(drain(Tables.region(spark, sfDir)))))

    // 3+4. representative queries: construct+plan vs end-to-end
    val names = Seq("filter_eq_int", "agg_group_order", "q3_shipping",
      "window_topk_per_key", "text_stats", "simhash")
    names.foreach { q =>
      val fn = SparkEntry.queries(q)
      stats(s"$q/plan_only", (1 to reps).map { _ =>
        time { fn(spark, sfDir).queryExecution.executedPlan }
      })
      stats(s"$q/end_to_end", (1 to reps).map(_ => time(drain(fn(spark, sfDir)))))
    }
    spark.stop()
  }
}
