package graft.streaming

import graft.SparkSpec
import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** The text-preprocessing operators are pure per-row expression plans, so
  * the SAME DataFrame cores that the batch registry runs must work
  * unmodified as stages of a continuous-ingest stream — the batch/stream
  * unification Structured Streaming promises. These specs drive each core
  * over a file-source stream of the documents table and assert set
  * equality with the batch result.
  */
class StreamingPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  private lazy val docsBatch = graft.Tables.documents(spark, sf001)

  private lazy val streamDir: String = {
    val dir = tmpDir("docs-stream")
    docsBatch.select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      .coalesce(2).write.mode("overwrite").parquet(s"$dir/in")
    s"$dir/in"
  }

  private def runStream(stage: DataFrame => DataFrame, name: String): DataFrame = {
    val src = spark.readStream.schema(docSchema).parquet(streamDir)
    val q = stage(src).writeStream.outputMode("append")
      .format("memory").queryName(name)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    spark.table(name)
  }

  test("normalizeTextOf runs unmodified on a stream and matches batch") {
    val streamed = runStream(TextAnalysis.normalizeTextOf, "norm_stream")
      .as[(Long, String, Boolean)].collect().toSet
    val batch = TextAnalysis.normalizeTextOf(docsBatch)
      .as[(Long, String, Boolean)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("chunkDocsOf runs unmodified on a stream and matches batch") {
    val streamed = runStream(TextAnalysis.chunkDocsOf(_), "chunk_stream")
      .as[(Long, Long, Int, String)].collect().toSet
    val batch = TextAnalysis.chunkDocsOf(docsBatch)
      .as[(Long, Long, Int, String)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("textStatsOf runs unmodified on a stream and matches batch") {
    val streamed = runStream(TextAnalysis.textStatsOf, "stats_stream")
      .as[(Long, Int, Int, Int)].collect().toSet
    val batch = TextAnalysis.textStatsOf(docsBatch)
      .as[(Long, Int, Int, Int)].collect().toSet
    assert(streamed == batch && streamed.nonEmpty)
  }
}
