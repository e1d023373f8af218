package graft.catalog

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Write-side bloom construction for `bloom_filter_columns` tables: one
  * [[ColBloom]] per (new data file, configured column), built by a single
  * column-pruned Spark pass over just-written files and stored in the
  * commit's manifest entries. The read side ([[Manifests.mayMatch]]) then
  * skips whole files on equality predicates that min/max bounds cannot
  * help with — the point-lookup-on-unsorted-key case (Iceberg expresses
  * the same idea as puffin blobs / parquet column blooms; here the filter
  * lives at the MANIFEST tier so planning never opens the file).
  */
object Blooms {

  /** `xxhash64(col)` / `xxhash64(col, 1)` double-hash pair — the write
    * side of the probe contract shared with [[Manifests.bloomHashes]].
    */
  private def hashPair(c: String): Seq[org.apache.spark.sql.Column] =
    Seq(xxhash64(col(c)).as(s"__h1_$c"), xxhash64(col(c), lit(1)).as(s"__h2_$c"))

  /** Per-file blooms for `cols` over the data files under `paths`
    * (all part of one just-written snap dir): returns
    * file-absolute-URI-path → column → bloom. One aggregation job,
    * shuffling [[Manifests.BloomWords]] longs per (file, column) — KBs.
    * Columns missing from the written schema (pre-evolution files) are
    * skipped; null values never enter a bloom (IS NULL probes are a
    * bounds question, not a bloom one).
    */
  def bloomsFor(spark: SparkSession, paths: Seq[String],
                cols: Seq[String], maxRowsPerFile: Long): Map[String, Map[String, ColBloom]] = {
    if (paths.isEmpty) return Map.empty
    val base = spark.read.parquet(paths: _*)
    val present = cols.flatMap(c => base.schema.fields.find(_.name.equalsIgnoreCase(c)))
    if (present.isEmpty) return Map.empty
    val agg = udaf(new BloomAgg(
      (Manifests.bloomBitsFor(maxRowsPerFile) / 64).toInt))
    val df = base
      .select(col("_metadata.file_path").as("__file") +:
        present.flatMap(f => hashPair(f.name)): _*)
    val aggs = present.map(f =>
      agg(col(s"__h1_${f.name}"), col(s"__h2_${f.name}")).as(s"__bloom_${f.name}"))
    df.groupBy(col("__file")).agg(aggs.head, aggs.tail: _*)
      .collect()
      .map { row =>
        val file = row.getString(0)
        val perCol = present.zipWithIndex.flatMap { case (f, i) =>
          Option(row.getAs[Array[Byte]](i + 1)).map { bytes =>
            val bb = java.nio.ByteBuffer.wrap(bytes)
            val bits = Array.fill(bytes.length / 8)(bb.getLong)
            f.name -> ColBloom(f.dataType.sql, bits)
          }
        }.toMap
        file -> perCol
      }.toMap
  }
}

/** Bloom-bit accumulator over the (h1, h2) double-hash pairs of one
  * group's values (xxhash64 maps a null column value to its seed value,
  * so nulls just set one spurious bit pattern — null probes never reach
  * a bloom). Associative merges make it map-side combined: each task
  * ships one 1 KiB buffer per (file, column), never row data.
  */
class BloomAgg(words: Int) extends Aggregator[(Long, Long), Array[Long], Array[Byte]] {
  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(b: Array[Long], in: (Long, Long)): Array[Long] = {
    val m = words.toLong * 64
    val h1 = in._1
    val h2 = in._2
    var i = 0
    while (i < Manifests.BloomHashes) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % m
      b((pos >> 6).toInt) |= 1L << (pos & 63)
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(b.length * 8)
    b.foreach(bb.putLong)
    bb.array()
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Byte]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Byte]]()
}
