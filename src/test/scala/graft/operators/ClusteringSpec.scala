package graft.operators

import graft.SparkSpec

/** Spherical k-means cluster-mix: planted separable geometry must
  * recover its clusters, and the report must be a total, deterministic
  * partition of the corpus.
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  private def axisVec(axis: Int, mag: Float): Array[Float] = {
    val a = Array.fill(dim)(0.0f); a(axis) = mag; a
  }

  test("clusterMix recovers two planted separable clusters with full membership") {
    // seeds 0..3 live on axis 0 with strictly decreasing magnitude (so
    // dot-product argmax is unambiguous), seeds 4..7 on axis 1; members
    // 8..11 are axis-0 points (label 0), 12..15 axis-1 (label 1). The
    // fit sample {0,5,10,15} pulls centroids onto the two axes, and the
    // full assignment must split the corpus exactly by axis.
    val rows =
      (0 until 4).map(k => (k.toLong, axisVec(0, 1.0f - 0.01f * k), 0)) ++
      (4 until 8).map(k => (k.toLong, axisVec(1, 1.0f - 0.01f * (k - 4)), 1)) ++
      (8 until 12).map(i => (i.toLong, axisVec(0, 0.9f), 0)) ++
      (12 until 16).map(i => (i.toLong, axisVec(1, 0.9f), 1))
    val dir = tmpDir("planted-emb")
    rows.toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val got = Clustering.clusterMix(spark, dir)
      .as[(Long, Int, Long)].collect().toSeq.sorted
    // fit members 0,10 → seed 0 (axis 0); 5,15 → seed 4 (axis 1: seed 4
    // has the largest axis-1 magnitude, so even seed-point 5 prefers it)
    assert(got == Seq((0L, 0, 8L), (4L, 1, 8L)),
      s"expected the two planted axes as clusters 0 and 4, got $got")
  }

  test("clusterMix partitions the corpus totally and deterministically") {
    val a = Clustering.clusterMix(spark, sf001)
      .as[(Long, Int, Long)].collect().toSeq
    val b = Clustering.clusterMix(spark, sf001)
      .as[(Long, Int, Long)].collect().toSeq
    assert(a == b, "same corpus, same clustering — the op must be deterministic")
    val total = spark.read.parquet(s"$sf001/embeddings.parquet").count()
    assert(a.map(_._3).sum == total, "every vector lands in exactly one cluster")
    assert(a.forall(r => r._1 >= 0 && r._1 < 8), "cluster ids come from the 8 seeds")
  }
}
