package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** PlaneSignature must be value-identical to the per-bit
  * `sum(when(dot(v, lit(plane)) >= 0, 1L << b))` spelling it replaced —
  * including null vectors (→ 0), NaN elements (NaN dot sets the bit:
  * Spark's NaN >= 0.0 is true), and short vectors (dot over the common
  * prefix).
  */
class PlaneSignatureSpec extends SparkSpec {

  private def oldSignature(v: org.apache.spark.sql.Column,
                           planes: IndexedSeq[Seq[Double]]) =
    planes.zipWithIndex.map { case (p, b) =>
      when(VectorFunctions.dot(v, typedlit(p)) >= 0.0, lit(1L << b))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  test("differential vs the when-chain on random / special vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val planes: IndexedSeq[Seq[Double]] = IndexedSeq.fill(8)(
      Seq.fill(16)(if (rnd.nextBoolean()) 1.0 else -1.0))
    val arr = planes.map(_.toArray).toArray
    val vectors: Seq[Seq[java.lang.Float]] =
      Seq.fill(100)(Seq.fill(16)(java.lang.Float.valueOf(rnd.nextGaussian().toFloat))) ++
      Seq(
        Seq.fill(16)(java.lang.Float.valueOf(0f)),
        Seq.fill(16)(java.lang.Float.valueOf(Float.NaN)),
        Seq.fill(8)(java.lang.Float.valueOf(1f)), // short vector
        Seq(java.lang.Float.valueOf(Float.NaN)) ++
          Seq.fill(15)(java.lang.Float.valueOf(1f)))
    val df = vectors.toDF("v")
      .union(Seq(Option.empty[Seq[java.lang.Float]]).toDF("v")) // null vec
      .withColumn("nu", VectorFunctions.planeSignature(col("v"), arr))
      .withColumn("old", coalesce(oldSignature(col("v"), planes), lit(0L)))
    df.collect().foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"vector=${r.get(0)}")
    }
  }

  test("null vector signature is 0 under the old spelling too") {
    import spark.implicits._
    val planes: IndexedSeq[Seq[Double]] = IndexedSeq.fill(4)(Seq.fill(4)(1.0))
    val df = Seq(Option.empty[Seq[java.lang.Float]]).toDF("v")
      .withColumn("old", oldSignature(col("v"), planes))
    // the when-chain yields 0 (not null) on a null vector: every branch
    // falls to otherwise(0) — the property PlaneSignature's nullable=false
    // relies on
    assert(df.collect()(0).getLong(1) === 0L)
  }
}
