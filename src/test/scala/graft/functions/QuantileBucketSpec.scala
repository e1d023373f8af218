package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** QuantileBucket must be value-identical to the 63-when fold chain it
  * replaced on the z-order write path — including the semantic corners:
  * null → 0, NaN ≥ everything (counts every cut), -0.0 == 0.0, and a
  * cut array holding BOTH zeros (bitwise-distinct survivors) counting
  * both.
  */
class QuantileBucketSpec extends SparkSpec {

  private def oldChain(p: org.apache.spark.sql.Column, cuts: Array[Double]) =
    cuts.foldLeft(lit(0)) { (acc, cut) =>
      acc + when(p >= lit(cut), 1).otherwise(0)
    }

  private def compareOn(values: Seq[java.lang.Double], cuts: Array[Double]): Unit = {
    import spark.implicits._
    val df = values.toDF("v")
    val rows = df
      .withColumn("nu", QuantileBucket.bucket(col("v"), cuts))
      .withColumn("old", oldChain(col("v"), cuts))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) === r.getInt(2),
        s"value=${r.get(0)} new=${r.getInt(1)} old=${r.getInt(2)} cuts=${cuts.mkString(",")}")
    }
  }

  test("differential vs the when-chain: specials and random grids") {
    val specials: Seq[java.lang.Double] = Seq(
      null, Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      -0.0d, 0.0d, 1e-300, -1e-300, 42.0, -42.0, Double.MaxValue, Double.MinValue)
      .map(v => if (v == null) null else java.lang.Double.valueOf(v.asInstanceOf[Double]))
    val cutSets = Seq(
      Array(-0.0d, 0.0d).distinct.sorted, // bitwise-distinct double zero
      Array(0.0d),
      Array(-10.0, -1.0, 0.0, 1.0, 10.0),
      (1 to 63).map(_.toDouble).toArray,
      Array(Double.NegativeInfinity, -1.0, 1.0, Double.PositiveInfinity))
    cutSets.foreach(cuts => compareOn(specials, cuts))

    val rnd = new scala.util.Random(7)
    val randomVals: Seq[java.lang.Double] =
      Seq.fill(200)(java.lang.Double.valueOf(rnd.nextGaussian() * 100))
    val randomCuts = Seq.fill(63)(rnd.nextGaussian() * 100).distinct.sorted.toArray
    compareOn(randomVals, randomCuts)
  }

  test("z-ordered write round-trips identically through the new bucket expr") {
    // end-to-end: a z-ordered table's rows and file bounds still read back
    val wh = tmpDir("qbz")
    val cat = new graft.catalog.SnapshotCatalog(spark, wh)
    cat.createSchema("s")
    import spark.implicits._
    val df = (1L to 4096L).map(i => (i, (i * 7919) % 4096)).toDF("a", "b")
    cat.createTable("s", "t", df.schema, sortedBy = Seq("zorder(a, b)"))
    cat.insert("s", "t", df)
    val back = cat.readLatest("s", "t")
    assert(back.count() === 4096L)
    assert(back.agg(sum("a"), sum("b")).collect()(0).getLong(0)
      === (1L to 4096L).sum)
  }
}
