package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property check: the codegen'd merge-walk intersection cardinality
  * agrees with the built-in size(array_intersect(...)) on arbitrary
  * sorted-distinct long arrays (the declared input contract) — 500
  * seeded-random pairs including empty and disjoint cases, evaluated in
  * one job so the comparison also runs through whole-stage codegen.
  */
class IntersectCountSpec extends SparkSpec {
  import spark.implicits._

  test("intersect_count == size(array_intersect) on 500 random sorted distinct arrays") {
    val rnd = new scala.util.Random(42)
    def arr(): Seq[Long] =
      Seq.fill(rnd.nextInt(40))(rnd.between(-50L, 50L)).distinct.sorted
    val cases = Seq.fill(500)((arr(), arr()))
    val mismatches = cases.toDF("a", "b")
      .select(
        IntersectCount.intersectCount(col("a"), col("b")).as("i"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("exp"),
        col("a"), col("b"))
      .filter(col("i") =!= col("exp"))
      .collect()
    assert(mismatches.isEmpty, mismatches.take(3).mkString("; "))
  }

  test("intersect_count null/empty semantics") {
    val df = Seq((Seq(1L, 2L), Seq.empty[Long])).toDF("a", "b")
    assert(df.select(IntersectCount.intersectCount(col("a"), col("b")))
      .as[Long].head() == 0L)
    val withNull = df.select(
      IntersectCount.intersectCount(lit(null).cast("array<bigint>"), col("a")))
    assert(withNull.collect().head.isNullAt(0))
  }
}
