package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Extensions + error-contract specs.
  *
  * Error contract ported from the reference: invalid SQL surfaces a typed,
  * descriptive exception (reference tests/IntegrationTests/
  * TrinoClientIntegrationTests.cs:126-132 asserts TrinoAggregateException on
  * bad SQL).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions registers a working dot_product builder") {
    // getOrCreate in a shared-JVM suite would silently reuse the existing
    // session and drop extensions, so unit-check the injection here; the
    // full spark.sql.extensions path runs end-to-end in
    // graft.examples.Example (its own JVM).
    val spark = SparkSpec.spark
    graft.functions.VectorFunctions.register(spark)
    val r = spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .collect().head.getDouble(0)
    assert(r == 11.0)
    // the extensions class itself must inject without throwing
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("portable-hash kernels reachable from plain SQL (via temp registration)") {
    val spark = SparkSpec.spark
    import graft.functions._
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("hash_words60",
      es => HashWords60(es(0)), "built-in")
    reg.createOrReplaceTempFunction("shingle_hash60",
      es => ShingleHash60(es(0), es(1).eval().asInstanceOf[Number].intValue,
        es(2).eval().asInstanceOf[Number].longValue), "built-in")
    reg.createOrReplaceTempFunction("simhash_sig",
      es => SimHashSig(es(0), es(1).eval().asInstanceOf[Number].intValue), "built-in")
    val row = spark.sql(
      "SELECT hash_words60(array('a','b')) AS hw, " +
        "shingle_hash60(array('a','b','c'), 2, 97L) AS sh, " +
        "simhash_sig(hash_words60(array('a','b')), 8) AS sim").collect().head
    assert(row.getSeq[Long](0).size == 2)
    assert(row.getSeq[Long](1).forall(h => h >= 0 && h < 97))
    assert(row.getLong(2) >= 0 && row.getLong(2) < 256)
    // SQL spelling equals the md5-60 definition
    val expect = spark.sql(
      "SELECT cast(conv(substring(md5('a'), 1, 15), 16, 10) as bigint)").collect().head.getLong(0)
    assert(row.getSeq[Long](0).head == expect)
  }

  test("invalid SQL raises a descriptive analysis error (TrinoClientIntegrationTests.cs:126-132)") {
    val spark = SparkSpec.spark
    val e = intercept[Exception] {
      spark.sql("SELECT nonexistent_col FROM range(1)").collect()
    }
    assert(e.getMessage.contains("nonexistent_col"))
    val e2 = intercept[Exception] {
      spark.sql("SELEKT 1").collect()
    }
    assert(e2.isInstanceOf[org.apache.spark.sql.catalyst.parser.ParseException] ||
      e2.getMessage.toLowerCase.contains("syntax"))
  }
}
