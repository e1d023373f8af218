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
