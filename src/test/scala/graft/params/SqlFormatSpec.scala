package graft.params

import org.scalatest.funsuite.AnyFunSuite
import java.time.Instant

/** Literal grammar contract, ported from the reference's formatter behaviors
  * (reference src/AthenaTrinoClient/Formatting/SqlParameterFormatter.cs:14-62
  * and its uses in tests/IntegrationTests/AthenaClientTests.cs).
  */
class SqlFormatSpec extends AnyFunSuite {
  import Sql._

  test("null and None → NULL") {
    assert(SqlFormat.literal(null) == "NULL")
    assert(SqlFormat.literal(None) == "NULL")
    assert(sql"SELECT ${None}".text == "SELECT NULL")
  }

  test("string escaping doubles single quotes (AthenaClientTests.cs:81)") {
    assert(SqlFormat.literal("It's a test") == "'It''s a test'")
    assert(SqlFormat.literal("Quote: \"test\"") == "'Quote: \"test\"'")
    assert(sql"WHERE content = ${"It's a test"}".text ==
      "WHERE content = 'It''s a test'")
  }

  test("booleans are lowercase (SqlParameterFormatter.cs:55)") {
    assert(SqlFormat.literal(true) == "true")
    assert(SqlFormat.literal(false) == "false")
  }

  test("numerics use invariant plain notation (SqlParameterFormatter.cs:57)") {
    assert(SqlFormat.literal(3.14159) == "3.14159")
    assert(SqlFormat.literal(42) == "42")
    assert(SqlFormat.literal(9223372036854775807L) == "9223372036854775807")
    assert(SqlFormat.literal(BigDecimal("99.99")) == "99.99")
    assert(SqlFormat.literal(BigDecimal("100.10")) == "100.10")
  }

  test("timestamp → microsecond literal (SqlParameterFormatter.cs:52-53)") {
    val i = Instant.parse("2024-03-05T12:34:56.123456Z")
    assert(SqlFormat.literal(i) == "TIMESTAMP '2024-03-05 12:34:56.123456'")
  }

  test("zone-carrying values normalize to UTC (timestamptz parity)") {
    // +05:30 offset: the instant is 07:04:56.123456 UTC — the reference
    // normalizes DateTimeOffset the same way (SqlParameterFormatter.cs:52-53)
    val odt = java.time.OffsetDateTime.parse("2024-03-05T12:34:56.123456+05:30")
    assert(SqlFormat.literal(odt) == "TIMESTAMP '2024-03-05 07:04:56.123456'")
    val zdt = java.time.ZonedDateTime.parse(
      "2024-03-05T12:34:56.123456-08:00[America/Los_Angeles]")
    assert(SqlFormat.literal(zdt) == "TIMESTAMP '2024-03-05 20:34:56.123456'")
    // equal instants in different zones render identically
    assert(SqlFormat.literal(odt) ==
      SqlFormat.literal(odt.toInstant))
  }

  test("TIMESTAMP keyword lookback suppresses the prefix (SqlParameterFormatter.cs:47-51)") {
    val i = Instant.parse("2024-03-05T12:34:56.000000Z")
    val stmt = sql"SELECT * FROM t FOR TIMESTAMP AS OF TIMESTAMP $i"
    assert(stmt.text ==
      "SELECT * FROM t FOR TIMESTAMP AS OF TIMESTAMP '2024-03-05 12:34:56.000000'")
    val stmt2 = sql"SELECT * FROM t WHERE ts < $i"
    assert(stmt2.text ==
      "SELECT * FROM t WHERE ts < TIMESTAMP '2024-03-05 12:34:56.000000'")
  }

  test("UUID → quoted string (SqlParameterFormatter.cs:59)") {
    val u = java.util.UUID.fromString("123e4567-e89b-12d3-a456-426614174000")
    assert(SqlFormat.literal(u) == "'123e4567-e89b-12d3-a456-426614174000'")
  }

  test("Option[T] unwraps (nullable parameter semantics)") {
    assert(SqlFormat.literal(Some(5)) == "5")
    assert(SqlFormat.literal(Some("x")) == "'x'")
  }

  test("escaping round-trip property: any string survives quoting") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val s = rnd.alphanumeric.take(rnd.nextInt(20)).mkString + "'\"'' \\ \\' — " +
        rnd.nextString(rnd.nextInt(10))
      val lit = SqlFormat.literal(s)
      assert(lit.head == '\'' && lit.last == '\'')
      // unescape (inverse order of escaping) must restore the original
      assert(lit.substring(1, lit.length - 1)
        .replace("''", "'").replace("\\\\", "\\") == s)
    }
  }

  test("backslash escaping: trailing backslash cannot escape the closing quote") {
    // Spark's parser treats \' as an escaped quote — without doubling,
    // s = "x\\" would render 'x\' and swallow the rest of the statement
    assert(SqlFormat.literal("x\\") == "'x\\\\'")
    assert(SqlFormat.literal("a\\nb") == "'a\\\\nb'")
    assert(SqlFormat.literal("\\' OR 1=1 --") == "'\\\\'' OR 1=1 --'")
  }
}
