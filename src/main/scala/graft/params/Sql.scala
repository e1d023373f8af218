package graft.params

import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/** A SQL statement with all parameters inlined as literals. */
final case class SqlStatement(text: String) {
  override def toString: String = text
}

/** Literal formatting grammar ported from the reference's parameter
  * formatter (reference src/AthenaTrinoClient/Formatting/
  * SqlParameterFormatter.cs:14-62):
  *
  *   - null / None            → `NULL`
  *   - String                 → `'…'` with `''` escaping
  *   - Boolean                → `true` / `false` (lowercase)
  *   - numeric                → invariant-culture plain notation
  *   - timestamp-like         → `TIMESTAMP 'yyyy-MM-dd HH:mm:ss.ffffff'`
  *                              (microsecond precision, UTC) — unless the
  *                              SQL text immediately before the hole already
  *                              ends with the word `TIMESTAMP` (lookback ≤10
  *                              chars, SqlParameterFormatter.cs:47-51), in
  *                              which case only the quoted literal is emitted
  *   - UUID                   → quoted string
  *   - anything else          → `toString` (reference fallback)
  */
object SqlFormat {
  private val tsFmt: DateTimeFormatter =
    DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
      .withZone(ZoneOffset.UTC)

  def formatTimestamp(i: Instant): String = tsFmt.format(i)

  /** True when the tail of the already-rendered SQL ends with the keyword
    * TIMESTAMP — the reference's 10-char lookback hack that lets users write
    * `... FOR TIMESTAMP AS OF TIMESTAMP {ts}` without double keywords.
    * Faithful port INCLUDING the reference's quirks
    * (SqlParameterFormatter.cs:29-35: window-then-TrimEnd, so two trailing
    * spaces defeat the match, and an identifier ending in "timestamp"
    * false-positives) — behavioral parity wins over cleverness here.
    */
  def precededByTimestampKeyword(prefix: String): Boolean = {
    val tail = prefix.takeRight(10).trim.toUpperCase
    tail.endsWith("TIMESTAMP")
  }

  def literal(v: Any, precedingSql: String = ""): String = v match {
    case null       => "NULL"
    case None       => "NULL"
    case Some(x)    => literal(x, precedingSql)
    // the reference escapes only '' (Trino parses ANSI string literals);
    // Spark's default parser ALSO treats backslash as an escape inside
    // single quotes, so backslashes must be doubled here or a literal
    // backslash corrupts the value and a trailing one escapes the closing
    // quote (injection). Doubling preserves the reference's actual
    // contract — values round-trip — on Spark's dialect.
    case s: String  => "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"
    case b: Boolean => if (b) "true" else "false"
    case d: Double  => d.toString
    case f: Float   => f.toString
    case d: BigDecimal      => d.bigDecimal.toPlainString
    case d: java.math.BigDecimal => d.toPlainString
    case u: java.util.UUID  => "'" + u.toString + "'"
    case i: Instant         => tsLiteral(i, precedingSql)
    case t: java.sql.Timestamp  => tsLiteral(t.toInstant, precedingSql)
    case t: LocalDateTime   => tsLiteral(t.toInstant(ZoneOffset.UTC), precedingSql)
    // zone-carrying values normalize to UTC instants. This EXTENDS the
    // reference, whose formatter has a DateTime case only
    // (SqlParameterFormatter.cs:52-53) — a DateTimeOffset there falls
    // through to ToString(), which is not even a SQL literal. The engine
    // session is pinned to UTC, so `timestamp with time zone` columns
    // compare correctly against these literals
    case t: java.time.OffsetDateTime => tsLiteral(t.toInstant, precedingSql)
    case t: java.time.ZonedDateTime  => tsLiteral(t.toInstant, precedingSql)
    case d: LocalDate       => "DATE '" + d + "'"
    case d: java.sql.Date   => "DATE '" + d + "'"
    case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
    case other => other.toString
  }

  private def tsLiteral(i: Instant, precedingSql: String): String = {
    val quoted = "'" + formatTimestamp(i) + "'"
    if (precededByTimestampKeyword(precedingSql)) quoted
    else "TIMESTAMP " + quoted
  }
}

/** `sql"SELECT * FROM t WHERE id = $id"` — parameterized statements without
  * injection, mirroring the reference's FormattableString entry point
  * (reference src/AthenaTrinoClient/AthenaClient.cs:60).
  */
object Sql {
  implicit class SqlInterpolator(private val sc: StringContext) extends AnyVal {
    def sql(args: Any*): SqlStatement = {
      val sb = new StringBuilder
      val parts = sc.parts.iterator
      val it = args.iterator
      sb.append(parts.next())
      while (it.hasNext) {
        sb.append(SqlFormat.literal(it.next(), sb.toString))
        sb.append(parts.next())
      }
      SqlStatement(sb.toString)
    }
  }
}
