package graft.logging

/** Structured log-value carrier, the engine's analogue of the reference's
  * logging shim (reference src/AthenaTrinoClient/Logging/
  * FormattedLogValues.cs:14-63): holds a positional message template and
  * its values, renders with `{0}`-style substitution falling back to the
  * raw template on a malformed format (the reference catches
  * FormatException), and enumerates as key/value pairs — `{i}` → value
  * plus the trailing `{OriginalFormat}` → template — so a structured sink
  * can index the fields instead of parsing the rendered string.
  */
final case class FormattedLogValues(format: String, values: Any*) {

  /** Value count plus the `{OriginalFormat}` entry (FormattedLogValues
    * .cs:25).
    */
  def count: Int = values.length + 1

  /** i-th structured pair; the last is `{OriginalFormat}` → template. */
  def apply(i: Int): (String, Any) =
    if (i < 0 || i >= count)
      throw new IndexOutOfBoundsException(s"index $i of $count")
    else if (i == count - 1) "{OriginalFormat}" -> format
    else s"{$i}" -> values(i)

  def pairs: Seq[(String, Any)] = (0 until count).map(apply)

  import FormattedLogValues.placeholder

  override def toString: String =
    if (values.isEmpty) format
    else
      try placeholder.replaceAllIn(format, m => {
        val i = m.group(1).toInt
        if (i >= values.length)
          throw new java.util.MissingFormatArgumentException(m.matched)
        java.util.regex.Matcher.quoteReplacement(String.valueOf(values(i)))
      })
      catch { case _: java.util.MissingFormatArgumentException => format }
}

object FormattedLogValues {
  private val placeholder = """\{(\d+)\}""".r
}

/** Minimal logging facade over slf4j (which Spark already ships): every
  * engine event logs a [[FormattedLogValues]]-rendered message, guarded
  * by the level check so disabled levels cost one boolean — the hot query
  * path never pays for string building.
  */
object Log {
  def apply(owner: Class[_]): org.slf4j.Logger =
    org.slf4j.LoggerFactory.getLogger(owner)

  def debug(l: org.slf4j.Logger, format: String, values: Any*): Unit =
    if (l.isDebugEnabled) l.debug(FormattedLogValues(format, values: _*).toString)

  def info(l: org.slf4j.Logger, format: String, values: Any*): Unit =
    if (l.isInfoEnabled) l.info(FormattedLogValues(format, values: _*).toString)

  def warn(l: org.slf4j.Logger, format: String, values: Any*): Unit =
    if (l.isWarnEnabled) l.warn(FormattedLogValues(format, values: _*).toString)

  def error(l: org.slf4j.Logger, t: Throwable, format: String, values: Any*): Unit =
    if (l.isErrorEnabled) l.error(FormattedLogValues(format, values: _*).toString, t)
}
