package graft.logging

import org.scalatest.funsuite.AnyFunSuite

/** Contract spec for the logging shim, mirroring the reference's
  * FormattedLogValues semantics (FormattedLogValues.cs:14-63).
  */
class LogSpec extends AnyFunSuite {

  test("toString substitutes positional placeholders") {
    assert(FormattedLogValues("query {0} took {1} ms", "q1", 42).toString ==
      "query q1 took 42 ms")
  }

  test("no values → template returned verbatim (even with placeholders)") {
    assert(FormattedLogValues("query {0}").toString == "query {0}")
  }

  test("malformed format (index out of range) falls back to the raw template") {
    assert(FormattedLogValues("query {3} end", "a").toString == "query {3} end")
  }

  test("substituted values may themselves contain placeholder-like text") {
    assert(FormattedLogValues("got {0}", "{1}").toString == "got {1}")
  }

  test("null value renders as the string null (string.Format parity)") {
    assert(FormattedLogValues("v={0}", null).toString == "v=null")
  }

  test("pairs enumerate {i} → value then {OriginalFormat} → template") {
    val flv = FormattedLogValues("a {0} b {1}", 1, "x")
    assert(flv.count == 3)
    assert(flv.pairs == Seq("{0}" -> 1, "{1}" -> "x",
      "{OriginalFormat}" -> "a {0} b {1}"))
  }

  test("out-of-range indexed access throws (FormattedLogValues.cs:31)") {
    val flv = FormattedLogValues("f", 1)
    intercept[IndexOutOfBoundsException](flv(2))
    intercept[IndexOutOfBoundsException](flv(-1))
  }

  test("Log level guards never throw and render through the shim") {
    val l = Log(classOf[LogSpec])
    Log.debug(l, "debug {0}", 1)
    Log.info(l, "info {0}", 2)
    Log.warn(l, "warn {0}", 3)
    Log.error(l, new RuntimeException("boom"), "error {0}", 4)
  }
}
